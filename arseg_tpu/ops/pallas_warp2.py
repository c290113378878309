"""Two-pass separable MV-warp Pallas kernels (round-2 warp redesign).

Companion to ops/warp_plan.py (host index rewrite). The device side is three
static-shape Pallas kernels plus a tiny XLA correction scatter — no dynamic
DMA, no data-dependent shapes:

  T1  feature relayout [Hp2, Wp2, C] -> featT [C, WL, HL]   (once per GOP)
  P1  vertical pass:   P1[c, xw, oy] = V0*featT[c, xw, J] + V1*featT[c, xw, J+1]
  T2  mid relayout     [C, WL, HL] -> [C, HL, WL]           (per frame)
  P2  horizontal pass + output relayout -> out [oy, ox, c]  (per frame)

Why this shape (probed on v5e, tools_probe_r2g/h/i/j):
  * The ONLY fast data-dependent primitive Mosaic 0.9 lowers is
    take_along_axis along the 128-lane minor dim (2-D operands, f32/int32;
    bf16 and sublane gathers crash the compiler; XLA's own gather runs at
    ~22 ns/descriptor = 15 ms/frame at 720x960x64). Both warp axes become
    lane gathers; the vertical->horizontal handoff is enabled by the host's
    scatter-composed index planes (J = yi scattered through xi).
  * Transposes: XLA HBM transposes cost 4.7-7.2 ms at frame size and
    Mosaic's elementwise swapaxes is no better (5-6.6 ms) — but a transpose
    is an identity matmul, and the MXU runs it in [128,128] tiles (~12
    GFLOP/frame, well under 1 ms). dot_general(tile, I, contract dim0xdim0)
    == tile^T, exact for bf16 operands at default precision (one nonzero
    addend per output) and exact for f32 at HIGHEST (bf16x3 splits carry
    all 24 mantissa bits through x*1.0 terms).
  * Banded tile selection: gather indices stay within +-max|flow| of the
    output lane, so each 128-lane output chunk selects over 2r+1 source
    tiles (r from the host plan's flow maxima) instead of the full axis.

Semantics: identical to ops/warp.py `warp_feature` (reference warpFeature,
/root/reference evaluation.py:61-87 — bilinear, zero padding,
align_corners=False) up to float reassociation; scatter-conflict pixels are
fixed by the plan's exact-correction list (fixed budget; the host routes
over-budget frames to the exact path). Parity: tests/test_pallas_warp2.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


LANE = 128


def _cdiv(a, b):
    return -(-a // b)


def _pad128(x):
    return _cdiv(x, LANE) * LANE


def _tprec(dtype):
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


# --------------------------------------------------------------- T1 relayout
def _t1_kernel(x_ref, i_ref, o_ref, *, wb, c):
    prec = _tprec(x_ref.dtype)
    ident = i_ref[...]
    for b in range(wb):
        # [128h, cp] -> [cp, 128h], keep the first c rows
        o_ref[:, b, :] = jax.lax.dot_general(
            x_ref[:, b, :], ident, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(o_ref.dtype)[:c]


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def ref_to_lanes_h(featpad, hl: int, wl: int, interpret: bool = False):
    """[Hp2, Wp2, C] (zero-padded +1 borders) -> featT [C, WL, HL] f32.

    Runs once per GOP (the keyframe feature is shared by all its frames).
    bf16 input is upcast exactly; the gather passes are f32-only (bf16
    lane-gathers crash this Mosaic version)."""
    hp2, wp2, c = featpad.shape
    cp = _pad128(c)
    x = jnp.pad(
        featpad.astype(jnp.float32),
        ((0, hl - hp2), (0, wl - wp2), (0, cp - c)),
    )
    wb = 32
    ident = jnp.eye(LANE, dtype=x.dtype)
    return pl.pallas_call(
        functools.partial(_t1_kernel, wb=wb, c=c),
        out_shape=jax.ShapeDtypeStruct((c, wl, hl), jnp.float32),
        grid=(hl // LANE, wl // wb),
        in_specs=[
            pl.BlockSpec((LANE, wb, cp), lambda hi, wi: (hi, wi, 0)),
            pl.BlockSpec((LANE, LANE), lambda hi, wi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c, wb, LANE), lambda hi, wi: (0, wi, hi)),
        interpret=interpret,
    )(x, ident)


# ------------------------------------------------------------ banded gather
def _tile_cat(x2d, reps):
    """[R, L] -> [reps*R, L] by concatenation (broadcast_to+reshape crashes
    Mosaic 0.9; a single concat lowers fine)."""
    if reps == 1:
        return x2d
    return jnp.concatenate([x2d] * reps, axis=0)


def _lane_select_banded(x2, idx2, r, nt_src):
    """x2 [R, Ls], idx2 [R, Lo] int32: out[row, l] = x2[row, idx2[row, l]]
    with idx guaranteed within +-(128*r - 1) of l (host plan bound).
    Out-of-range/clipped positions produce 0 (their weights are 0)."""
    lo = idx2.shape[-1]
    outs = []
    for t in range(lo // LANE):
        idx_c = jax.lax.slice_in_dim(idx2, t * LANE, (t + 1) * LANE, axis=-1)
        acc = None
        for k in range(max(0, t - r), min(nt_src, t + r + 1)):
            tile = jax.lax.slice_in_dim(x2, k * LANE, (k + 1) * LANE, axis=-1)
            loc = idx_c - k * LANE
            inb = (loc >= 0) & (loc < LANE)
            g = jnp.take_along_axis(tile, jnp.clip(loc, 0, LANE - 1), axis=-1)
            z = jnp.zeros_like(g)
            acc = jnp.where(inb, g, z if acc is None else acc)
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


# ------------------------------------------------------------------- pass 1
def _p1_kernel(x_ref, j_ref, v0_ref, v1_ref, o_ref, *, cb, wb, hl, r):
    nt = hl // LANE
    j = _tile_cat(j_ref[0], cb)          # [cb*wb, hl]
    v0 = _tile_cat(v0_ref[0], cb)
    v1 = _tile_cat(v1_ref[0], cb)
    x = x_ref[...].reshape(cb * wb, hl)
    g0 = _lane_select_banded(x, j, r, nt)
    g1 = _lane_select_banded(x, j + 1, r, nt)
    o_ref[0] = (v0 * g0 + v1 * g1).reshape(cb, wb, hl)


@functools.partial(jax.jit, static_argnums=(4, 5))
def warp_pass1(featT, j, v0, v1, r: int, interpret: bool = False):
    """featT [C, WL, HL] f32; j [N, WL, HL] int32; v0/v1 [N, WL, HL] f32.
    Returns P1 [N, C, WL, HL] f32. r = banded reach in lane tiles."""
    c, wl, hl = featT.shape
    n = j.shape[0]
    cb, wb = 8, 64
    return pl.pallas_call(
        functools.partial(_p1_kernel, cb=cb, wb=wb, hl=hl, r=r),
        out_shape=jax.ShapeDtypeStruct((n, c, wl, hl), jnp.float32),
        grid=(n, c // cb, wl // wb),
        in_specs=[
            pl.BlockSpec((cb, wb, hl), lambda ni, ci, wi: (ci, wi, 0)),
            pl.BlockSpec((1, wb, hl), lambda ni, ci, wi: (ni, wi, 0)),
            pl.BlockSpec((1, wb, hl), lambda ni, ci, wi: (ni, wi, 0)),
            pl.BlockSpec((1, wb, hl), lambda ni, ci, wi: (ni, wi, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, cb, wb, hl), lambda ni, ci, wi: (ni, ci, wi, 0)
        ),
        interpret=interpret,
    )(featT, j, v0, v1)


# -------------------------------------------------------------- T2 relayout
def _t2_kernel(x_ref, i_ref, o_ref, *, cb, nwt, nht):
    prec = _tprec(x_ref.dtype)
    ident = i_ref[...]
    for ci in range(cb):
        for wt in range(nwt):
            for ht in range(nht):
                tile = x_ref[0, ci, wt * LANE : (wt + 1) * LANE,
                             ht * LANE : (ht + 1) * LANE]
                o_ref[0, ci, ht * LANE : (ht + 1) * LANE,
                      wt * LANE : (wt + 1) * LANE] = jax.lax.dot_general(
                    tile, ident, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def transpose_mid(p1, interpret: bool = False):
    """[N, C, WL, HL] -> [N, C, HL, WL] via [128,128] MXU tile transposes."""
    n, c, wl, hl = p1.shape
    cb = 4
    nwt, nht = wl // LANE, hl // LANE
    ident = jnp.eye(LANE, dtype=p1.dtype)
    return pl.pallas_call(
        functools.partial(_t2_kernel, cb=cb, nwt=nwt, nht=nht),
        out_shape=jax.ShapeDtypeStruct((n, c, hl, wl), p1.dtype),
        grid=(n, c // cb),
        in_specs=[
            pl.BlockSpec((1, cb, wl, hl), lambda ni, ci: (ni, ci, 0, 0)),
            pl.BlockSpec((LANE, LANE), lambda ni, ci: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, cb, hl, wl), lambda ni, ci: (ni, ci, 0, 0)),
        interpret=interpret,
    )(p1, ident)


# ------------------------------------------------------------------- pass 2
def _p2_kernel(x_ref, xi_ref, wx0_ref, wx1_ref, i_ref, o_ref, *, c, hb, wl, r):
    nt = wl // LANE
    xi = _tile_cat(xi_ref[0], c)          # [c*hb, wl]
    wx0 = _tile_cat(wx0_ref[0], c)
    wx1 = _tile_cat(wx1_ref[0], c)
    x = x_ref[...].reshape(c * hb, wl)
    g0 = _lane_select_banded(x, xi, r, nt)
    g1 = _lane_select_banded(x, xi + 1, r, nt)
    res = (wx0 * g0 + wx1 * g1).reshape(c, hb, wl)
    ident = i_ref[...]
    prec = _tprec(jnp.float32)
    for h in range(hb):
        # [c, wl] -> [wl, c] on the MXU (one dot per output row)
        o_ref[0, h] = jax.lax.dot_general(
            res[:, h, :], ident, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(4, 5))
def warp_pass2(p1t, xi, wx0, wx1, r: int, interpret: bool = False):
    """p1t [N, C, HL, WL] f32; xi [N, HL, WL] int32; wx0/wx1 [N, HL, WL] f32.
    Returns out [N, HL, WL, C] f32 (NHWC, padded)."""
    n, c, hl, wl = p1t.shape
    hb = 8
    ident = jnp.eye(c, dtype=jnp.float32)
    return pl.pallas_call(
        functools.partial(_p2_kernel, c=c, hb=hb, wl=wl, r=r),
        out_shape=jax.ShapeDtypeStruct((n, hl, wl, c), jnp.float32),
        grid=(n, hl // hb),
        in_specs=[
            pl.BlockSpec((1, c, hb, wl), lambda ni, hi: (ni, 0, hi, 0)),
            pl.BlockSpec((1, hb, wl), lambda ni, hi: (ni, hi, 0)),
            pl.BlockSpec((1, hb, wl), lambda ni, hi: (ni, hi, 0)),
            pl.BlockSpec((1, hb, wl), lambda ni, hi: (ni, hi, 0)),
            pl.BlockSpec((c, c), lambda ni, hi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, wl, c), lambda ni, hi: (ni, hi, 0, 0)),
        interpret=interpret,
    )(p1t, xi, wx0, wx1, ident)


# ------------------------------------------------------------- corrections
@jax.jit
def _apply_corrections(out, featpad, corr_pos, corr_yx, corr_w, corr_n):
    """Exact fixed-budget correction of scatter-conflict pixels.

    out [N, H, W, C]; featpad [Hp2, Wp2, C] (shared source);
    corr_pos [N, K] flat positions; corr_yx [N, K, 2]; corr_w [N, K, 4];
    corr_n [N] int32."""
    n, h, w, c = out.shape
    k = corr_pos.shape[1]
    fp32 = featpad.astype(jnp.float32)

    def one(out1, pos, yx, wts, m):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        blk = jax.lax.gather(
            fp32, yx, dn, slice_sizes=(2, 2, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # [K, 2, 2, C]
        vals = (
            blk[:, 0, 0] * wts[:, 0:1]
            + blk[:, 0, 1] * wts[:, 1:2]
            + blk[:, 1, 0] * wts[:, 2:3]
            + blk[:, 1, 1] * wts[:, 3:4]
        ).astype(out1.dtype)
        # padding rows scatter out of bounds and are dropped (a sel-mask
        # set() would still collide with a genuine correction at pos 0)
        sel = jnp.arange(k) < m
        pos_eff = jnp.where(sel, pos, h * w)
        flat = out1.reshape(-1, c)
        flat = flat.at[pos_eff].set(vals, mode="drop")
        return flat.reshape(h, w, c)

    return jax.vmap(one)(out, corr_pos, corr_yx, corr_w, corr_n)


# ---------------------------------------------------------------- wrapper
def plan_to_device(plan):
    """WarpPlan (host numpy) -> (dict of jnp arrays, static metadata)."""
    import numpy as np

    if plan.exact:
        raise ValueError(
            "WarpPlan overflowed its correction budget "
            f"(max corrections {int(plan.corr_n.max())} > budget "
            f"{plan.budget}); the plan carries no kernel layout. Callers "
            "must check plan.exact and fall back to ops.warp.warp_feature "
            "(exact gather) for this flow field."
        )
    h, w = plan.h, plan.w
    hl = _pad128(h + 2)
    wl = _pad128(w + 2)

    def padto(x, s1, s2):
        return jnp.asarray(
            np.pad(x, ((0, 0), (0, s1 - x.shape[1]), (0, s2 - x.shape[2])))
        )

    # banded reach in lane tiles: displacement of the gather index from its
    # output lane position, plus one tile of slack for the +1 corner.
    # Measure over the VALID plane region only — the zero-padded tails would
    # otherwise inflate the reach to the full axis.
    jv = plan.j[:, : w + 2, :h].astype(np.int64)
    d1 = int(np.abs(jv - np.arange(h)[None, None, :]).max())
    xv = plan.xi[:, :h, :w].astype(np.int64)
    d2 = int(np.abs(xv - np.arange(w)[None, None, :]).max())
    r1 = min(_cdiv(d1 + 2, LANE), hl // LANE)
    r2 = min(_cdiv(d2 + 2, LANE), wl // LANE)
    dev = {
        "j": padto(plan.j, wl, hl),
        "v0": padto(plan.v0, wl, hl),
        "v1": padto(plan.v1, wl, hl),
        "xi": padto(plan.xi, hl, wl),
        "wx0": padto(plan.wx0, hl, wl),
        "wx1": padto(plan.wx1, hl, wl),
        "corr_pos": jnp.asarray(plan.corr_pos),
        "corr_yx": jnp.asarray(plan.corr_yx),
        "corr_w": jnp.asarray(plan.corr_w),
        "corr_n": jnp.asarray(plan.corr_n.astype(np.int32)),
    }
    return dev, {"r1": int(r1), "r2": int(r2), "h": h, "w": w}


def warp_feature_planned(feature, dev_plan, meta, out_dtype=None,
                         interpret=False):
    """Warp `feature` [1, H, W, C] (the shared keyframe feature) by a
    host-built WarpPlan (arrays from `plan_to_device`). Returns
    [N, H, W, C] for the plan's N frames."""
    featpad = jnp.pad(feature[0], ((1, 1), (1, 1), (0, 0)))
    h, w = meta["h"], meta["w"]
    hl = _pad128(h + 2)
    wl = _pad128(w + 2)
    featT = ref_to_lanes_h(featpad, hl, wl, interpret)
    return warp_planned_from_t(featT, featpad, dev_plan, meta,
                               out_dtype or feature.dtype, interpret)


def warp_planned_from_t(featT, featpad, dev_plan, meta, out_dtype,
                        interpret=False):
    """Core planned warp given the pre-relayouted featT (amortize T1 across
    the GOP's frames)."""
    h, w = meta["h"], meta["w"]
    p1 = warp_pass1(featT, dev_plan["j"], dev_plan["v0"], dev_plan["v1"],
                    meta["r1"], interpret)
    p1t = transpose_mid(p1, interpret)
    out = warp_pass2(p1t, dev_plan["xi"], dev_plan["wx0"], dev_plan["wx1"],
                     meta["r2"], interpret)
    # output lanes are oy in [1, h+1) padded coords? no: pass-2 output rows
    # are oy in [0, h) directly (plan planes are output-indexed); crop pads
    out = out[:, :h, :w, :]
    out = _apply_corrections(
        out, featpad, dev_plan["corr_pos"], dev_plan["corr_yx"],
        dev_plan["corr_w"], dev_plan["corr_n"],
    )
    return out.astype(out_dtype)
