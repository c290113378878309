"""Blocked MV-warp Pallas TPU kernel (round-2, VERDICT item #1).

Replaces the exact per-pixel gather warp (`ops/warp.py`, ~14 ms true device
time at 720x960x64 bf16 — the XLA gather engine streams at ~38 GB/s on this
chip) with a TPU-native formulation measured against the chip's real
bandwidth hierarchy (tools_probe_r2*.py):

  1. Per 4x8 output block, ONE manual DMA fetches an [8, 16, C] source
     window at a data-dependent (8-aligned in x) base — motion fields from
     video codecs are block-piecewise-constant, so all 32 pixels' bilinear
     corners live in that window (coherence: y-span <= 6, x-span <= 7 within
     the block).
  2. The bilinear select becomes an MXU matmul: the window flattens to a
     128-long contraction axis; each pixel's 4-corner weights become a
     2x2-sparse row of a [32, 128] mask (built as an outer product of per-
     axis one-hot weight vectors rw [32,8] x cw [32,16] — exact because the
     mask is keyed on the output pixel and the window axis is block-local).
     Groups of 4 blocks form one [128, 512] block-diagonal x [512, C] dot —
     small-dot granularity is the measured MXU wall (2.9 TF/s), so blocks
     are fused to one-pass row counts.
  3. Pixels whose block is NOT coherent (window overflow at motion-partition
     boundaries) get clamped (wrong) values in the fast pass and are fixed
     by a fixed-budget sparse exact correction (jnp.nonzero(size=K) ->
     [2,2,C] gather -> scatter). If the overflow population exceeds the
     budget, a whole-frame lax.cond falls back to the exact gather
     (dispatch overhead measured ~0).

Semantics: identical to ops/warp.py `warp_feature` / grid_sample
(align_corners=False, zero padding) — the reference's `warpFeature`
(/root/reference evaluation.py:61-87). Parity: tests/test_pallas_warp.py
(interpret mode on CPU + real-TPU marker).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arseg_tpu.ops.warp import _grid_sample_planes

BR, BC = 4, 8       # output block
WR, WC = 8, 16      # source window per block (x base 8-aligned)
TH = 8              # tile rows (2 block-rows)
N_SEM = 8           # DMA wave depth


def _cdiv(a, b):
    return -(-a // b)


def _kernel(by_ref, bx_ref, src_ref, rw_ref, cw_ref, out_ref, wbuf, sems, *,
            nb, nt, c, wp):
    """Grid (n, nt). Per tile: nb window DMAs -> grouped block-diag matmul
    select -> pixel-major tile write."""
    a = pl.program_id(0)
    t = pl.program_id(1)
    base = (a * nt + t) * nb

    def dma(b):
        # every window has its own destination; semaphores cycle in waves of
        # N_SEM to bound in-flight DMAs. Individual waits may be satisfied by
        # a different copy's bytes (shared sem, equal sizes) — sound because
        # the select only runs after ALL nb waits, and the total byte count
        # then guarantees every copy landed.
        return pltpu.make_async_copy(
            src_ref.at[a, pl.ds(by_ref[base + b], WR), pl.ds(bx_ref[base + b], WC), :],
            wbuf.at[b],
            sems.at[lax.rem(b, N_SEM)],
        )

    def body(b, _):
        @pl.when(b >= N_SEM)
        def _w():
            dma(b - N_SEM).wait()

        dma(b).start()
        return 0

    lax.fori_loop(0, nb, body, 0)

    def tail(s, _):
        dma(nb - N_SEM + s).wait()
        return 0

    lax.fori_loop(0, N_SEM, tail, 0)

    f32 = jnp.float32
    ng = nb // 4
    r = rw_ref[0, 0]  # [nb, 32, WR]
    cwt = cw_ref[0, 0]  # [nb, 32, WC]
    m = (r[:, :, :, None] * cwt[:, :, None, :]).reshape(nb, 32, WR * WC)
    m_rs = m.reshape(ng, 4 * 32, WR * WC)
    m_t = jnp.concatenate([m_rs] * 4, axis=-1)  # [ng, 128, 512]
    pp = lax.broadcasted_iota(jnp.int32, (4 * 32, 4 * WR * WC), 0)
    uu = lax.broadcasted_iota(jnp.int32, (4 * 32, 4 * WR * WC), 1)
    bd = (pp // 32) == (uu // (WR * WC))
    m_big = jnp.where(bd[None], m_t, jnp.zeros_like(m_t))

    w_all = jnp.reshape(wbuf[...], (ng, 4 * WR * WC, c))
    prec = lax.Precision.HIGHEST if w_all.dtype == f32 else None
    o = lax.dot_general(
        m_big, w_all, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32, precision=prec,
    )  # [ng, 128, c]
    # g = brow * (ng//2) + gcol; p = blk*32 + py*8 + px
    o = o.reshape(2, ng // 2, 4, BR, BC, c)
    o = jnp.transpose(o, (0, 3, 1, 2, 4, 5))
    out_ref[0, 0] = o.reshape(TH, wp, c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(5,))
def _blocked_pass(fp, by, bx, rw, cw, interpret=False):
    """fp: [n, Hs, Ws, c] zero-padded source; by/bx: flat int32 window bases
    (padded coords); rw/cw: [n, nt, nb, 32, WR|WC] in fp.dtype.
    Returns [n, nt*TH, wp, c]."""
    n, hs, ws, c = fp.shape
    nt, nb = rw.shape[1], rw.shape[2]
    wp = (nb // 2) * BC

    out = pl.pallas_call(
        functools.partial(_kernel, nb=nb, nt=nt, c=c, wp=wp),
        out_shape=jax.ShapeDtypeStruct((n, nt, TH, wp, c), fp.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, nt),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (1, 1, nb, 32, WR), lambda a, t, by, bx: (a, t, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, nb, 32, WC), lambda a, t, by, bx: (a, t, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, TH, wp, c), lambda a, t, by, bx: (a, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((nb, WR, WC, c), fp.dtype),
                pltpu.SemaphoreType.DMA((N_SEM,)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(by, bx, fp, rw, cw)
    return out.reshape(n, nt * TH, wp, c)


def _prep(feature, fx, fy, align_corners):
    """Shared sampling math (identical to ops/warp.py `_grid_sample_planes`)
    + block bases/offsets/axis-weight one-hots. All XLA elementwise."""
    n, h, w, c = feature.shape
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    gx = 2.0 * (xx + fx.astype(jnp.float32)) / max(w - 1, 1) - 1.0
    gy = 2.0 * (yy + fy.astype(jnp.float32)) / max(h - 1, 1) - 1.0
    if align_corners:
        ix = (gx + 1.0) * (w - 1) / 2.0
        iy = (gy + 1.0) * (h - 1) / 2.0
    else:
        ix = ((gx + 1.0) * w - 1.0) / 2.0
        iy = ((gy + 1.0) * h - 1.0) / 2.0

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0
    # indices into the 1-px zero-padded source, clipped like the exact path
    xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
    yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)

    def axis_w(w0, frac, lim, d):
        valid = (w0 + d >= 0) & (w0 + d <= lim)
        return (frac if d else 1 - frac) * valid

    wx0, wx1 = axis_w(x0, wx, w - 1, 0), axis_w(x0, wx, w - 1, 1)
    wy0, wy1 = axis_w(y0, wy, h - 1, 0), axis_w(y0, wy, h - 1, 1)
    return xi, yi, wx0, wx1, wy0, wy1


def warp_feature_blocked(feature, flow, align_corners=False, interpret=False,
                         correction_budget=8192):
    """Drop-in for ops/warp.py `warp_feature` (flow as (fx, fy) planes or
    packed [..., 2]) using the blocked Pallas kernel with sparse correction
    and whole-frame exact fallback. Requires H % TH == 0, W % BC == 0 (pads
    otherwise) — the AR shapes (720x960, 1024x2048) divide evenly."""
    n, h, w, c = feature.shape
    if isinstance(flow, tuple):
        fx, fy = flow
    else:
        fx, fy = flow[..., 0], flow[..., 1]

    hp = _cdiv(h, TH) * TH
    wp = _cdiv(w, BC) * BC
    if (hp, wp) != (h, w):
        fx = jnp.pad(fx, ((0, 0), (0, hp - h), (0, wp - w)))
        fy = jnp.pad(fy, ((0, 0), (0, hp - h), (0, wp - w)))

    xi, yi, wx0, wx1, wy0, wy1 = _prep(feature, fx, fy, align_corners)

    # block bases (min over each BRxBC block; x 8-aligned), offsets, coherence
    nt = hp // TH
    nbr, nbc = hp // BR, wp // BC
    nb = (TH // BR) * nbc

    def blocks(p):
        return p.reshape(n, nbr, BR, nbc, BC)

    yi_b, xi_b = blocks(yi), blocks(xi)
    by = jnp.min(yi_b, axis=(2, 4))  # [n, nbr, nbc]
    bx = (jnp.min(xi_b, axis=(2, 4)) // 8) * 8
    off_y = yi_b - by[:, :, None, :, None]
    off_x = xi_b - bx[:, :, None, :, None]
    # +1 below because each pixel also reads corner (off+1)
    bad = (off_y > WR - 2) | (off_x > WC - 2)  # [n, nbr, BR, nbc, BC]
    n_bad = jnp.sum(bad)
    offc_y = jnp.clip(off_y, 0, WR - 2).reshape(n, hp, wp)
    offc_x = jnp.clip(off_x, 0, WC - 2).reshape(n, hp, wp)

    dt = feature.dtype

    def axis_onehot(off, w0, w1, width):
        # [n, hp, wp, width]: w0 at off, w1 at off+1
        rr = jnp.arange(width, dtype=jnp.int32)
        o = off[..., None]
        return ((o == rr) * w0[..., None] + (o + 1 == rr) * w1[..., None]).astype(dt)

    rw = axis_onehot(offc_y, wy0, wy1, WR)
    cw = axis_onehot(offc_x, wx0, wx1, WC)

    def to_block_major(p, width):
        # [n, hp, wp, width] -> [n, nt, nb, 32, width]
        p = p.reshape(n, nt, TH // BR, BR, nbc, BC, width)
        p = jnp.transpose(p, (0, 1, 2, 4, 3, 5, 6))
        return p.reshape(n, nt, nb, BR * BC, width)

    rw = to_block_major(rw, WR)
    cw = to_block_major(cw, WC)

    # zero-padded source with window margins (windows never clip)
    fp = jnp.pad(feature, ((0, 0), (1, WR), (1, WC + 7), (0, 0))).astype(dt)
    # flat bases (padded coords), block order b = brow*nbc + bcol matching
    # the rw/cw block-major layout
    by_flat = by.reshape(n * nt * nb)
    bx_flat = bx.reshape(n * nt * nb)

    def fast():
        out = _blocked_pass(fp, by_flat, bx_flat, rw, cw, interpret)
        out = out[:, :h, :w, :]
        # sparse exact correction of window-overflow pixels
        badf = bad.reshape(n, hp, wp)[:, :h, :w].reshape(n, -1)
        fp1 = jnp.pad(feature, ((0, 0), (1, 1), (1, 1), (0, 0)))

        def correct_one(out1, bad1, fp1, yi1, xi1, w001, w011, w101, w111):
            idx = jnp.nonzero(bad1, size=correction_budget, fill_value=0)[0]
            yk = idx // w
            xk = idx - yk * w
            pts = jnp.stack([yi1[yk, xk], xi1[yk, xk]], axis=-1)
            dn = lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1),
            )
            blk = lax.gather(fp1, pts, dn, slice_sizes=(2, 2, c),
                             mode=lax.GatherScatterMode.CLIP)
            vals = (
                blk[:, 0, 0] * w001[yk, xk, None]
                + blk[:, 0, 1] * w011[yk, xk, None]
                + blk[:, 1, 0] * w101[yk, xk, None]
                + blk[:, 1, 1] * w111[yk, xk, None]
            ).astype(out1.dtype)
            sel = bad1[idx][:, None]
            flat = out1.reshape(-1, c)
            flat = flat.at[idx].set(jnp.where(sel, vals, flat[idx]))
            return flat.reshape(h, w, c)

        w00, w01 = (wy0 * wx0)[:, :h, :w], (wy0 * wx1)[:, :h, :w]
        w10, w11 = (wy1 * wx0)[:, :h, :w], (wy1 * wx1)[:, :h, :w]
        return jax.vmap(correct_one)(
            out, badf, fp1, yi[:, :h, :w], xi[:, :h, :w], w00, w01, w10, w11
        )

    def exact():
        return _grid_sample_planes(
            feature,
            2.0 * (jnp.arange(w, dtype=jnp.float32)[None, None, :] + fx[:, :h, :w].astype(jnp.float32)) / max(w - 1, 1) - 1.0,
            2.0 * (jnp.arange(h, dtype=jnp.float32)[None, :, None] + fy[:, :h, :w].astype(jnp.float32)) / max(h - 1, 1) - 1.0,
            align_corners,
            "exact",
        )

    return lax.cond(n_bad <= correction_budget, fast, exact)
