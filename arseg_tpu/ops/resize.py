"""Exact-parity spatial resampling ops, NHWC layout.

Every branch of the AR-Seg pipeline funnels through `F.interpolate` /
`F.upsample` / adaptive pooling in the reference, in a mix of
``align_corners`` modes (see /root/reference `evaluation.py:117,179`,
`model/pspnet.py:29,45,96`, `model/bisenet.py:216,284,298`), so bit-level
parity of these ops decides mIoU parity of the whole framework.

TPU-first design: separable 1-D linear resampling is expressed as two small
dense matmuls with constant interpolation matrices (rows have at most two
non-zeros).  XLA folds the constants and the matmuls run on the MXU, which is
far faster than gather-based resampling on TPU and is bit-exact with the
PyTorch CPU/GPU kernels (same arithmetic: out = (1-w)*x0 + w*x1 per axis).
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _linear_gather(in_size: int, out_size: int, align_corners: bool):
    """(i0, i1, w) per output index for 1-D linear resampling, bit-matching
    torch.nn.functional.interpolate(mode='bilinear') — torch computes source
    coordinates in float32 (opmath_t float on CPU and CUDA)."""
    i = np.arange(out_size, dtype=np.float32)
    if align_corners:
        if out_size == 1:
            src = np.zeros_like(i)
        else:
            scale = np.float32(in_size - 1) / np.float32(out_size - 1)
            src = i * scale
    else:
        scale = np.float32(in_size) / np.float32(out_size)
        src = np.maximum((i + np.float32(0.5)) * scale - np.float32(0.5), np.float32(0))
    x0 = np.floor(src).astype(np.int64)
    w = (src - x0).astype(np.float32)
    x0 = np.minimum(x0, in_size - 1)
    x1 = np.minimum(x0 + 1, in_size - 1)
    return x0, x1, w


@lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool):
    """[out_size, in_size] row-stochastic interpolation matrix (used for the
    tiny pyramid-pool resizes where a matmul beats gathers)."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    x0, x1, w = _linear_gather(in_size, out_size, align_corners)
    np.add.at(m, (np.arange(out_size), x0), 1.0 - w)
    np.add.at(m, (np.arange(out_size), x1), w)
    return m


@lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int):
    """Index vector matching torch mode='nearest' along one axis."""
    scale = np.float32(in_size) / np.float32(out_size)
    idx = np.floor(np.arange(out_size, dtype=np.float32) * scale).astype(np.int64)
    return np.minimum(idx, in_size - 1)


@lru_cache(maxsize=None)
def _adaptive_avg_matrix(in_size: int, out_size: int):
    """[out_size, in_size] averaging matrix matching AdaptiveAvgPool along
    one axis (start=floor(j*in/out), end=ceil((j+1)*in/out))."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for j in range(out_size):
        start = (j * in_size) // out_size
        end = -((-(j + 1) * in_size) // out_size)  # ceil
        m[j, start:end] = 1.0 / (end - start)
    return m


def _apply_hw_matrices(x, mh, mw):
    """x: [..., H, W, C] -> [..., H', W', C] via per-axis matmuls."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # precision='highest' keeps the interpolation matmuls in true fp32 on TPU
    # (the MXU would otherwise use bf16 inputs and break bit-parity).
    y = jnp.einsum("ph,...hwc->...pwc", jnp.asarray(mh), xf, precision="highest")
    y = jnp.einsum("qw,...pwc->...pqc", jnp.asarray(mw), y, precision="highest")
    return y.astype(dtype)


# Gather strategy for the lerp H-pass: merge every dim LEFT of the resampled
# axis into it and gather rows of the merged-major axis. An inner-axis gather
# of [N, H, ...] makes XLA relayout the whole operand to put H major
# (measured ~2 ms/GOP of pure copy/transpose traffic in the production
# camvid-bise18 program, tools_probe_r3r); rows of a [N*H, ...] view are
# already major, so the same take() is a natural-layout row gather. The
# merged index table is host-side numpy (constant-folded). Bit-exact: the
# elements and the lerp arithmetic are unchanged. Flag so probes can A/B.
# (Measured effect, tools_probe_r3r: kills the f32 flow-plane relayouts;
# the bf16 frame gather still relayouts, so frame DOWNsamples take the
# H_DOWNSAMPLE_MATMUL path below instead.)
# Default OFF since round 4: with the minor-axis restriction in place and
# H_DOWNSAMPLE_MATMUL covering the frame downsamples, the r3s rerun on the
# production GOP program measured matmul-only at 15.50/15.54 ms/GOP vs
# 15.86/15.72 with both flags ON, twice in one session
# (bench_logs/r4queue_r3s_rerun.log + r4queue_queue.log) — the remaining
# merged-row gathers now cost ~0.35 ms/GOP more than the plain take path.
MERGED_ROW_GATHER = False

# H-pass strategy for >=2x downsampling in resize_bilinear — see the comment
# at its use site. Module flags so probes can A/B either strategy.
H_DOWNSAMPLE_MATMUL = True

# resize_bilinear_s2d: emit the four (dy, dx) parity blocks from ONE
# stacked-matrix H-pass + ONE W-pass einsum (channel packing becomes a free
# minor-dims reshape) instead of four einsums + a concatenate. Bit-identical
# element math; flag so probes can A/B the layout behavior.
S2D_ONE_EINSUM = False


def _take_rows(x, idx_np, axis):
    """jnp.take along `axis` with the leading dims merged into the indexed
    axis (see MERGED_ROW_GATHER above). idx_np: 1-D numpy index array.

    The merge applies only to non-minor axes: a minor-axis (lane) gather is
    already natural-layout, and merging there would flatten the operand to
    1-D and constant-fold an N*H*out-entry index table (~MBs of HLO
    constants at flow-plane scale) for no relayout win."""
    axis = axis % x.ndim if x.ndim else 0
    if not MERGED_ROW_GATHER or axis == 0 or axis == x.ndim - 1:
        return jnp.take(x, jnp.asarray(idx_np), axis=axis)
    lead = x.shape[:axis]
    n_lead = int(np.prod(lead))
    h = x.shape[axis]
    xm = x.reshape((n_lead * h,) + x.shape[axis + 1:])
    merged = (np.arange(n_lead, dtype=idx_np.dtype)[:, None] * h
              + idx_np[None, :]).reshape(-1)
    y = jnp.take(xm, jnp.asarray(merged), axis=0)
    return y.reshape(lead + (len(idx_np),) + x.shape[axis + 1:])


def _lerp_axis(x, in_size, out_size, align_corners, axis):
    """1-D linear resample along `axis` via two gathers + lerp.

    Separable resampling as gathers is ~1000x fewer FLOPs than the dense
    interpolation-matrix matmul at feature resolutions (a x2 upsample of a
    [360,480,64] map costs ~58 GFLOPs as matmuls — more than the whole
    ResNet-18 backbone — vs ~0.1 GFLOP here)."""
    i0, i1, w = _linear_gather(in_size, out_size, align_corners)
    x0 = _take_rows(x, i0, axis)
    x1 = _take_rows(x, i1, axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    wb = jnp.asarray(w).reshape(shape).astype(x.dtype)
    # torch evaluates (1-w)*x0 + w*x1 — keep the same form for bit parity
    return x0 * (1 - wb) + x1 * wb


def resize_bilinear(x, out_hw, align_corners: bool):
    """Bilinear resize of NHWC (or [H,W,C] / any leading-batch) tensor,
    matching torch F.interpolate(mode='bilinear', align_corners=...).

    Mixed per-axis strategy (measured at [360,480,64]->[720,960] bf16 on
    v5e): H axis by gather+lerp (a sublane-dim gather is a cheap sliced
    copy), W axis by a constant interpolation-matrix matmul on the MXU
    (1.46 ms vs 2.59 ms for gather+lerp on both axes — a W-axis gather
    shuffles the second-minor dim; a full matmul-matmul variant loses the
    H-axis relayout, 5.3 ms). Bit-exact either way: each output element is
    still exactly (1-w)*x0 + w*x1 (zeros elsewhere in the matrix row
    contribute exact 0.0; f32 keeps precision=HIGHEST on the MXU)."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x
    if h == oh:
        y = x
    elif x.shape[-1] <= 4:
        # small-C fast path (C=3 frames): merge (W, C) into one minor dim so
        # the H-pass runs on full 128-lane rows instead of a C-wide
        # (lane-padded) minor dim. Pure reshape — element math is unchanged.
        c = x.shape[-1]
        xm = x.reshape(x.shape[:-2] + (w * c,))
        if H_DOWNSAMPLE_MATMUL and oh * 2 <= h:
            # >=2x H DOWNsample (frame 0.5x resizes): constant-matrix
            # matmul over the merged form. The H-axis gather makes XLA
            # relayout the whole operand around the indexed axis
            # (~1.5 ms/GOP of copy/transpose traffic on the [11,720,960,3]
            # frame downsize, tools_probe_r3r) — a contraction runs in
            # place. Same per-output arithmetic as resize_bilinear_padded
            # (one accumulator rounding instead of per-term lerp rounding —
            # may differ from the gather form by 1 ulp in bf16;
            # argmax-stable, consumer parity tests compare at tolerance).
            mh = jnp.asarray(_linear_matrix(h, oh, align_corners))
            if x.dtype == jnp.float32:
                ym = jnp.einsum("ph,...hx->...px", mh, xm, precision="highest")
            else:
                ym = jnp.einsum("ph,...hx->...px", mh.astype(x.dtype), xm)
        else:
            ym = _lerp_axis(xm, h, oh, align_corners, xm.ndim - 2)
        y = ym.reshape(ym.shape[:-1] + (w, c))
    else:
        y = _lerp_axis(x, h, oh, align_corners, x.ndim - 3)
    if w == ow:
        return y
    mw = jnp.asarray(_linear_matrix(w, ow, align_corners))
    if x.dtype == jnp.float32:
        return jnp.einsum("qw,...hwc->...hqc", mw, y, precision="highest")
    return jnp.einsum("qw,...hwc->...hqc", mw.astype(x.dtype), y)


def resize_bilinear_s2d(x, out_hw, align_corners: bool, out_dtype=None):
    """Fused bilinear resize + 2x2 pixel-unshuffle of [..., H, W, C] (C<=4):
    emits [..., oh/2, ow/2, 4C] with channel order dy*2C + dx*C + cc — the
    exact layout `nn.functional._conv_s2d_stem` builds for the 7x7/s2 stem
    convs, computed WITHOUT materializing the resized tensor.

    The resized image in the AR pipeline's LR branch is consumed ONLY by the
    space-to-depth stem convs, so the unshuffle can ride the resize for free:
    the H-pass interpolation matmul runs once per output-row parity (the two
    matrices partition the rows of the full H matrix) and the W-pass once per
    (dy, dx) parity. Per output element the contraction row is identical to
    resize_bilinear's H_DOWNSAMPLE_MATMUL path, so vs
    s2d(resize_bilinear(x, out_hw)) the result is bit-identical wherever the
    backend's dot reduction order is row-count-independent (TPU MXU; CPU
    matmuls may reassociate at the 1-2 ulp level — argmax-stable, same
    caveat as H_DOWNSAMPLE_MATMUL itself) — while the [.., oh, ow, C]
    tensor, its post-W-pass NHWC relayout, and the stem's 6-D unshuffle
    transpose (~0.7 ms/GOP combined on the camvid-bise18 LR batch, profiled
    round 4) never exist.

    Requires even out_hw and a >=2x H downsample (the regime of the LR frame
    resize this fuses; callers fall back to resize_bilinear otherwise).
    """
    h, w = x.shape[-3], x.shape[-2]
    c = x.shape[-1]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if oh % 2 or ow % 2 or c > 4 or oh * 2 > h:
        raise ValueError(
            f"resize_bilinear_s2d: need even out_hw, C<=4, >=2x H downsample "
            f"(got {x.shape} -> {out_hw})"
        )
    mh = _linear_matrix(h, oh, align_corners)
    mw = _linear_matrix(w, ow, align_corners)
    xm = x.reshape(x.shape[:-2] + (w * c,))
    if out_dtype is not None and xm.dtype != jnp.dtype(out_dtype):
        # serving cast folded into the resize: converting AFTER the minor-dim
        # merge hands XLA a convert whose only consumer is the H-pass dot
        # (the standalone tree-cast of [n,720,960,3] frames materialized a
        # convert + relayout copy, ~0.24 ms/GOP in the round-4 profile).
        # Elementwise cast — same values as casting before the reshape.
        xm = xm.astype(out_dtype)
    if S2D_ONE_EINSUM:
        # Stacked-matrix form: the four (dy, dx) parity outputs come out of
        # ONE H-pass and ONE W-pass einsum, with the channel packing
        # (dy*2C + dx*C + cc) landing as a contiguous minor-dims reshape —
        # no 4-way concatenate (a 0.27 ms/GOP layout copy on the
        # camvid-bise18 LR batch, round-4 profile). Per output element the
        # contraction row is the same mh/mw row as the loop form below:
        # bit-identical on the MXU.
        mh2 = jnp.asarray(np.stack([mh[0::2], mh[1::2]]))  # [2, oh/2, h]
        mw2 = jnp.asarray(np.stack([mw[0::2], mw[1::2]], 1))  # [ow/2, 2, w]
        if xm.dtype == jnp.float32:
            ym = jnp.einsum("dph,...hx->...dpx", mh2, xm, precision="highest")
            ym = ym.reshape(ym.shape[:-1] + (w, c))
            z = jnp.einsum("qew,...dpwc->...pqdec", mw2, ym,
                           precision="highest")
        else:
            ym = jnp.einsum("dph,...hx->...dpx", mh2.astype(xm.dtype), xm)
            ym = ym.reshape(ym.shape[:-1] + (w, c))
            z = jnp.einsum("qew,...dpwc->...pqdec", mw2.astype(xm.dtype), ym)
        return z.reshape(z.shape[:-3] + (4 * c,))
    ys = []
    for dy in (0, 1):
        mh_d = jnp.asarray(mh[dy::2])
        if xm.dtype == jnp.float32:
            ym = jnp.einsum("ph,...hx->...px", mh_d, xm, precision="highest")
        else:
            ym = jnp.einsum("ph,...hx->...px", mh_d.astype(xm.dtype), xm)
        ys.append(ym.reshape(ym.shape[:-1] + (w, c)))
    zs = []
    for dy in (0, 1):
        for dx in (0, 1):
            mw_d = jnp.asarray(mw[dx::2])
            if xm.dtype == jnp.float32:
                z = jnp.einsum("qw,...hwc->...hqc", mw_d, ys[dy],
                               precision="highest")
            else:
                z = jnp.einsum("qw,...hwc->...hqc", mw_d.astype(xm.dtype), ys[dy])
            zs.append(z)
    return jnp.concatenate(zs, axis=-1)


def resize_bilinear_s2d4(x, out_hw, align_corners: bool, out_dtype=None):
    """Fused bilinear resize + 4x4 pixel-unshuffle of [..., H, W, C] (C<=4):
    emits [..., oh/4, ow/4, 16C] in the two-level unshuffle order
    ``_unshuffle2(_unshuffle2(resized))`` — channel index
    dy1*8C + dx1*4C + dy2*2C + dx2*C + cc for logical pixel
    (4i + 2*dy1 + dy2, 4j + 2*dx1 + dx2) — the exact z4 layout
    `nn.functional.conv_stem_s2d4_blocks` consumes (serving s2d4 stems).

    Same construction as resize_bilinear_s2d one level deeper: each of the
    16 parity outputs is an (mh[p::4], mw[q::4]) sub-matrix pair of the same
    interpolation matrices, so per output element the contraction row is
    identical — bit-identical to s2d(resize) on the MXU, and the resized
    tensor, the z12 intermediate, and its second 2x2 unshuffle (two
    [n,oh/4,ow/4,8C] slice copies + concat, ~0.17 ms/GOP on the
    camvid-bise18 LR batch, round-5 profile) never materialize.

    Requires out_hw divisible by 4 and a >=2x H downsample.
    """
    h, w = x.shape[-3], x.shape[-2]
    c = x.shape[-1]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if oh % 4 or ow % 4 or c > 4 or oh * 2 > h:
        raise ValueError(
            f"resize_bilinear_s2d4: need out_hw % 4 == 0, C<=4, >=2x H "
            f"downsample (got {x.shape} -> {out_hw})"
        )
    mh = _linear_matrix(h, oh, align_corners)
    mw = _linear_matrix(w, ow, align_corners)
    xm = x.reshape(x.shape[:-2] + (w * c,))
    if out_dtype is not None and xm.dtype != jnp.dtype(out_dtype):
        xm = xm.astype(out_dtype)  # same folded serving cast as _s2d
    f32 = xm.dtype == jnp.float32
    ys = []
    for p in range(4):  # row parity p = 2*dy1 + dy2
        mh_p = jnp.asarray(mh[p::4])
        if f32:
            ym = jnp.einsum("ph,...hx->...px", mh_p, xm, precision="highest")
        else:
            ym = jnp.einsum("ph,...hx->...px", mh_p.astype(xm.dtype), xm)
        ys.append(ym.reshape(ym.shape[:-1] + (w, c)))
    zs = []
    for dy1 in (0, 1):
        for dx1 in (0, 1):
            for dy2 in (0, 1):
                for dx2 in (0, 1):
                    mw_q = jnp.asarray(mw[(2 * dx1 + dx2)::4])
                    yp = ys[2 * dy1 + dy2]
                    if f32:
                        z = jnp.einsum("qw,...hwc->...hqc", mw_q, yp,
                                       precision="highest")
                    else:
                        z = jnp.einsum("qw,...hwc->...hqc",
                                       mw_q.astype(xm.dtype), yp)
                    zs.append(z)
    return jnp.concatenate(zs, axis=-1)


def resize_bilinear_padded(x, out_hw, align_corners: bool, pads):
    """Fused bilinear resize + zero-pad of [..., H, W, C]: emits
    [..., pt+oh+pb, pl+ow+pr, C] with an exact-0.0 pad ring.

    Both axes run as constant interpolation-matrix matmuls whose pad rows
    are all-zero, so the resized map is written to HBM exactly once, already
    in the consumer's padded geometry. Used by the Pallas CReFF fast path
    (`ops/pallas_creff.creff_qkv_fused(lr_prepadded=True)`) to skip the
    separate lr_up round trip + pad pass of the composed form.

    Interior math: each output is exactly (1-w)*x0 + w*x1 in f32
    (precision=HIGHEST). In bf16 the MXU rounds the f32 accumulator once,
    while `resize_bilinear`'s H-pass lerp rounds per term — interiors may
    differ from resize_bilinear+pad by 1 ulp there (argmax-stable; parity
    tests compare at tolerance).

    pads: ((top, bottom), (left, right)).
    """
    (pt, pb), (pl, pr) = pads
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    mh = np.zeros((pt + oh + pb, h), np.float32)
    mh[pt : pt + oh] = _linear_matrix(h, oh, align_corners)
    mw = np.zeros((pl + ow + pr, w), np.float32)
    mw[pl : pl + ow] = _linear_matrix(w, ow, align_corners)
    if x.dtype == jnp.float32:
        y = jnp.einsum("ph,...hwc->...pwc", jnp.asarray(mh), x, precision="highest")
        return jnp.einsum("qw,...pwc->...pqc", jnp.asarray(mw), y, precision="highest")
    y = jnp.einsum("ph,...hwc->...pwc", jnp.asarray(mh).astype(x.dtype), x)
    return jnp.einsum("qw,...pwc->...pqc", jnp.asarray(mw).astype(x.dtype), y)


def resize_nearest(x, out_hw):
    """Nearest resize of [..., H, W, C], matching torch mode='nearest'."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x
    y = jnp.take(x, jnp.asarray(_nearest_index(h, oh)), axis=-3)
    y = jnp.take(y, jnp.asarray(_nearest_index(w, ow)), axis=-2)
    return y


def adaptive_avg_pool(x, out_hw):
    """AdaptiveAvgPool2d parity on [..., H, W, C]."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    return _apply_hw_matrices(
        x, _adaptive_avg_matrix(h, oh), _adaptive_avg_matrix(w, ow)
    )


def adaptive_max_pool_11(x):
    """AdaptiveMaxPool2d((1,1)) + flatten: [..., H, W, C] -> [..., C]."""
    return jnp.max(x, axis=(-3, -2))


def pixel_shuffle(x, r: int):
    """torch.nn.PixelShuffle parity in NHWC.

    Torch (NCHW): out[n, c, h*r+i, w*r+j] = in[n, c*r*r + i*r + j, h, w].
    Here channels of NHWC follow the same ordering as the torch channel dim.
    """
    n, h, w, c = x.shape
    co = c // (r * r)
    y = x.reshape(n, h, w, co, r, r)
    y = y.transpose(0, 1, 4, 2, 5, 3)
    return y.reshape(n, h * r, w * r, co)
