"""Functional NN primitives, NHWC layout, torch-parity semantics.

Parameter convention (mirrors the torch module tree of the reference so the
checkpoint converter is a mechanical transpose):

  conv:   {"weight": [kh, kw, in/groups, out], "bias": [out]?}
  bn:     {"weight": [c], "bias": [c], "running_mean": [c], "running_var": [c]}
  linear: {"weight": [in, out], "bias": [out]}

BatchNorm running-statistics updates during training are collected through
`Ctx` (path -> (batch_mean, batch_var_unbiased)) and folded back into the
param tree by the train step (`apply_bn_updates`), keeping apply functions
pure.
"""

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


class Ctx:
    """Per-apply context: train flag, dropout RNG stream, BN stat updates."""

    def __init__(self, train: bool = False, rng=None):
        self.train = train
        self._rng = rng
        self.bn_updates = {}

    def next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub


# The 6-D reshape+transpose form of the 2x2 pixel-unshuffle costs ~1.6 ms/GOP
# in relayout copies on v5e (profiled: reshape.16 0.74 + copy.290 0.35 on the
# keyframe, copy.353/354 0.53 on the LR batch). The slice form replaces it
# with two stride-2 sublane slices + two minor-dim bitcasts + one concat —
# bitwise-identical channel order dy*2c + (dx*c + cc).
# Measured round 4 (probes/r3/tools_probe_r3q.py + profile2): the slice form
# is a large win on the per-frame HR program (batch 1: the 6-D transpose of
# [1,360,2,480,2,3] cost ~1.1 ms/frame; HR-everyframe 311 -> 453 fps) and
# ~neutral on the batched LR stems (n=11: the slice-reshape relayout
# [11,180,240,6] copies ~1.08 ms/GOP, about what the transposes cost).
# "auto" = slice form iff n == 1 — each call site gets its measured winner.
# True/False force one form everywhere (probe A/Bs).
USE_S2D_SLICE_UNSHUFFLE = "auto"


class S2DPacked:
    """A 2x2 pixel-unshuffled image batch (channel order dy*2C + dx*C + cc —
    the layout _conv_s2d_stem builds internally), produced upstream by
    `ops.resize.resize_bilinear_s2d` so the resize and the stem unshuffle
    fuse into one pass. conv2d's s2d stem path consumes `.z` directly; any
    other op receiving one raises (loudly — a packed input is only legal at
    a 7x7/s2/p3 stem). `.shape`/`.dtype` report the LOGICAL un-unshuffled
    geometry so shape-driven model code is unaffected."""

    def __init__(self, z):
        self.z = z

    @property
    def shape(self):
        n, h2, w2, c4 = self.z.shape
        return (n, h2 * 2, w2 * 2, c4 // 4)

    @property
    def dtype(self):
        return self.z.dtype

    def astype(self, dt):
        return S2DPacked(self.z.astype(dt))


class S2D4Packed:
    """A 4x4 pixel-unshuffled image batch (two-level _unshuffle2 channel
    order dy1*8C + dx1*4C + dy2*2C + dx2*C + cc), produced upstream by
    `ops.resize.resize_bilinear_s2d4` so the LR resize feeds the serving
    s2d4 block stem (`conv_stem_s2d4_blocks`) directly — neither the
    resized image nor the z12 intermediate materializes. Only legal at
    that stem; `.shape`/`.dtype` report the logical geometry."""

    def __init__(self, z4):
        self.z4 = z4

    @property
    def shape(self):
        n, h4, w4, c16 = self.z4.shape
        return (n, h4 * 4, w4 * 4, c16 // 16)

    @property
    def dtype(self):
        return self.z4.dtype

    def astype(self, dt):
        return S2D4Packed(self.z4.astype(dt))


def _conv_s2d_stem(p, x):
    """Exact 7x7/stride-2/pad-3 conv via 2x2 space-to-depth (see conv2d)."""
    if isinstance(x, S2D4Packed):
        raise TypeError(
            "S2D4Packed input reached the s2d2 stem — the caller emitted the "
            "z4 layout but STEM_S2D4_BLOCKS routing is off; keep the "
            "emission gated on stem_s2d4_enabled()"
        )
    w = p["weight"]  # [7, 7, C, O]
    if isinstance(x, S2DPacked):
        n, h, wd, c = x.shape
        z = x.z
        x = z  # for the .dtype uses below
    else:
        n, h, wd, c = x.shape
        # pixel-unshuffle: channel index dy*2c + dx*c + cc
        use_slice = USE_S2D_SLICE_UNSHUFFLE
        if use_slice == "auto":
            use_slice = n == 1
        if use_slice:
            a = x[:, 0::2].reshape(n, h // 2, wd // 2, 2 * c)
            b = x[:, 1::2].reshape(n, h // 2, wd // 2, 2 * c)
            z = jnp.concatenate([a, b], axis=-1)
        else:
            z = x.reshape(n, h // 2, 2, wd // 2, 2, c)
            z = jnp.transpose(z, (0, 1, 3, 2, 4, 5)).reshape(n, h // 2, wd // 2, 4 * c)

    # Tap a of the 7x7 kernel lands at 4x4-kernel row ai with input parity
    # dy, where dy=(a+1)%2 and ai=(a-3-dy)//2+2 — equivalently the PADDED tap
    # index a+1 equals 2*ai+dy. So one leading zero-pad on each spatial axis
    # followed by a [4,2,4,2,C,O] reshape places every tap: index
    # [ai,dy,bi,dx] = w[a,b], with the (ai=0,dy=0)/(bi=0,dx=0) rows landing
    # on the zero padding (the taps the 4x4 kernel never uses). Channel
    # order dy*2c+dx*c+cc is the (dy,dx,cc) transpose. Three ops instead of
    # a 49-step .at[].set chain (each set is a separate device op; the chain
    # cost ~0.5 ms/call per stem on v5e), bitwise-identical placement.
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w4 = wp.reshape(4, 2, 4, 2, c, w.shape[3])
    w4 = jnp.transpose(w4, (0, 2, 1, 3, 4, 5)).reshape(4, 4, 4 * c, w.shape[3])

    out = jax.lax.conv_general_dilated(
        z,
        w4.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision="highest",
    )
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"].astype(x.dtype)
    return out


# ---------------------------------------------------------------------------
# s2d4 block-form stem (serving path)
#
# The s2d2 stem above still contracts only 12 lanes of the MXU's 128 (9.4%;
# measured 20.5 TF/s on the [11,180,240,64] LR stems — exactly the lane-pad
# model's prediction, r4i profile). Space-to-depth ONCE MORE fixes it: on the
# s2d4 grid [H/4, W/4, 48] the exact 7x7/s2 stem is a single 3x3 conv over 48
# channels (37.5% lanes) that emits all four output parities as channel
# blocks [n, H/4, W/4, 4*O] (block (py*2+px)*O holds logical pixel
# (2i+py, 2j+px)). Tap placement: 4x4-form tap a4 lands at s2d4 tap qy with
# input parity ey for output parity py iff a4 = 2*qy + ey - py (qy in
# {-1,0,1}); out-of-range taps are zeros. Downstream serving consumers eat
# the blocks directly — BN/ReLU with 4x-tiled params (elementwise, bitwise
# equal), the resnet 3x3/s2/p1 maxpool as a separable parity max, and the
# bise18 spatial conv2 (3x3/s2/p1) as a 2x2 conv over the 256-ch block form
# (dy = 2*qy + py - 2; contraction 256 = full lanes) — so the logical
# [H/2, W/2, 64] tensor is never materialized. Same math as the s2d2 path up
# to contraction order (~1e-6 f32, probes/r4/tools_probe_r4j.py).
#
# Training keeps the s2d2 path: block-form batch stats would average per
# (parity, channel) rather than per logical channel.
#
# Measured (r4j, v5e bf16): LR [11,360,480,3] stem conv 2.33 -> 1.73 ms,
# spatial conv1+2 pair 2.45 -> 1.98; HR [1,720,960,3] stem+pool 2.55 -> 1.33,
# spatial pair 1.81 -> 1.31 (probe fed a precomputed z4 — production pays
# one extra 2x2 unshuffle on top of the packed z12).
#
# Full-program A/B (r4k, bench_logs/r4queue_r4k.log): AR pipeline
# 13.95 -> 13.60 ms/GOP, HR-everyframe 26.22 -> 19.86, psp18-V2 neutral;
# bf16 argmax agreement on-vs-off 0.994 on random weights (contraction
# order changes; covered by the serving-dtype caveat, PARITY.md §1).
# Default ON: both the AR program and the vs_baseline HR denominator get
# the same best implementation.
STEM_S2D4_BLOCKS = True

# At batch>1 the r4m profile shows the parity-max pool chain (slices +
# shifted maxima) costing ~0.52 ms/GOP vs reduce_window's 0.25 on the LR
# [11,90,120,256] block tensor, while at n==1 (HR keyframe) the parity form
# measured -1.22 ms (r4j). When True, resnet_stem unblocks (d2s) and uses
# reduce_window for n>1 — bitwise-equal either way. Decided ON by probe
# r4n (bench_logs/r4queue_r4n.log, v5e 2026-08-19): production AR GOP
# 14.57 -> 14.14 ms/GOP, bitwise agreement 1.0; the n==1 gate keeps the
# HR-everyframe baseline (per-frame lax.map) on the faster parity form.
# (Same probe: WARP_T4 stays False — -0.16 ms single-GOP is inside session
# noise, multi-GOP B=8 LOSES 11.59 -> 12.97 ms/GOP on the 4x table repeat,
# and combining it with this flag interferes: +0.25 vs base.)
S2D4_POOL_D2S_BATCH = True

# Batched-stem pool via the HALF-d2s separable form (see
# max_pool_3x3_s2_p1_blocks_half) instead of full d2s + reduce_window.
# Takes precedence over S2D4_POOL_D2S_BATCH at n>1 when True. Default ON:
# probes/r5/tools_probe_r5e.py -0.30 ms/GOP and r5f twice (-0.12/-0.33) on
# the production AR program, bitwise agreement 1.0 + equal checksums
# (bench_logs/r5queue_r5e.log, r5f logs).
S2D4_POOL_HALF_D2S_BATCH = True


def stem_s2d4_enabled(ctx):
    return STEM_S2D4_BLOCKS and not (ctx is not None and ctx.train)


def _unshuffle2(x):
    """2x2 pixel-unshuffle, channel order dy*2C + dx*C + cc (slice form)."""
    n, h, w, c = x.shape
    a = x[:, 0::2].reshape(n, h // 2, w // 2, 2 * c)
    b = x[:, 1::2].reshape(n, h // 2, w // 2, 2 * c)
    return jnp.concatenate([a, b], axis=-1)


def _stem_kernel_s2d4(w):
    """[7,7,C,O] -> [3,3,16C,4O] block-form stem kernel (trace-time)."""
    c, o = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w4 = wp.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    w4 = w4.reshape(4, 4, 4 * c, o)
    w4p = jnp.pad(w4, ((0, 1), (0, 1), (0, 0), (0, 0)))  # row/col 4 == zeros
    q, e, par = np.arange(3), np.arange(2), np.arange(2)
    a = 2 * q[:, None, None] + e[None, :, None] - par[None, None, :]
    a = np.where((a >= 0) & (a <= 3), a, 4)  # [q, e, parity]
    ay = a[:, None, :, None, :, None]  # [qy, qx, ey, ex, py, px]
    bx = a[None, :, None, :, None, :]
    k = w4p[ay, bx]  # [3, 3, 2, 2, 2, 2, 4C, O]
    k = k.transpose(0, 1, 2, 3, 6, 4, 5, 7)  # ch in = (ey,ex,c4); out = (py,px,o)
    return k.reshape(3, 3, 16 * c, 4 * o)


def conv_stem_s2d4_blocks(p, x):
    """7x7/s2/p3 stem conv -> block form [n, H/4, W/4, 4*O].

    Accepts a raw [n,H,W,C] image (H, W divisible by 4), the S2DPacked z12
    the fused s2d resize emits (one more 2x2 unshuffle builds z4), or an
    S2D4Packed z4 straight from `resize_bilinear_s2d4` (no unshuffle at
    all)."""
    if isinstance(x, S2D4Packed):
        z4 = x.z4
    else:
        z12 = x.z if isinstance(x, S2DPacked) else _unshuffle2(x)
        z4 = _unshuffle2(z12)
    k = _stem_kernel_s2d4(p["weight"])
    out = jax.lax.conv_general_dilated(
        z4, k.astype(z4.dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision="highest")
    if "bias" in p and p["bias"] is not None:
        out = out + jnp.tile(p["bias"], 4).astype(out.dtype)
    return out


def conv3x3s2_from_blocks(p, b):
    """3x3/stride-2/pad-1 conv consuming block form -> logical [n,H/4,W/4,O].

    Logical row 2i+dy lives at block parity py, s2d row i+qy-1 with
    dy = 2*qy + py - 2; the (qy=0, py=0) tap (dy=-2) is zero."""
    w = p["weight"]
    cin, cout = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # idx 3 == zero
    q, par = np.arange(2), np.arange(2)
    d = 2 * q[:, None] + par[None, :] - 2
    idx = np.where((d >= -1) & (d <= 1), d + 1, 3)  # [q, parity]
    ky = idx[:, None, :, None]  # [qy, qx, py, px]
    kx = idx[None, :, None, :]
    k = wp[ky, kx]  # [2, 2, 2, 2, cin, cout]; ch in = (py, px, cin)
    k = k.reshape(2, 2, 4 * cin, cout)
    out = jax.lax.conv_general_dilated(
        b, k.astype(b.dtype), window_strides=(1, 1),
        padding=[(1, 0), (1, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision="highest")
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"].astype(out.dtype)
    return out


def _shift_m1(x, axis, fill):
    """y[i] = x[i-1] along `axis`, `fill` at i=0 (same shape)."""
    pad = jnp.full_like(jax.lax.slice_in_dim(x, 0, 1, axis=axis), fill)
    return jnp.concatenate(
        [pad, jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)],
        axis=axis)


def max_pool_3x3_s2_p1_blocks(b):
    """torch MaxPool2d(3, stride=2, padding=1) on a block-form stem output.

    pooled[i,j] = max over logical rows {2i-1, 2i, 2i+1} = blocks
    {(py=1, i-1), (py=0, i), (py=1, i)} and likewise on W — separable."""
    o = b.shape[-1] // 4
    ninf = -jnp.inf
    B = [[b[..., (py * 2 + px) * o:(py * 2 + px + 1) * o]
          for px in range(2)] for py in range(2)]
    m = [jnp.maximum(jnp.maximum(_shift_m1(B[1][px], 1, ninf), B[0][px]),
                     B[1][px]) for px in range(2)]
    return jnp.maximum(jnp.maximum(_shift_m1(m[1], 2, ninf), m[0]), m[1])


def max_pool_3x3_s2_p1_blocks_half(b):
    """torch MaxPool2d(3, s=2, p=1) on a block-form stem output via a
    HALF depth-to-space: only the row parity is unblocked (a 128-lane-
    aligned channel split — py0 = lanes 0:128, py1 = 128:256 — then an
    untiled-axis interleave), the H window runs as a plain reduce_window
    on [n, 2Hq, Wq, 128], and the column parity is resolved at the 4x
    smaller pooled tensor by the shift-max form. Bitwise-equal to
    max_pool_3x3_s2_p1(d2s_blocks(b)) (pure max reassociation); avoids
    the full d2s's [n,Hq,2,Wq,2,O] W-interleave transpose (0.525 ms/GOP
    on the round-5 profile of the camvid-bise18 LR batch)."""
    n, hq, wq, c4 = b.shape
    o = c4 // 4
    z = jnp.stack([b[..., : 2 * o], b[..., 2 * o :]], axis=2)
    z = z.reshape(n, hq * 2, wq, 2 * o)
    m = jax.lax.reduce_window(
        z, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 1, 1), window_strides=(1, 2, 1, 1),
        padding=((0, 0), (1, 1), (0, 0), (0, 0)))
    m0, m1 = m[..., :o], m[..., o:]
    return jnp.maximum(jnp.maximum(_shift_m1(m1, 2, -jnp.inf), m0), m1)


def d2s_blocks(b):
    """Block form [n,Hq,Wq,4O] -> logical [n,2Hq,2Wq,O]."""
    n, hq, wq, c4 = b.shape
    o = c4 // 4
    z = b.reshape(n, hq, wq, 2, 2, o).transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(n, hq * 2, wq * 2, o)


def tile_bn4(p):
    """BN params tiled 4x for the block-form layout (elementwise-identical)."""
    return {k: jnp.tile(v, 4) for k, v in p.items()}


def conv2d(p, x, stride=1, padding=0, dilation=1, groups=1):
    """NHWC conv with torch Conv2d semantics. weight: [kh,kw,in/groups,out]."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    w = p["weight"]
    if isinstance(x, S2DPacked):
        # pre-unshuffled input (resize fused with the stem s2d upstream):
        # only legal at the 7x7/s2/p3 stem this layout was built for
        if not (
            w.shape[0] == 7
            and w.shape[1] == 7
            and w.shape[2] * 4 == x.z.shape[-1]
            and stride == (2, 2)
            and padding == (3, 3)
            and dilation == (1, 1)
            and groups == 1
        ):
            raise TypeError(
                f"S2DPacked input reached a non-stem conv (weight "
                f"{tuple(w.shape)}, stride={stride}, padding={padding})"
            )
        return _conv_s2d_stem(p, x)
    if (
        w.shape[0] == 7
        and w.shape[1] == 7
        and w.shape[2] <= 4
        and stride == (2, 2)
        and padding == (3, 3)
        and dilation == (1, 1)
        and groups == 1
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
    ):
        # space-to-depth stem: a 7x7/s2/p3 conv over C<=4 runs at <1 TF/s on
        # TPU (the MXU contraction dim is starved; measured 3.46 ms of the
        # 4.94 ms BiSeNet forward at 720x960). The exact rewrite: 2x2
        # pixel-unshuffle the input (C -> 4C) and scatter the 49 taps into a
        # 4x4 kernel — tap a lands at row (a-3-dy)//2+2 with parity
        # dy=(a+1)%2 — with asymmetric (2,1) padding. Same math up to the
        # contraction's f32 summation order (~1e-5), no checkpoint change.
        return _conv_s2d_stem(p, x)
    if (
        groups > 1
        and groups == x.shape[-1]
        and w.shape[2] == 1
        and w.shape[3] == groups
        and stride == (1, 1)
        and dilation == (1, 1)
    ):
        # depthwise: XLA's feature_group_count lowering is ~20x off roofline
        # on TPU at these shapes (measured 5.5 ms for 3x3 g=64 @720x960 bf16);
        # kh*kw shifted multiply-adds are memory-bound instead (~1 ms)
        kh, kw = w.shape[:2]
        xp = jnp.pad(
            x, ((0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0))
        )
        h, wdt = x.shape[1] + 2 * padding[0], x.shape[2] + 2 * padding[1]
        out = None
        wx = w.astype(x.dtype)
        for i in range(kh):
            for j in range(kw):
                term = xp[:, i : i + h - kh + 1, j : j + wdt - kw + 1, :] * wx[i, j, 0]
                out = term if out is None else out + term
        if "bias" in p and p["bias"] is not None:
            out = out + p["bias"].astype(x.dtype)
        return out
    out = jax.lax.conv_general_dilated(
        x,
        p["weight"].astype(x.dtype),
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision="highest",
    )
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"].astype(x.dtype)
    return out


def batch_norm(p, x, ctx: Ctx, path: str = ""):
    """BatchNorm2d (or 1d on [N,C]) with torch semantics.

    Eval: running stats. Train: biased batch stats for normalization; the
    unbiased batch stats are recorded in ctx.bn_updates for the momentum
    update of the running stats (torch behavior)."""
    axes = tuple(range(x.ndim - 1))
    if ctx.train:
        # batch statistics always accumulate in f32: under mixed-precision
        # training (bf16 activations) a bf16 mean/var over ~1e5 pixels loses
        # mantissa; for f32 inputs the cast is the identity
        xs = x.astype(jnp.float32)
        mean = jnp.mean(xs, axis=axes)
        var = jnp.var(xs, axis=axes)
        n = 1
        for a in axes:
            n *= x.shape[a]
        unbiased = var * (n / max(n - 1, 1))
        ctx.bn_updates[path] = (mean, unbiased)
    else:
        mean = p["running_mean"]
        var = p["running_var"]
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + BN_EPS)
    out = (x - mean.astype(x.dtype)) * (inv.astype(x.dtype))
    return out * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)


def apply_bn_updates(params, updates, momentum: float = BN_MOMENTUM):
    """Fold ctx.bn_updates back into the param tree (running-stat momentum)."""
    params = dict(params)  # shallow copies along each touched path

    def set_path(tree, keys, mean, var):
        k = keys[0]
        if len(keys) == 1:
            node = dict(tree[k])
            node["running_mean"] = (1 - momentum) * node["running_mean"] + momentum * mean
            node["running_var"] = (1 - momentum) * node["running_var"] + momentum * var
            tree[k] = node
        else:
            sub = dict(tree[k])
            set_path(sub, keys[1:], mean, var)
            tree[k] = sub

    for path, (mean, var) in updates.items():
        set_path(params, path.split("."), mean, var)
    return params


def linear(p, x):
    return (
        jnp.einsum("...i,io->...o", x, p["weight"].astype(x.dtype), precision="highest")
        + p["bias"].astype(x.dtype)
    )


def relu(x):
    return jnp.maximum(x, 0)


def prelu(p, x):
    """torch PReLU (single shared slope parameter 'weight': [1])."""
    a = p["weight"].astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def log_softmax(x, axis=-1):
    return jax.nn.log_softmax(x, axis=axis)


def max_pool_3x3_s2_p1(x):
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1) on NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def dropout2d(x, p: float, ctx: Ctx):
    """Channel-wise dropout (torch Dropout2d): zero whole channels, scale."""
    if not ctx.train or p == 0.0:
        return x
    keep = 1.0 - p
    mask = jax.random.bernoulli(ctx.next_rng(), keep, (x.shape[0], 1, 1, x.shape[-1]))
    return x * mask.astype(x.dtype) / keep


def dropout(x, p: float, ctx: Ctx):
    if not ctx.train or p == 0.0:
        return x
    keep = 1.0 - p
    mask = jax.random.bernoulli(ctx.next_rng(), keep, x.shape)
    return x * mask.astype(x.dtype) / keep
