"""Motion-vector feature warping (torch grid_sample parity), NHWC layout.

Replaces the reference's `warpFeature` (/root/reference `evaluation.py:61-87`),
which builds an absolute sampling grid from per-pixel motion vectors and calls
`F.grid_sample(feature, vgrid)` — bilinear, zero padding, and (in the
reference's torch>=1.3 environment) align_corners=False by default.

TPU-first design: one lax.gather of [2, 2, C] corner blocks per output pixel
from a zero-padded source (out-of-bounds corners are masked in the weights),
fully vectorized — no scatter, no data-dependent shapes. Measured ~2x faster
than four per-corner row gathers at 720x960x64 on v5e (descriptor-bound).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from arseg_tpu.ops.resize import resize_bilinear, resize_nearest

# H-pass gather strategy for flow-PLANE resizes ([N, H, W] with W on the
# lane axis): an inner-axis take on axis -2 makes XLA relayout the whole
# [11,720,960] f32 operand to put H major (copy.445/441 in the round-5
# profile — the last input relayouts left in the production GOP program).
# Merging the leading dims into H makes the same take a natural-layout row
# gather of the [N*H, W] view — identical elements, identical lerp
# arithmetic, bitwise-equal output. Same trick as
# ops.resize.MERGED_ROW_GATHER, scoped to the plane form whose index table
# stays tiny (N*out_h entries). Default ON per probes/r5/tools_probe_r5d.py
# (bench_logs/r5queue_r5d.log): -0.56 ms/GOP on the production camvid-bise18
# AR program, agreement 1.000000; composes with bf16-staged frames to
# -0.80. Bitwise unit test: tests/test_warp.py::
# test_flow_plane_merged_take_bitwise_identical.


_BLK = 4  # output block edge for the blocked gather fast path
_WIN = 6  # source window edge per block (covers per-block offset span <= 4)


def grid_sample(feature, grid, align_corners: bool = False, method: str = "exact"):
    """Bilinear zero-padding grid sample.

    feature: [N, H, W, C]; grid: [N, Hg, Wg, 2] with (x, y) in [-1, 1].
    Matches torch.nn.functional.grid_sample(mode='bilinear',
    padding_mode='zeros', align_corners=align_corners).

    method:
      'exact'   — one [2,2,C] gather per output pixel (~22 ns/descriptor on
                  v5e -> ~16 ms at 720x960x64; descriptor-bound, payload
                  size is irrelevant). THE production path this round.
      'blocked' — one [6,6,C] window gather per 4x4 output block + per-pixel
                  corner selection from the private window by masked
                  per-axis sums. Mathematically identical to 'exact' when
                  every block's corner indices fit its window (holds when
                  sampling offsets vary <= 4 px within each 4x4 block; HEVC
                  motion fields are block-piecewise-constant).
                  MEASURED SLOWER in pure XLA (43 ms: multi-row gather
                  slices cost ~2.1 us/descriptor — 100x the [2,2,C] rate —
                  and the 36-term masked sum does not fuse): kept, with
                  parity tests, as the verified-correct formulation for the
                  round-2 Pallas select kernel (manual-DMA windows + in-VMEM
                  selects), NOT for production use.
      'auto'    — blocked guarded by a runtime coherence check with lax.cond
                  fallback to exact (cond overhead measured ~0).
    """
    n, h, w, c = feature.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    return _grid_sample_planes(feature, gx, gy, align_corners, method)


def pad_for_warp(feature):
    """1-px zero border used by the zero-padding gather (see
    _grid_sample_planes). Expose it so a caller warping the SAME source
    many times (the GOP pipeline warps one keyframe feature to every
    non-key frame inside a lax.map) can pad once outside the loop —
    XLA does not hoist the loop-invariant pad (profiled 0.22 ms/GOP as
    pad.1333 re-materializing per frame)."""
    return jnp.pad(feature, ((0, 0), (1, 1), (1, 1), (0, 0)))


def t4_table(feature, prepadded: bool = False):
    """Corner-packed warp table: t4[n, y, x] = the four bilinear corners
    (fp[y,x], fp[y,x+1], fp[y+1,x], fp[y+1,x+1]) channel-concatenated,
    where fp is the pad_for_warp'ed source -> [N, H+1, W+1, 4C].

    A caller warping the SAME source many times (the GOP fuse loop) builds
    this once; each warp then reads ONE contiguous (1, 4C) row per output
    pixel instead of a (2, 2, C) two-row strided block — measured 26x
    faster per gather for HBM-resident sources at the bise18 fusion shape
    (probes/r4/tools_probe_r4l.py; production A/B in r4n). Same indices,
    same weights, f32-bitwise-identical output (max|d|=0)."""
    fp = feature if prepadded else pad_for_warp(feature)
    return jnp.concatenate(
        [fp[:, :-1, :-1], fp[:, :-1, 1:], fp[:, 1:, :-1], fp[:, 1:, 1:]],
        axis=-1,
    )


def _grid_sample_planes(feature, gx, gy, align_corners, method="exact",
                        prepadded=False, t4=False):
    """grid_sample on pre-split normalized-coordinate planes gx/gy [N,Hg,Wg].

    prepadded=True: `feature` already carries the 1-px zero border from
    pad_for_warp (shape [N, H+2, W+2, C]); h/w below refer to the unpadded
    content. Bitwise-identical output to the pad-inside path.

    t4=True: `feature` is a t4_table(source) [N, H+1, W+1, 4C] — the gather
    reads one contiguous packed-corner row per output pixel. Same index and
    weight math, f32-bitwise-identical output."""
    n, h, w, c = feature.shape
    if t4:
        h, w, c = h - 1, w - 1, c // 4
    elif prepadded:
        h, w = h - 2, w - 2
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

    # corner top-left index in the 1-px zero-padded source
    if t4 or prepadded:
        fp = feature
    else:
        fp = jnp.pad(feature, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
    yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)

    # per-corner validity (zero-padding semantics even where the index
    # clamp landed a far-out-of-bounds window on real texels)
    def axis_w(w0, frac, lim, d):
        valid = (w0 + d >= 0) & (w0 + d <= lim)
        return (frac if d else 1 - frac) * valid

    wx0, wx1 = axis_w(x0, wx, w - 1, 0), axis_w(x0, wx, w - 1, 1)
    wy0, wy1 = axis_w(y0, wy, h - 1, 0), axis_w(y0, wy, h - 1, 1)

    hg, wg = gx.shape[1:]

    if t4:
        tab = fp.reshape(n, (h + 1) * (w + 1), 4 * c)
        flat = (yi * (w + 1) + xi).reshape(n, -1)
        rows = jax.vmap(lambda t1, i1: jnp.take(t1, i1, axis=0))(tab, flat)
        blk = rows.reshape(n, hg, wg, 4, c)
        out = (
            blk[:, :, :, 0] * (wy0 * wx0)[..., None]
            + blk[:, :, :, 1] * (wy0 * wx1)[..., None]
            + blk[:, :, :, 2] * (wy1 * wx0)[..., None]
            + blk[:, :, :, 3] * (wy1 * wx1)[..., None]
        )
        return out.astype(feature.dtype)

    def exact():
        idx = jnp.stack([yi, xi], axis=-1).reshape(n, -1, 2)

        def g1(fp1, idx1):
            dn = lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
            )
            return lax.gather(
                fp1, idx1, dn, slice_sizes=(2, 2, c), mode=lax.GatherScatterMode.CLIP
            )

        blk = jax.vmap(g1)(fp, idx).reshape(n, hg, wg, 2, 2, c)
        out = (
            blk[:, :, :, 0, 0] * (wy0 * wx0)[..., None]
            + blk[:, :, :, 0, 1] * (wy0 * wx1)[..., None]
            + blk[:, :, :, 1, 0] * (wy1 * wx0)[..., None]
            + blk[:, :, :, 1, 1] * (wy1 * wx1)[..., None]
        )
        return out.astype(feature.dtype)

    blockable = (
        hg % _BLK == 0 and wg % _BLK == 0 and h + 2 >= _WIN and w + 2 >= _WIN
    )
    if method == "exact" or not blockable:
        return exact()

    # ---- blocked fast path -------------------------------------------------
    hb, wb = hg // _BLK, wg // _BLK
    yi_b = yi.reshape(n, hb, _BLK, wb, _BLK)
    xi_b = xi.reshape(n, hb, _BLK, wb, _BLK)
    base_y = jnp.min(yi_b, axis=(2, 4))
    base_x = jnp.min(xi_b, axis=(2, 4))
    # clip so the whole window stays inside the padded source; because
    # yi <= h and base >= h+2-WIN after the clip, offsets stay <= WIN-2
    base_y = jnp.minimum(base_y, h + 2 - _WIN)
    base_x = jnp.minimum(base_x, w + 2 - _WIN)
    off_y = yi_b - base_y[:, :, None, :, None]  # in [0, ...]
    off_x = xi_b - base_x[:, :, None, :, None]
    coherent = jnp.max(jnp.maximum(off_y, off_x)) <= _WIN - 2

    def blocked():
        idx = jnp.stack([base_y, base_x], axis=-1).reshape(n, -1, 2)

        def g1(fp1, idx1):
            dn = lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
            )
            return lax.gather(
                fp1, idx1, dn, slice_sizes=(_WIN, _WIN, c),
                mode=lax.GatherScatterMode.CLIP,
            )

        win = jax.vmap(g1)(fp, idx).reshape(n, hb, 1, wb, 1, _WIN, _WIN, c)

        w0y = wy0.reshape(n, hb, _BLK, wb, _BLK)
        w1y = wy1.reshape(n, hb, _BLK, wb, _BLK)
        w0x = wx0.reshape(n, hb, _BLK, wb, _BLK)
        w1x = wx1.reshape(n, hb, _BLK, wb, _BLK)

        # out[p] = sum_r RW_r(p) * (sum_e CW_e(p) * win[block(p), r, e]) with
        # RW_r = w0y*1{off_y==r} + w1y*1{off_y==r-1} (CW likewise): each
        # output receives exactly its four (1-w)/w corner terms, selected
        # from the block's private window by one-hot masks — exact because
        # the window axis is block-local (per-pixel indices never alias
        # across output pixels). Coherence (off <= WIN-2) is guaranteed by
        # the caller's lax.cond guard (or asserted by the 'blocked' caller).
        offc_y = jnp.clip(off_y, 0, _WIN - 2)
        offc_x = jnp.clip(off_x, 0, _WIN - 2)

        def axis_masks(off, w0, w1):
            return [
                jnp.where(off == r, w0, 0.0)
                + (jnp.where(off == r - 1, w1, 0.0) if r else 0.0)
                for r in range(_WIN)
            ]

        rws = axis_masks(offc_y, w0y, w1y)
        cws = axis_masks(offc_x, w0x, w1x)
        out = jnp.zeros((n, hb, _BLK, wb, _BLK, c), jnp.float32)
        for r in range(_WIN):
            inner = jnp.zeros_like(out)
            for e in range(_WIN):
                inner = inner + cws[e][..., None] * win[:, :, :, :, :, r, e, :].astype(
                    jnp.float32
                )
            out = out + rws[r][..., None] * inner
        return out.reshape(n, hg, wg, c).astype(feature.dtype)

    if method == "blocked":
        return blocked()
    return lax.cond(coherent, blocked, exact)


def warp_feature(feature, flow, align_corners: bool = False, method: str = "exact",
                 prepadded: bool = False, t4: bool = False):
    """Warp `feature` [N,H,W,C] by pixel displacements.

    flow: [N,H,W,2] (x, y) array, or a tuple (fx, fy) of [N,H,W] planes —
    the plane form keeps W on the TPU lane axis; a 2-channel NHWC array
    wastes 126/128 lanes of every vector op that touches it.

    prepadded=True: `feature` is pad_for_warp(source) ([N,H+2,W+2,C]) and
    `flow` is at the UNPADDED [H, W] geometry — use when the same source is
    warped repeatedly (pad once, outside the loop).

    t4=True: `feature` is t4_table(source) ([N,H+1,W+1,4C]); `flow` at the
    unpadded [H, W] geometry. One contiguous packed-corner row gathered per
    output pixel — build the table once when warping the same source many
    times. f32-bitwise-identical to the exact path.

    Equivalent of the reference warpFeature (`evaluation.py:61-87`): absolute
    grid = base + flow, normalized to [-1,1] by (size-1), then grid_sample
    (plane-native — the [..., 2] grid stack/unstack relayout is skipped).
    """
    n, h, w, c = feature.shape
    if t4:
        h, w = h - 1, w - 1
    elif prepadded:
        h, w = h - 2, w - 2
    if isinstance(flow, tuple):
        fx, fy = flow
    else:
        fx, fy = flow[..., 0], flow[..., 1]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    vx = xx + fx.astype(jnp.float32)
    vy = yy + fy.astype(jnp.float32)
    gx = 2.0 * vx / max(w - 1, 1) - 1.0
    gy = 2.0 * vy / max(h - 1, 1) - 1.0
    return _grid_sample_planes(feature, gx, gy, align_corners, method,
                               prepadded=prepadded, t4=t4)


FLOW_MERGED_TAKE = True


def _lerp_h_merged(x, out_size, align_corners):
    """H-axis linear resample of [..., H, W] via a merged-row gather (see
    FLOW_MERGED_TAKE above). Same (i0, i1, w) table and the same
    x0*(1-w) + x1*w expression as ops.resize._lerp_axis — bitwise-equal."""
    from arseg_tpu.ops.resize import _linear_gather

    h, w = x.shape[-2], x.shape[-1]
    lead = x.shape[:-2]
    n = int(np.prod(lead)) if lead else 1
    i0, i1, wv = _linear_gather(h, out_size, align_corners)
    xm = x.reshape(n * h, w)
    base = np.arange(n, dtype=np.int64)[:, None] * h
    x0 = jnp.take(xm, jnp.asarray((base + i0[None, :]).reshape(-1)), axis=0)
    x1 = jnp.take(xm, jnp.asarray((base + i1[None, :]).reshape(-1)), axis=0)
    wb = jnp.asarray(np.tile(wv, n)).reshape(-1, 1).astype(x.dtype)
    y = x0 * (1 - wb) + x1 * wb
    return y.reshape(lead + (out_size, w))


def _resize_plane_bilinear(x, out_hw, align_corners):
    """Bilinear resize of [..., H, W] planes (W on the lane axis)."""
    from arseg_tpu.ops.resize import _lerp_axis

    h, w = x.shape[-2], x.shape[-1]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x
    if FLOW_MERGED_TAKE and h != oh and x.ndim >= 2:
        y = _lerp_h_merged(x, oh, align_corners)
    else:
        y = _lerp_axis(x, h, oh, align_corners, x.ndim - 2)
    return _lerp_axis(y, w, ow, align_corners, x.ndim - 1)


def _resize_plane_nearest(x, out_hw):
    from arseg_tpu.ops.resize import _nearest_index

    h, w = x.shape[-2], x.shape[-1]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x
    y = jnp.take(x, jnp.asarray(_nearest_index(h, oh)), axis=-2)
    return jnp.take(y, jnp.asarray(_nearest_index(w, ow)), axis=-1)


def scale_and_resize_flow(flow, feat_hw, mode: str, split: bool = False):
    """Rescale MV magnitude to feature scale and resample to feature HW.

    flow: [N, Hf, Wf, 2], or a tuple of (fx, fy) [N, Hf, Wf] planes.
    Matches the reference's eval path (bilinear align_corners=True,
    `evaluation.py:177-180`) and train path (nearest, `train_pair.py:345-348`):
    magnitude is multiplied by feat_h / flow_h *before* spatial resampling.

    split=True returns (fx, fy) planes [N, H, W] (lane-friendly; feed
    directly to warp_feature); split=False returns the stacked [N,H,W,2].

    Prefer the tuple form: extracting planes from a [..., 2] array ON DEVICE
    is a ~64x-lane-waste relayout (~3.7 ms/frame at 720x960 on v5e) — split
    in numpy on the host instead (see data/loader.py).
    """
    if isinstance(flow, tuple):
        (fx, fy), fh = flow, flow[0].shape[-2]
        s = jnp.float32(feat_hw[0] / fh)
        fx = fx.astype(jnp.float32) * s
        fy = fy.astype(jnp.float32) * s
    else:
        fh = flow.shape[-3]
        s = jnp.float32(feat_hw[0] / fh)
        fx = flow[..., 0].astype(jnp.float32) * s
        fy = flow[..., 1].astype(jnp.float32) * s
    if mode == "bilinear":
        fx = _resize_plane_bilinear(fx, feat_hw, align_corners=True)
        fy = _resize_plane_bilinear(fy, feat_hw, align_corners=True)
    elif mode == "nearest":
        fx = _resize_plane_nearest(fx, feat_hw)
        fy = _resize_plane_nearest(fy, feat_hw)
    else:
        raise ValueError(f"unknown flow resize mode: {mode}")
    if split:
        return fx, fy
    return jnp.stack([fx, fy], axis=-1)
