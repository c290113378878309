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
from jax import lax

from arseg_tpu.ops.resize import resize_bilinear, resize_nearest


def grid_sample(feature, grid, align_corners: bool = False):
    """Bilinear zero-padding grid sample.

    feature: [N, H, W, C]; grid: [N, Hg, Wg, 2] with (x, y) in [-1, 1].
    Matches torch.nn.functional.grid_sample(mode='bilinear',
    padding_mode='zeros', align_corners=align_corners).
    """
    n, h, w, c = feature.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        ix = (gx + 1.0) * (w - 1) / 2.0
        iy = (gy + 1.0) * (h - 1) / 2.0
    else:
        ix = ((gx + 1.0) * w - 1.0) / 2.0
        iy = ((gy + 1.0) * h - 1.0) / 2.0

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0)[..., None]
    wy = (iy - y0)[..., None]

    # one [2, 2, C] block per output pixel from the zero-padded source
    fp = jnp.pad(feature, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
    yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)
    idx = jnp.stack([yi, xi], axis=-1).reshape(n, -1, 2)

    def g1(fp1, idx1):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
        )
        return lax.gather(
            fp1, idx1, dn, slice_sizes=(2, 2, c), mode=lax.GatherScatterMode.CLIP
        )

    hg, wg = gx.shape[1:]
    blk = jax.vmap(g1)(fp, idx).reshape(n, hg, wg, 2, 2, c)

    def wgt(dy, dx):
        # per-corner validity (zero-padding semantics even where the index
        # clamp landed a far-out-of-bounds window on real texels)
        xc = x0 + dx
        yc = y0 + dy
        valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        wxx = wx if dx else 1 - wx
        wyy = wy if dy else 1 - wy
        return wxx * wyy * valid[..., None]

    out = (
        blk[:, :, :, 0, 0] * wgt(0, 0)
        + blk[:, :, :, 0, 1] * wgt(0, 1)
        + blk[:, :, :, 1, 0] * wgt(1, 0)
        + blk[:, :, :, 1, 1] * wgt(1, 1)
    )
    return out.astype(feature.dtype)


def warp_feature(feature, flow, align_corners: bool = False):
    """Warp `feature` [N,H,W,C] by pixel displacements.

    flow: [N,H,W,2] (x, y) array, or a tuple (fx, fy) of [N,H,W] planes —
    the plane form keeps W on the TPU lane axis; a 2-channel NHWC array
    wastes 126/128 lanes of every vector op that touches it.

    Equivalent of the reference warpFeature (`evaluation.py:61-87`): absolute
    grid = base + flow, normalized to [-1,1] by (size-1), then grid_sample.
    """
    n, h, w, c = feature.shape
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
    grid = jnp.stack([gx, gy], axis=-1)
    return grid_sample(feature, grid, align_corners=align_corners)


def _resize_plane_bilinear(x, out_hw, align_corners):
    """Bilinear resize of [..., H, W] planes (W on the lane axis)."""
    from arseg_tpu.ops.resize import _lerp_axis

    h, w = x.shape[-2], x.shape[-1]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x
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

    flow: [N, Hf, Wf, 2].  Matches the reference's eval path (bilinear
    align_corners=True, `evaluation.py:177-180`) and train path (nearest,
    `train_pair.py:345-348`): magnitude is multiplied by feat_h / flow_h
    *before* spatial resampling.

    split=True returns (fx, fy) planes [N, H, W] (lane-friendly; feed
    directly to warp_feature); split=False returns the stacked [N,H,W,2].
    """
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
