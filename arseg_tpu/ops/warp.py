"""Motion-vector feature warping (torch grid_sample parity), NHWC layout.

Replaces the reference's `warpFeature` (/root/reference `evaluation.py:61-87`),
which builds an absolute sampling grid from per-pixel motion vectors and calls
`F.grid_sample(feature, vgrid)` — bilinear, zero padding, and (in the
reference's torch>=1.3 environment) align_corners=False by default.

TPU-first design: the bilinear warp is a 4-corner masked gather over the
flattened spatial dim (one `take_along_axis` per corner), fully vectorized —
no scatter, no data-dependent shapes.
"""

import jax.numpy as jnp

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
    wx = ix - x0
    wy = iy - y0

    flat = feature.reshape(n, h * w, c)
    out = 0.0
    for dy, dx, wgt in (
        (0, 0, (1 - wy) * (1 - wx)),
        (0, 1, (1 - wy) * wx),
        (1, 0, wy * (1 - wx)),
        (1, 1, wy * wx),
    ):
        xc = x0 + dx
        yc = y0 + dy
        valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        idx = (yi * w + xi).reshape(n, -1, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1)
        vals = vals.reshape(feature.shape[0], *gx.shape[1:], c)
        out = out + vals * (wgt * valid.astype(jnp.float32))[..., None]
    return out.astype(feature.dtype)


def warp_feature(feature, flow, align_corners: bool = False):
    """Warp `feature` [N,H,W,C] by pixel-displacement `flow` [N,H,W,2] (x,y).

    Equivalent of the reference warpFeature (`evaluation.py:61-87`): absolute
    grid = base + flow, normalized to [-1,1] by (size-1), then grid_sample.
    """
    n, h, w, c = feature.shape
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    vx = xx + flow[..., 0].astype(jnp.float32)
    vy = yy + flow[..., 1].astype(jnp.float32)
    gx = 2.0 * vx / max(w - 1, 1) - 1.0
    gy = 2.0 * vy / max(h - 1, 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    return grid_sample(feature, grid, align_corners=align_corners)


def scale_and_resize_flow(flow, feat_hw, mode: str):
    """Rescale MV magnitude to feature scale and resample to feature HW.

    flow: [N, Hf, Wf, 2].  Matches the reference's eval path (bilinear
    align_corners=True, `evaluation.py:177-180`) and train path (nearest,
    `train_pair.py:345-348`): magnitude is multiplied by feat_h / flow_h
    *before* spatial resampling.
    """
    fh = flow.shape[-3]
    scaled = flow * (feat_hw[0] / fh)
    if mode == "bilinear":
        return resize_bilinear(scaled, feat_hw, align_corners=True)
    elif mode == "nearest":
        return resize_nearest(scaled, feat_hw)
    raise ValueError(f"unknown flow resize mode: {mode}")
