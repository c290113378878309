"""Parity of grid_sample / warp_feature vs torch (reference evaluation.py:61-87)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from arseg_tpu.ops import grid_sample, warp_feature, scale_and_resize_flow


def _nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)


def _nhwc(t):
    return t.permute(0, 2, 3, 1).numpy()


def _torch_warp_feature(feature_nchw, flow_nhwc):
    """Independent re-statement of the reference warpFeature math using torch."""
    b, c, h, w = feature_nchw.shape
    flow = torch.from_numpy(flow_nhwc).permute(0, 3, 1, 2).float()
    xx = torch.arange(w).view(1, -1).repeat(h, 1).view(1, 1, h, w).repeat(b, 1, 1, 1)
    yy = torch.arange(h).view(-1, 1).repeat(1, w).view(1, 1, h, w).repeat(b, 1, 1, 1)
    vgrid = torch.cat((xx, yy), 1).float() + flow
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(w - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(h - 1, 1) - 1.0
    return F.grid_sample(
        feature_nchw, vgrid.permute(0, 2, 3, 1), align_corners=False
    )


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample(align_corners):
    rng = np.random.RandomState(0)
    feat = rng.randn(2, 12, 17, 5).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(2, 9, 11, 2)).astype(np.float32)
    ref = F.grid_sample(
        _nchw(feat),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    )
    got = grid_sample(jnp.asarray(feat), jnp.asarray(grid), align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-5, atol=1e-5)


def test_warp_feature_matches_reference_math():
    rng = np.random.RandomState(1)
    feat = rng.randn(1, 20, 30, 6).astype(np.float32)
    flow = rng.uniform(-4, 4, size=(1, 20, 30, 2)).astype(np.float32)
    ref = _torch_warp_feature(_nchw(feat), flow)
    got = warp_feature(jnp.asarray(feat), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-5, atol=1e-5)


def test_flow_resize_eval_mode():
    """Eval path: magnitude scale then bilinear align_corners=True resize
    (reference evaluation.py:177-180, NCHW transposed dance)."""
    rng = np.random.RandomState(2)
    flow = rng.uniform(-10, 10, size=(1, 24, 32, 2)).astype(np.float32)
    feat_hw = (12, 16)
    t = torch.from_numpy(flow).permute(0, 3, 1, 2)
    t = t * feat_hw[0] / t.shape[-2]
    t = F.interpolate(t, feat_hw, mode="bilinear", align_corners=True)
    ref = t.permute(0, 2, 3, 1).numpy()
    got = scale_and_resize_flow(jnp.asarray(flow), feat_hw, mode="bilinear")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_flow_resize_train_mode():
    """Train path: nearest resize (reference train_pair.py:345-348)."""
    rng = np.random.RandomState(3)
    flow = rng.uniform(-10, 10, size=(1, 24, 32, 2)).astype(np.float32)
    feat_hw = (12, 16)
    t = torch.from_numpy(flow).permute(0, 3, 1, 2)
    t = t * feat_hw[0] / t.shape[-2]
    t = F.interpolate(t, feat_hw, mode="nearest")
    ref = t.permute(0, 2, 3, 1).numpy()
    got = scale_and_resize_flow(jnp.asarray(flow), feat_hw, mode="nearest")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def _blocky_flow(rng, n, h, w, block=8, lo=-6, hi=6):
    """Piecewise-constant flow over block x block cells (HEVC-MV-like)."""
    f = rng.uniform(lo, hi, size=(n, h // block, w // block, 2)).astype(np.float32)
    return np.repeat(np.repeat(f, block, axis=1), block, axis=2)


@pytest.mark.parametrize("method", ["blocked", "auto"])
def test_warp_blocked_matches_exact_on_coherent_flow(method):
    rng = np.random.RandomState(7)
    feat = rng.randn(2, 24, 32, 5).astype(np.float32)
    flow = _blocky_flow(rng, 2, 24, 32, block=8)
    ref = _torch_warp_feature(_nchw(feat), flow)
    got = warp_feature(jnp.asarray(feat), jnp.asarray(flow), method=method)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-5, atol=1e-5)


def test_warp_auto_falls_back_on_incoherent_flow():
    """Random per-pixel flow breaks block coherence -> cond takes the exact
    branch; result must still match torch."""
    rng = np.random.RandomState(8)
    feat = rng.randn(1, 16, 24, 4).astype(np.float32)
    flow = rng.uniform(-5, 5, size=(1, 16, 24, 2)).astype(np.float32)
    ref = _torch_warp_feature(_nchw(feat), flow)
    got = warp_feature(jnp.asarray(feat), jnp.asarray(flow), method="auto")
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-5, atol=1e-5)


def test_warp_auto_non_multiple_of_block_sizes():
    """Grid HW not divisible by the block edge -> static exact fallback."""
    rng = np.random.RandomState(9)
    feat = rng.randn(1, 13, 19, 3).astype(np.float32)
    flow = rng.uniform(-3, 3, size=(1, 13, 19, 2)).astype(np.float32)
    ref = _torch_warp_feature(_nchw(feat), flow)
    got = warp_feature(jnp.asarray(feat), jnp.asarray(flow), method="auto")
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-5, atol=1e-5)


def test_warp_blocked_edge_flows():
    """Flows pushing samples far out of bounds + exactly-on-edge samples:
    zero-padding semantics must match torch in the blocked path."""
    rng = np.random.RandomState(10)
    feat = rng.randn(1, 16, 16, 4).astype(np.float32)
    flow = np.zeros((1, 16, 16, 2), np.float32)
    flow[:, :8] = 30.0    # far out of bounds (whole block)
    flow[:, 8:] = -0.5    # half-pixel edge straddle
    ref = _torch_warp_feature(_nchw(feat), flow)
    got = warp_feature(jnp.asarray(feat), jnp.asarray(flow), method="blocked")
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-5, atol=1e-5)


def test_warp_plane_flow_tuple_matches_array():
    rng = np.random.RandomState(11)
    feat = rng.randn(1, 16, 16, 4).astype(np.float32)
    flow = _blocky_flow(rng, 1, 16, 16, block=4)
    a = warp_feature(jnp.asarray(feat), jnp.asarray(flow))
    b = warp_feature(
        jnp.asarray(feat),
        (jnp.asarray(flow[..., 0].copy()), jnp.asarray(flow[..., 1].copy())),
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_warp_feature_prepadded_bitwise_identical():
    """pad_for_warp + prepadded=True must be bitwise-identical to the
    pad-inside path (the GOP pipeline hoists the keyframe pad out of its
    per-frame lax.map)."""
    from arseg_tpu.ops.warp import pad_for_warp

    rng = np.random.RandomState(7)
    feat = rng.randn(2, 18, 26, 8).astype(np.float32)
    fx = rng.uniform(-30, 30, size=(2, 18, 26)).astype(np.float32)
    fy = rng.uniform(-30, 30, size=(2, 18, 26)).astype(np.float32)
    base = warp_feature(jnp.asarray(feat), (jnp.asarray(fx), jnp.asarray(fy)))
    pre = warp_feature(
        pad_for_warp(jnp.asarray(feat)),
        (jnp.asarray(fx), jnp.asarray(fy)),
        prepadded=True,
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(pre))


def test_flow_plane_merged_take_bitwise_identical():
    """FLOW_MERGED_TAKE resamples the flow planes' H axis via a merged-row
    gather of the [N*H, W] view — same (i0, i1, w) table, same lerp
    expression, so it must be bitwise-equal to the plain take path at any
    resize ratio (upsample, downsample, non-divisible)."""
    import arseg_tpu.ops.warp as W

    rng = np.random.RandomState(11)
    for shape, out_hw in [((3, 48, 64), (12, 16)), ((2, 10, 16), (23, 31)),
                          ((1, 720, 96), (90, 12))]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 40)
        try:
            W.FLOW_MERGED_TAKE = False
            base = np.asarray(W._resize_plane_bilinear(x, out_hw, True))
            W.FLOW_MERGED_TAKE = True
            merged = np.asarray(W._resize_plane_bilinear(x, out_hw, True))
        finally:
            W.FLOW_MERGED_TAKE = False
        np.testing.assert_array_equal(base, merged)
