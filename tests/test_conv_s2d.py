"""Unit test for the space-to-depth 7x7/s2 stem rewrite in nn/functional.py
conv2d (the tap-scatter index math is easy to regress silently — model-parity
tests only exercise the shapes the zoo happens to hit)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arseg_tpu.nn import functional as Fn


def _direct_conv(p, x):
    out = jax.lax.conv_general_dilated(
        x,
        p["weight"].astype(x.dtype),
        window_strides=(2, 2),
        padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision="highest",
    )
    if p.get("bias") is not None:
        out = out + p["bias"].astype(x.dtype)
    return out


@pytest.mark.parametrize("hw", [(16, 16), (18, 20), (17, 16), (16, 15), (13, 11)])
@pytest.mark.parametrize("cin", [1, 3, 4])
def test_s2d_stem_matches_direct(hw, cin):
    h, w = hw
    rng = np.random.RandomState(h * 100 + w + cin)
    x = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
    p = {
        "weight": jnp.asarray(rng.randn(7, 7, cin, 8).astype(np.float32)),
        "bias": jnp.asarray(rng.randn(8).astype(np.float32)),
    }
    got = Fn.conv2d(p, x, stride=2, padding=3)  # s2d path on even H,W
    ref = _direct_conv(p, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_s2d_stem_no_bias():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 24, 32, 3).astype(np.float32))
    p = {"weight": jnp.asarray(rng.randn(7, 7, 3, 16).astype(np.float32))}
    got = Fn.conv2d(p, x, stride=2, padding=3)
    ref = _direct_conv({**p, "bias": None}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


# ---- fused resize -> s2d input (ops.resize.resize_bilinear_s2d) ----------


def _unshuffle(x):
    """Reference 2x2 pixel-unshuffle, channel order dy*2c + dx*c + cc."""
    n, h, w, c = x.shape
    z = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(z, (0, 1, 3, 2, 4, 5)).reshape(n, h // 2, w // 2, 4 * c)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape,out_hw", [
    ((2, 48, 64, 3), (24, 32)),
    ((1, 90, 120, 3), (44, 60)),
    ((3, 40, 40, 4), (20, 20)),
])
def test_resize_s2d_matches_composed(shape, out_hw, dtype):
    """resize_bilinear_s2d == unshuffle(resize_bilinear) element-for-element:
    identical interpolation-matrix rows per output (gop/pipeline._lr_input
    relies on this to swap forms freely). On CPU the matmul may reassociate
    the 2-term dot at the 1-2 ulp level (row-count-dependent blocking), so
    the assert is near-exact here; the TPU probe checks bit-identity."""
    from arseg_tpu.ops.resize import resize_bilinear_s2d
    from arseg_tpu.ops import resize_bilinear

    rng = np.random.RandomState(sum(shape))
    x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)
    fused = resize_bilinear_s2d(x, out_hw, align_corners=True)
    composed = _unshuffle(resize_bilinear(x, out_hw, align_corners=True))
    assert fused.dtype == composed.dtype
    atol = 5e-7 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(composed, np.float32),
        atol=atol, rtol=0,
    )


def test_resize_s2d_flag_paths_bit_identical():
    """The stacked-matrix single-einsum form (S2D_ONE_EINSUM) and the folded
    serving cast (out_dtype) must be bit-identical to the 4-einsum + concat
    loop form — same interpolation-matrix rows per output element, and the
    cast is elementwise either side of the merge reshape."""
    from arseg_tpu.ops import resize as rz

    rng = np.random.RandomState(11)
    x32 = jnp.asarray(rng.randn(2, 48, 64, 3).astype(np.float32))
    saved = rz.S2D_ONE_EINSUM
    outs = {}
    try:
        for one in (False, True):
            rz.S2D_ONE_EINSUM = one
            outs[(one, "f32")] = np.asarray(
                rz.resize_bilinear_s2d(x32, (24, 32), True)
            )
            outs[(one, "bf16")] = np.asarray(
                rz.resize_bilinear_s2d(
                    x32.astype(jnp.bfloat16), (24, 32), True
                ).astype(jnp.float32)
            )
            outs[(one, "fold")] = np.asarray(
                rz.resize_bilinear_s2d(
                    x32, (24, 32), True, out_dtype=jnp.bfloat16
                ).astype(jnp.float32)
            )
    finally:
        rz.S2D_ONE_EINSUM = saved
    np.testing.assert_array_equal(outs[(True, "f32")], outs[(False, "f32")])
    np.testing.assert_array_equal(outs[(True, "bf16")], outs[(False, "bf16")])
    # folded cast == cast-then-resize, both forms
    np.testing.assert_array_equal(outs[(False, "fold")], outs[(False, "bf16")])
    np.testing.assert_array_equal(outs[(True, "fold")], outs[(False, "bf16")])


def test_resize_s2d_rejects_bad_geometry():
    from arseg_tpu.ops.resize import resize_bilinear_s2d

    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    with pytest.raises(ValueError):
        resize_bilinear_s2d(x, (7, 8), align_corners=True)  # odd out H
    with pytest.raises(ValueError):
        resize_bilinear_s2d(x, (12, 8), align_corners=True)  # <2x H downsample


def test_s2d_packed_conv_matches_plain():
    """conv2d(S2DPacked(z)) == conv2d(x) for the stem, and a packed input
    reaching a non-stem conv raises."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 24, 32, 3).astype(np.float32))
    p = {
        "weight": jnp.asarray(rng.randn(7, 7, 3, 8).astype(np.float32)),
        "bias": jnp.asarray(rng.randn(8).astype(np.float32)),
    }
    plain = Fn.conv2d(p, x, stride=2, padding=3)
    packed = Fn.conv2d(p, Fn.S2DPacked(_unshuffle(x)), stride=2, padding=3)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(packed))

    wrong = {"weight": jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32))}
    with pytest.raises(TypeError):
        Fn.conv2d(wrong, Fn.S2DPacked(_unshuffle(x)), stride=1, padding=1)


def test_s2d_packed_shape_dtype_views():
    z = jnp.zeros((2, 12, 16, 12), jnp.bfloat16)
    packed = Fn.S2DPacked(z)
    assert packed.shape == (2, 24, 32, 3)
    assert packed.dtype == jnp.bfloat16
    assert packed.astype(jnp.float32).z.dtype == jnp.float32


# ---- fused resize -> s2d4 z4 input (ops.resize.resize_bilinear_s2d4) -----


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape,out_hw", [
    ((2, 48, 64, 3), (24, 32)),
    ((1, 96, 120, 3), (44, 60)),
    ((3, 40, 40, 4), (20, 20)),
])
def test_resize_s2d4_matches_composed(shape, out_hw, dtype):
    """resize_bilinear_s2d4 == unshuffle(unshuffle(resize_bilinear)):
    identical interpolation-matrix rows per output (gop/pipeline._lr_input
    relies on this to swap forms freely at the serving s2d4 stems). CPU
    matmuls may reassociate at the ulp level; the TPU probe (probes/r5)
    checks production agreement."""
    from arseg_tpu.ops.resize import resize_bilinear_s2d4
    from arseg_tpu.ops import resize_bilinear

    rng = np.random.RandomState(sum(shape))
    x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)
    fused = resize_bilinear_s2d4(x, out_hw, align_corners=True)
    composed = _unshuffle(_unshuffle(resize_bilinear(x, out_hw, align_corners=True)))
    assert fused.dtype == composed.dtype
    assert fused.shape == composed.shape
    atol = 5e-7 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(composed, np.float32),
        atol=atol, rtol=0,
    )


def test_resize_s2d4_out_dtype_and_geometry():
    from arseg_tpu.ops import resize as rz

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 48, 64, 3).astype(np.float32))
    a = rz.resize_bilinear_s2d4(x, (24, 32), True, out_dtype=jnp.bfloat16)
    b = rz.resize_bilinear_s2d4(x.astype(jnp.bfloat16), (24, 32), True)
    assert a.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))
    with pytest.raises(ValueError):
        rz.resize_bilinear_s2d4(x, (22, 32), True)  # out H % 4 != 0
    with pytest.raises(ValueError):
        rz.resize_bilinear_s2d4(x, (28, 32), True)  # <2x H downsample


def test_s2d4_packed_stem_matches_plain():
    """conv_stem_s2d4_blocks(S2D4Packed(z4)) == the raw-image block stem,
    and a z4 input reaching the s2d2 stem raises (flag-mismatch guard)."""
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, 24, 32, 3).astype(np.float32))
    p = {
        "weight": jnp.asarray(rng.randn(7, 7, 3, 8).astype(np.float32)),
        "bias": jnp.asarray(rng.randn(8).astype(np.float32)),
    }
    z4 = _unshuffle(_unshuffle(x))
    plain = Fn.conv_stem_s2d4_blocks(p, x)
    packed = Fn.conv_stem_s2d4_blocks(p, Fn.S2D4Packed(z4))
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(packed))

    with pytest.raises(TypeError):
        Fn.conv2d(p, Fn.S2D4Packed(z4), stride=2, padding=3)

    view = Fn.S2D4Packed(jnp.zeros((2, 6, 8, 48), jnp.bfloat16))
    assert view.shape == (2, 24, 32, 3)
    assert view.dtype == jnp.bfloat16
    assert view.astype(jnp.float32).z4.dtype == jnp.float32


def test_pipeline_lr_input_z4_matches_z12():
    """ARPipeline._lr_input's S2D4Packed fast path feeds the serving stems
    the same logical image as the S2DPacked path (end-to-end predictions
    must agree; exact on CPU up to matmul reassociation)."""
    from arseg_tpu.models import build_model
    from arseg_tpu.gop import ARPipeline
    from arseg_tpu.nn import functional as FnMod

    hr = build_model("camvid-bise18", fuse=False)
    lr = build_model("camvid-bise18", fuse=True)
    hrp = hr.init(jax.random.PRNGKey(0))
    lrp = lr.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    H, W, G = 96, 128, 4
    kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-4, 4, (G - 1, H, W)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-4, 4, (G - 1, H, W)).astype(np.float32))
    saved = FnMod.STEM_S2D4_BLOCKS
    try:
        FnMod.STEM_S2D4_BLOCKS = True
        pipe = ARPipeline(hr, lr, scale=0.5)
        x4 = pipe._lr_input(fr, (H // 2, W // 2))
        assert isinstance(x4, FnMod.S2D4Packed)
        on = np.asarray(pipe(hrp, lrp, kf, fr, (fx, fy)))
        FnMod.STEM_S2D4_BLOCKS = False
        pipe2 = ARPipeline(hr, lr, scale=0.5)
        x2 = pipe2._lr_input(fr, (H // 2, W // 2))
        assert not isinstance(x2, FnMod.S2D4Packed)
        off = np.asarray(pipe2(hrp, lrp, kf, fr, (fx, fy)))
    finally:
        FnMod.STEM_S2D4_BLOCKS = saved
    agree = (on == off).mean()
    assert agree > 0.99, agree
