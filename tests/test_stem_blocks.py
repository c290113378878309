"""Unit + model-level parity for the s2d4 block-form stem serving path
(functional.py STEM_S2D4_BLOCKS): the 3x3x16C block stem kernel, the parity
maxpool, and the block-consuming 3x3/s2 conv must match their logical-layout
counterparts; the bise18 model must produce the same logits/argmax with the
flag flipped (the index math is exact — only contraction order differs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arseg_tpu.nn import functional as Fn


def _direct_stem(p, x):
    return jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), window_strides=(2, 2),
        padding=[(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision="highest")


@pytest.mark.parametrize("hw", [(16, 16), (24, 32), (20, 28)])
@pytest.mark.parametrize("cin", [1, 3])
def test_stem_blocks_matches_direct(hw, cin):
    h, w = hw
    rng = np.random.RandomState(h + w + cin)
    x = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
    p = {"weight": jnp.asarray(rng.randn(7, 7, cin, 8).astype(np.float32)),
         "bias": jnp.asarray(rng.randn(8).astype(np.float32))}
    got = Fn.d2s_blocks(Fn.conv_stem_s2d4_blocks(p, x))
    ref = _direct_stem(p, x) + p["bias"]
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_stem_blocks_accepts_packed():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 24, 32, 3).astype(np.float32))
    p = {"weight": jnp.asarray(rng.randn(7, 7, 3, 8).astype(np.float32))}
    raw = Fn.conv_stem_s2d4_blocks(p, x)
    packed = Fn.conv_stem_s2d4_blocks(p, Fn.S2DPacked(Fn._unshuffle2(x)))
    np.testing.assert_array_equal(np.asarray(raw), np.asarray(packed))


def test_parity_maxpool_matches_reduce_window():
    rng = np.random.RandomState(5)
    b = jnp.asarray(rng.randn(2, 12, 16, 4 * 6).astype(np.float32))
    got = Fn.max_pool_3x3_s2_p1_blocks(b)
    ref = Fn.max_pool_3x3_s2_p1(Fn.d2s_blocks(b))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_conv3x3s2_from_blocks_matches_direct():
    rng = np.random.RandomState(7)
    b = jnp.asarray(rng.randn(2, 12, 16, 4 * 6).astype(np.float32))
    p = {"weight": jnp.asarray(rng.randn(3, 3, 6, 10).astype(np.float32)),
         "bias": jnp.asarray(rng.randn(10).astype(np.float32))}
    got = Fn.conv3x3s2_from_blocks(p, b)
    ref = Fn.conv2d(p, Fn.d2s_blocks(b), stride=2, padding=1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_bise18_model_parity_flag_flip():
    from arseg_tpu.models import build_model

    model = build_model("camvid-bise18", fuse=False)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    saved = Fn.STEM_S2D4_BLOCKS
    try:
        Fn.STEM_S2D4_BLOCKS = False
        ref = model.apply(params, x)[0]
        Fn.STEM_S2D4_BLOCKS = True
        got = model.apply(params, x)[0]
    finally:
        Fn.STEM_S2D4_BLOCKS = saved
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)
    assert (np.asarray(got).argmax(-1) == np.asarray(ref).argmax(-1)).mean() > 0.999


def test_pool_d2s_batch_flag_bitwise_identical():
    """S2D4_POOL_D2S_BATCH only reroutes the batch>1 serving stem between
    the parity-max chain and d2s+reduce_window — the same max set either
    way, so the model output must be BITWISE equal across the flip
    (decided ON by probe r4n: bench_logs/r4queue_r4n.log)."""
    from arseg_tpu.models import build_model

    model = build_model("camvid-bise18", fuse=False)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(3, 64, 96, 3).astype(np.float32))
    saved = (Fn.STEM_S2D4_BLOCKS, Fn.S2D4_POOL_D2S_BATCH)
    try:
        Fn.STEM_S2D4_BLOCKS = True
        Fn.S2D4_POOL_D2S_BATCH = False
        ref = model.apply(params, x)[0]
        Fn.S2D4_POOL_D2S_BATCH = True
        got = model.apply(params, x)[0]
    finally:
        Fn.STEM_S2D4_BLOCKS, Fn.S2D4_POOL_D2S_BATCH = saved
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pool_half_d2s_bitwise_identical():
    """The half-d2s pool (row parity unblocked on a 128-aligned lane split,
    W parity resolved post-pool) computes the same max set — bitwise equal
    to both the full-d2s and the parity-chain forms, at the functional and
    the model level."""
    rng = np.random.RandomState(5)
    b = jnp.asarray(rng.randn(3, 8, 12, 4 * 16).astype(np.float32))
    ref = Fn.max_pool_3x3_s2_p1(Fn.d2s_blocks(b))
    half = Fn.max_pool_3x3_s2_p1_blocks_half(b)
    np.testing.assert_array_equal(np.asarray(half), np.asarray(ref))

    from arseg_tpu.models import build_model

    model = build_model("camvid-bise18", fuse=False)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(3, 64, 96, 3).astype(np.float32))
    saved = (Fn.STEM_S2D4_BLOCKS, Fn.S2D4_POOL_HALF_D2S_BATCH)
    try:
        Fn.STEM_S2D4_BLOCKS = True
        Fn.S2D4_POOL_HALF_D2S_BATCH = False
        want = model.apply(params, x)[0]
        Fn.S2D4_POOL_HALF_D2S_BATCH = True
        got = model.apply(params, x)[0]
    finally:
        Fn.STEM_S2D4_BLOCKS, Fn.S2D4_POOL_HALF_D2S_BATCH = saved
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_train_ctx_keeps_s2d2_path():
    ctx = Fn.Ctx(train=True, rng=jax.random.PRNGKey(0))
    saved = Fn.STEM_S2D4_BLOCKS
    try:
        Fn.STEM_S2D4_BLOCKS = True
        assert not Fn.stem_s2d4_enabled(ctx)
        assert Fn.stem_s2d4_enabled(Fn.Ctx(train=False))
        assert Fn.stem_s2d4_enabled(None)
    finally:
        Fn.STEM_S2D4_BLOCKS = saved
