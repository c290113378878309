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
