"""Parity of resampling ops vs torch.nn.functional (the reference's substrate)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from arseg_tpu.ops import (
    resize_bilinear,
    resize_nearest,
    adaptive_avg_pool,
    adaptive_max_pool_11,
    pixel_shuffle,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)


def _nhwc(t_nchw):
    return t_nchw.permute(0, 2, 3, 1).numpy()


SHAPES = [
    ((2, 23, 31, 5), (46, 62)),
    ((1, 90, 120, 8), (45, 60)),
    ((1, 45, 60, 8), (90, 120)),
    ((1, 17, 13, 3), (30, 40)),
    ((1, 30, 40, 3), (17, 13)),
    ((1, 8, 8, 4), (8, 8)),
]


@pytest.mark.parametrize("shape,out_hw", SHAPES)
@pytest.mark.parametrize("align_corners", [True, False])
def test_bilinear(shape, out_hw, align_corners):
    rng = np.random.RandomState(0)
    x = rng.randn(*shape).astype(np.float32)
    ref = F.interpolate(
        _nchw(x), out_hw, mode="bilinear", align_corners=align_corners
    )
    got = resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,out_hw", SHAPES)
def test_nearest(shape, out_hw):
    rng = np.random.RandomState(1)
    x = rng.randn(*shape).astype(np.float32)
    ref = F.interpolate(_nchw(x), out_hw, mode="nearest")
    got = resize_nearest(jnp.asarray(x), out_hw)
    np.testing.assert_array_equal(np.asarray(got), _nhwc(ref))


@pytest.mark.parametrize("out_hw", [(1, 1), (2, 2), (3, 3), (6, 6), (3, 5)])
def test_adaptive_avg_pool(out_hw):
    rng = np.random.RandomState(2)
    x = rng.randn(2, 23, 31, 4).astype(np.float32)
    ref = F.adaptive_avg_pool2d(_nchw(x), out_hw)
    got = adaptive_avg_pool(jnp.asarray(x), out_hw)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-5, atol=1e-6)


def test_adaptive_max_pool_11():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 9, 11, 7).astype(np.float32)
    ref = F.adaptive_max_pool2d(_nchw(x), (1, 1)).flatten(1)
    got = adaptive_max_pool_11(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-6)


@pytest.mark.parametrize("r", [2, 3])
def test_pixel_shuffle(r):
    rng = np.random.RandomState(4)
    x = rng.randn(2, 5, 7, 4 * r * r).astype(np.float32)
    ref = F.pixel_shuffle(_nchw(x), r)
    got = pixel_shuffle(jnp.asarray(x), r)
    np.testing.assert_array_equal(np.asarray(got), _nhwc(ref))
