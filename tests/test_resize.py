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
    # small C + >=2x H downsample: exercises the H_DOWNSAMPLE_MATMUL branch
    # (C<=4 and oh*2<=h) — the frame-0.5x production path (ADVICE r3 #1)
    ((2, 64, 48, 3), (32, 24)),
]


def test_bilinear_flag_paths_bit_identical():
    """The three H-pass strategies (merged-row gather, plain gather,
    H-downsample matmul) must be bit-identical in f32 on the production
    frame-downsize shape class (small C, >=2x H downsample)."""
    from arseg_tpu.ops import resize as rz

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 64, 48, 3).astype(np.float32))
    saved = (rz.MERGED_ROW_GATHER, rz.H_DOWNSAMPLE_MATMUL)
    outs = {}
    try:
        for mrg in (False, True):
            for hdm in (False, True):
                rz.MERGED_ROW_GATHER, rz.H_DOWNSAMPLE_MATMUL = mrg, hdm
                outs[(mrg, hdm)] = np.asarray(
                    resize_bilinear(x, (32, 24), align_corners=True)
                )
    finally:
        rz.MERGED_ROW_GATHER, rz.H_DOWNSAMPLE_MATMUL = saved
    base = outs[(False, False)]
    for key, got in outs.items():
        np.testing.assert_array_equal(got, base, err_msg=f"flags={key}")


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


def test_resize_bilinear_padded_matches_resize_plus_pad():
    """resize_bilinear_padded == resize_bilinear + jnp.pad (f32 exact: both
    forms compute (1-w)*x0 + w*x1 per axis; zero matrix entries contribute
    exact 0.0), and the pad ring is exact zero."""
    from arseg_tpu.ops.resize import resize_bilinear, resize_bilinear_padded

    rng = np.random.RandomState(21)
    for (h, w, oh, ow), pads in [
        ((45, 60, 90, 120), ((1, 3), (1, 7))),
        ((12, 17, 30, 40), ((4, 6), (4, 4))),
        ((9, 9, 9, 18), ((0, 2), (1, 0))),  # H identity axis
    ]:
        x = jnp.asarray(rng.randn(2, h, w, 5).astype(np.float32))
        want = jnp.pad(
            resize_bilinear(x, (oh, ow), align_corners=True),
            ((0, 0), pads[0], pads[1], (0, 0)),
        )
        got = resize_bilinear_padded(x, (oh, ow), True, pads)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
        (pt, pb), (pl, pr) = pads
        ring = np.asarray(got)
        assert (ring[:, :pt] == 0).all() and (pb == 0 or (ring[:, -pb:] == 0).all())
        assert (ring[:, :, :pl] == 0).all() and (pr == 0 or (ring[:, :, -pr:] == 0).all())


def test_resize_bilinear_padded_bf16_close():
    """bf16: MXU-accumulated interiors may differ from the lerp H-pass by
    1 ulp; pad ring stays exact zero."""
    from arseg_tpu.ops.resize import resize_bilinear, resize_bilinear_padded

    rng = np.random.RandomState(22)
    x = jnp.asarray(rng.randn(1, 45, 60, 8).astype(np.float32)).astype(jnp.bfloat16)
    want = resize_bilinear(x, (90, 120), align_corners=True)
    got = resize_bilinear_padded(x, (90, 120), True, ((1, 1), (1, 7)))
    inner = got[:, 1:91, 1:121]
    np.testing.assert_allclose(
        np.asarray(inner, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )
    assert (np.asarray(got[:, 0], np.float32) == 0).all()
    assert (np.asarray(got[:, :, -7:], np.float32) == 0).all()
