"""Blocked-warp Pallas kernel parity vs the exact gather warp (ops/warp.py),
interpret mode on CPU. Covers: block-coherent flows (fast path), subpixel
weights, out-of-image zero padding, incoherent blocks (sparse correction),
and overflow beyond the correction budget (whole-frame exact fallback)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from arseg_tpu.ops.warp import warp_feature
from arseg_tpu.ops.pallas_warp import warp_feature_blocked, BR, BC

H, W, C = 32, 64, 64


def _block_flow(rng, n, h, w, lo=-6.0, hi=6.0, jitter=0.0):
    """Block-piecewise-constant flow (the HEVC motion-field shape): one MV
    per 4x8 block + optional subpixel jitter."""
    fb = rng.uniform(lo, hi, (2, n, h // BR, w // BC)).astype(np.float32)
    f = np.repeat(np.repeat(fb, BR, axis=2), BC, axis=3)
    if jitter:
        f = f + rng.uniform(-jitter, jitter, f.shape).astype(np.float32)
    return jnp.asarray(f[0]), jnp.asarray(f[1])


def _exact(feat, fx, fy):
    return np.asarray(jax.jit(warp_feature)(feat, (fx, fy)))


@pytest.mark.parametrize("jitter", [0.0, 0.45])
def test_blocked_matches_exact_coherent(jitter):
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32))
    fx, fy = _block_flow(rng, 2, H, W, jitter=jitter)
    ref = _exact(feat, fx, fy)
    out = np.asarray(warp_feature_blocked(feat, (fx, fy), interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_blocked_zero_padding_edges():
    """Flows pushing far out of the image must produce zeros (grid_sample
    zero-padding semantics)."""
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    fx, fy = _block_flow(rng, 1, H, W, lo=-40.0, hi=40.0)
    ref = _exact(feat, fx, fy)
    out = np.asarray(warp_feature_blocked(feat, (fx, fy), interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
    assert (np.abs(ref) < 1e-6).mean() > 0.1  # the case actually exercises OOB


def test_blocked_sparse_correction():
    """A few blocks straddling motion-partition boundaries (per-pixel flow
    discontinuities inside a block) overflow the window; the fixed-budget
    correction must restore exactness."""
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    fx, fy = _block_flow(rng, 1, H, W)
    # carve a diagonal discontinuity through some blocks
    fx = np.array(fx)
    fx[:, 10:20, 13:40] += np.where(
        (np.arange(27)[None, :] + np.arange(10)[:, None]) % 2 == 0, 12.0, -9.0
    ).astype(np.float32)
    fx = jnp.asarray(fx)
    ref = _exact(feat, fx, fy)
    out = np.asarray(warp_feature_blocked(feat, (fx, fy), interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_blocked_fallback_when_over_budget():
    """Fully random per-pixel flow: essentially every block overflows ->
    whole-frame exact fallback (lax.cond) must kick in."""
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-16, 16, (1, H, W)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-16, 16, (1, H, W)).astype(np.float32))
    ref = _exact(feat, fx, fy)
    out = np.asarray(
        warp_feature_blocked(feat, (fx, fy), interpret=True, correction_budget=64)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_blocked_bf16():
    rng = np.random.RandomState(4)
    feat = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    fx, fy = _block_flow(rng, 1, H, W, jitter=0.4)
    ref = np.asarray(jax.jit(warp_feature)(feat, (fx, fy))).astype(np.float32)
    out = np.asarray(
        warp_feature_blocked(feat, (fx, fy), interpret=True)
    ).astype(np.float32)
    # bf16 mask x window products round at ~1e-2 relative
    np.testing.assert_allclose(out, ref, atol=0.15, rtol=0.05)
