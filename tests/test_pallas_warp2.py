"""Two-pass separable warp kernels (ops/pallas_warp2.py): parity vs the
exact gather warp, in Pallas interpret mode on CPU. Semantics target:
reference warpFeature (/root/reference evaluation.py:61-87)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from arseg_tpu.ops.warp import warp_feature  # noqa: E402
from arseg_tpu.ops.warp_plan import build_warp_plan  # noqa: E402
from arseg_tpu.ops.pallas_warp2 import (  # noqa: E402
    plan_to_device,
    ref_to_lanes_h,
    warp_feature_planned,
    _pad128,
)
from tests.test_warp_plan import _block_flow  # noqa: E402


def _run(feat, fx, fy, budget=None, dtype=np.float32):
    n, h, w, c = fx.shape[0], feat.shape[1], feat.shape[2], feat.shape[3]
    plan = build_warp_plan((fx, fy), (h, w), budget=budget or h * w)
    assert not plan.exact
    dev, meta = plan_to_device(plan)
    feat_j = jnp.asarray(feat.astype(dtype))
    got = warp_feature_planned(feat_j, dev, meta, out_dtype=jnp.float32,
                               interpret=True)
    fxr = jnp.broadcast_to(jnp.asarray(fx), (n, h, w))
    fyr = jnp.broadcast_to(jnp.asarray(fy), (n, h, w))
    ref = warp_feature(
        jnp.broadcast_to(jnp.asarray(feat.astype(np.float32)), (n, h, w, c)),
        (fxr, fyr),
    )
    return np.asarray(got), np.asarray(ref), plan, meta


def test_planned_kernels_scene_flow():
    rng = np.random.RandomState(0)
    n, h, w, c = 2, 40, 48, 16
    feat = rng.randn(1, h, w, c).astype(np.float32)
    fx, fy = _block_flow(rng, n, h, w, mag=9.0)
    got, ref, plan, meta = _run(feat, fx, fy)
    np.testing.assert_allclose(got, ref, rtol=0, atol=3e-5)


def test_planned_kernels_banded_reach():
    # small flow -> r1 = r2 = 1 (the fast banded variant must stay exact)
    rng = np.random.RandomState(1)
    n, h, w, c = 1, 32, 40, 8
    feat = rng.randn(1, h, w, c).astype(np.float32)
    fx, fy = _block_flow(rng, n, h, w, mag=3.0)
    got, ref, plan, meta = _run(feat, fx, fy)
    assert meta["r1"] == 1 and meta["r2"] == 1
    np.testing.assert_allclose(got, ref, rtol=0, atol=3e-5)


def test_planned_kernels_cross_tile_reach():
    # displacements beyond one lane tile exercise the banded select window
    rng = np.random.RandomState(2)
    n, h, w, c = 1, 48, 200, 8
    feat = rng.randn(1, h, w, c).astype(np.float32)
    fx = np.full((n, h, w), 140.25, np.float32)  # > 128: r2 >= 2
    fy = np.full((n, h, w), -20.5, np.float32)
    got, ref, plan, meta = _run(feat, fx, fy)
    assert meta["r2"] >= 2
    np.testing.assert_allclose(got, ref, rtol=0, atol=3e-5)


def test_planned_kernels_random_flow_corrections():
    # fully random flow: heavy scatter conflicts, corrections carry it
    rng = np.random.RandomState(3)
    n, h, w, c = 2, 24, 32, 8
    feat = rng.randn(1, h, w, c).astype(np.float32)
    fx = rng.uniform(-8, 8, (n, h, w)).astype(np.float32)
    fy = rng.uniform(-8, 8, (n, h, w)).astype(np.float32)
    got, ref, plan, meta = _run(feat, fx, fy)
    assert plan.corr_n.max() > 0
    np.testing.assert_allclose(got, ref, rtol=0, atol=3e-5)


def test_planned_kernels_bf16_input():
    # bf16 feature rides the exact f32 upcast; result compared to the
    # exact warp of the upcast feature
    rng = np.random.RandomState(4)
    n, h, w, c = 1, 32, 32, 8
    feat = rng.randn(1, h, w, c).astype(np.float32)
    feat_bf = np.asarray(jnp.asarray(feat).astype(jnp.bfloat16).astype(jnp.float32))
    fx, fy = _block_flow(rng, n, h, w, mag=5.0)
    plan = build_warp_plan((fx, fy), (h, w), budget=h * w)
    dev, meta = plan_to_device(plan)
    got = warp_feature_planned(
        jnp.asarray(feat).astype(jnp.bfloat16), dev, meta,
        out_dtype=jnp.float32, interpret=True,
    )
    ref = warp_feature(jnp.asarray(feat_bf), (jnp.asarray(fx), jnp.asarray(fy)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=3e-5)


def test_ref_to_lanes_roundtrip():
    rng = np.random.RandomState(5)
    h, w, c = 24, 40, 8
    featpad = rng.randn(h + 2, w + 2, c).astype(np.float32)
    hl, wl = _pad128(h + 2), _pad128(w + 2)
    featT = np.asarray(ref_to_lanes_h(jnp.asarray(featpad), hl, wl, True))
    assert featT.shape == (c, wl, hl)
    np.testing.assert_array_equal(
        featT[:, : w + 2, : h + 2], np.transpose(featpad, (2, 1, 0))
    )
    # padding regions are zero
    assert np.all(featT[:, w + 2 :, :] == 0) and np.all(featT[:, :, h + 2 :] == 0)
