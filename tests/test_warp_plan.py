"""Host-side separable warp plan: exactness vs the exact gather warp.

The plan rewrites the 2-D bilinear warp (reference warpFeature,
/root/reference evaluation.py:61-87) into two 1-D passes + a sparse exact
correction. These tests run the two passes in pure numpy (the device kernels
implement the same contraction; see tests/test_pallas_warp2.py for the
Pallas parity) and compare against ops/warp.py `warp_feature`.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from arseg_tpu.ops.warp import warp_feature  # noqa: E402
from arseg_tpu.ops.warp_plan import build_warp_plan  # noqa: E402


def _apply_plan_numpy(feature, plan):
    """Reference executor for the two-pass plan (numpy, f32)."""
    n, h, w, c = feature.shape
    fp = np.pad(feature, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(np.float32)
    wp2, hl = plan.j.shape[1:]
    out = np.zeros((n, h, w, c), np.float32)
    for b in range(n):
        # pass 1: P1[xw, oy, c] = v0 * fp[j, xw] + v1 * fp[j+1, xw]
        j = plan.j[b][: w + 2, :h]            # [w+2, h]
        v0 = plan.v0[b][: w + 2, :h]
        v1 = plan.v1[b][: w + 2, :h]
        cols = fp[b]                           # [h+2, w+2, c]
        # gather rows j (per (xw, oy)) from column xw
        xw_idx = np.arange(w + 2)[:, None]
        p1 = (
            v0[..., None] * cols[j, xw_idx]
            + v1[..., None] * cols[np.minimum(j + 1, h + 1), xw_idx]
        )                                      # [w+2, h, c]
        # pass 2: out[oy, ox] = wx0 * P1[xi, oy] + wx1 * P1[xi+1, oy]
        xi = plan.xi[b][:h, :w]
        wx0 = plan.wx0[b][:h, :w]
        wx1 = plan.wx1[b][:h, :w]
        oy_idx = np.arange(h)[:, None]
        out[b] = (
            wx0[..., None] * p1[xi, oy_idx]
            + wx1[..., None] * p1[np.minimum(xi + 1, w + 1), oy_idx]
        )
        # sparse exact correction
        m = plan.corr_n[b]
        if m:
            pos = plan.corr_pos[b, :m]
            yx = plan.corr_yx[b, :m]
            wts = plan.corr_w[b, :m]
            blk = np.stack(
                [
                    fp[b][yx[:, 0], yx[:, 1]],
                    fp[b][yx[:, 0], np.minimum(yx[:, 1] + 1, w + 1)],
                    fp[b][np.minimum(yx[:, 0] + 1, h + 1), yx[:, 1]],
                    fp[b][np.minimum(yx[:, 0] + 1, h + 1), np.minimum(yx[:, 1] + 1, w + 1)],
                ],
                axis=1,
            )                                   # [m, 4, c]
            vals = (wts[:, :, None] * blk).sum(axis=1)
            out[b].reshape(-1, c)[pos] = vals
    return out


def _block_flow(rng, n, h, w, mag=12.0, frac=True, objects=3):
    """Scene-like motion field: constant background pan + a few rigidly
    moving rectangles (what merged codec MV fields look like; conflicts
    arise only at object silhouettes). Values snapped to quarter-pel like
    the reference's int16/4 MV maps."""
    fx = np.empty((n, h, w), np.float32)
    fy = np.empty((n, h, w), np.float32)
    for b in range(n):
        fx[b] = rng.uniform(-mag, mag)
        fy[b] = rng.uniform(-mag, mag)
        for _ in range(objects):
            y0, x0 = rng.randint(0, h // 2), rng.randint(0, w // 2)
            yh, xw = rng.randint(4, h // 2), rng.randint(4, w // 2)
            fx[b, y0 : y0 + yh, x0 : x0 + xw] = rng.uniform(-mag, mag)
            fy[b, y0 : y0 + yh, x0 : x0 + xw] = rng.uniform(-mag, mag)
    if frac:
        fx, fy = np.round(fx * 4) / 4, np.round(fy * 4) / 4
    else:
        fx, fy = np.round(fx), np.round(fy)
    return fx.astype(np.float32), fy.astype(np.float32)


@pytest.mark.parametrize("frac", [True, False])
def test_plan_matches_exact_blockflow(frac):
    rng = np.random.RandomState(0)
    n, h, w, c = 2, 48, 64, 8
    feat = rng.randn(n, h, w, c).astype(np.float32)
    fx, fy = _block_flow(rng, n, h, w, mag=12.0, frac=frac)

    plan = build_warp_plan((fx, fy), (h, w))
    assert not plan.exact
    # scene-like flow -> corrections only at object silhouettes
    assert plan.corr_n.max() < h * w // 8

    got = _apply_plan_numpy(feat, plan)
    ref = np.asarray(warp_feature(jnp.asarray(feat), (jnp.asarray(fx), jnp.asarray(fy))))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


def test_plan_random_flow_mostly_corrected_still_exact():
    # fully random flow: scatter conflicts everywhere; with a generous
    # budget the answer must still be exact (corrections do the work)
    rng = np.random.RandomState(1)
    n, h, w, c = 1, 24, 32, 4
    feat = rng.randn(n, h, w, c).astype(np.float32)
    fx = rng.uniform(-10, 10, (n, h, w)).astype(np.float32)
    fy = rng.uniform(-10, 10, (n, h, w)).astype(np.float32)
    plan = build_warp_plan((fx, fy), (h, w), budget=h * w)
    assert not plan.exact
    got = _apply_plan_numpy(feat, plan)
    ref = np.asarray(warp_feature(jnp.asarray(feat), (jnp.asarray(fx), jnp.asarray(fy))))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


def test_plan_out_of_image_zero_padding():
    rng = np.random.RandomState(2)
    n, h, w, c = 1, 16, 16, 4
    feat = rng.randn(n, h, w, c).astype(np.float32)
    # push everything far out of the image: output must be all zeros
    fx = np.full((n, h, w), 50.0, np.float32)
    fy = np.full((n, h, w), -50.0, np.float32)
    plan = build_warp_plan((fx, fy), (h, w), budget=h * w)
    got = _apply_plan_numpy(feat, plan)
    np.testing.assert_array_equal(got, 0.0)


def test_plan_budget_overflow_flags_exact():
    rng = np.random.RandomState(3)
    n, h, w = 1, 24, 32
    fx = rng.uniform(-10, 10, (n, h, w)).astype(np.float32)
    fy = rng.uniform(-10, 10, (n, h, w)).astype(np.float32)
    plan = build_warp_plan((fx, fy), (h, w), budget=4)
    assert plan.exact


def test_plan_identity_flow_no_corrections():
    # NOTE: zero flow is not an identity warp under the reference's
    # align_corners=False grid normalization (a half-pixel scale offset),
    # so compare against warp_feature, not the raw feature.
    n, h, w = 1, 32, 32
    fx = np.zeros((n, h, w), np.float32)
    fy = np.zeros((n, h, w), np.float32)
    plan = build_warp_plan((fx, fy), (h, w))
    assert plan.corr_n.max() == 0
    rng = np.random.RandomState(4)
    feat = rng.randn(n, h, w, 4).astype(np.float32)
    got = _apply_plan_numpy(feat, plan)
    ref = np.asarray(warp_feature(jnp.asarray(feat), (jnp.asarray(fx), jnp.asarray(fy))))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_plan_to_device_rejects_overflowed_plan():
    from arseg_tpu.ops.pallas_warp2 import plan_to_device

    rng = np.random.RandomState(3)
    n, h, w = 1, 24, 32
    fx = rng.uniform(-10, 10, (n, h, w)).astype(np.float32)
    fy = rng.uniform(-10, 10, (n, h, w)).astype(np.float32)
    plan = build_warp_plan((fx, fy), (h, w), budget=4)
    assert plan.exact
    with pytest.raises(ValueError, match="correction budget"):
        plan_to_device(plan)


def test_resize_flow_planes_np_matches_device_op():
    """The host mirror (warp_plan.resize_flow_planes_np) and the device op
    (ops/warp.scale_and_resize_flow, eval semantics) must agree bit-for-bit;
    nothing else cross-checks the two copies. The train-path 'nearest' mode
    is intentionally unsupported on the host side."""
    from arseg_tpu.ops.warp import scale_and_resize_flow
    from arseg_tpu.ops.warp_plan import resize_flow_planes_np

    rng = np.random.RandomState(7)
    for fhw, ohw in [((24, 32), (6, 8)), ((90, 120), (90, 120)), ((17, 23), (9, 16))]:
        fx = rng.uniform(-40, 40, (2,) + fhw).astype(np.float32)
        fy = rng.uniform(-40, 40, (2,) + fhw).astype(np.float32)
        hx, hy = resize_flow_planes_np(fx, fy, ohw)
        dx, dy = scale_and_resize_flow(
            (jnp.asarray(fx), jnp.asarray(fy)), ohw, mode="bilinear", split=True
        )
        np.testing.assert_array_equal(hx, np.asarray(dx))
        np.testing.assert_array_equal(hy, np.asarray(dy))

    with pytest.raises(ValueError, match="mode"):
        resize_flow_planes_np(fx, fy, (6, 8), mode="nearest")
