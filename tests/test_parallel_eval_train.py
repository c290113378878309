"""Multi-device (8 virtual CPU devices) eval + training coverage:

* sharded eval engines (shard_map + psum'd confusion histogram — the live
  equivalent of the reference's dormant dist.all_reduce,
  `evaluation.py:134-135`) match the single-device engines exactly,
  including ragged ignore-padded tails;
* multi-step sharded training decreases the loss;
* bn_mode="master" (DataParallel-faithful replica-0 running stats,
  `train/step.py`) matches its single-replica oracle;
* _graft_final_conv is copy-on-write.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from arseg_tpu.models import build_model
from arseg_tpu.eval.engine import EvalConstRes, EvalAlterRes
from arseg_tpu.parallel import data_mesh
from arseg_tpu.train.objectives import build_phase1_loss
from arseg_tpu.train.step import make_train_step, masked_optimizer
from arseg_tpu.train.optim import make_optimizer, cosine_schedule

H, W = 48, 64
N_CLASSES = 12


@pytest.fixture(scope="module")
def psp():
    model = build_model("camvid-psp18", fuse=False)
    return model, model.init(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def psp_fuse():
    model = build_model("camvid-psp18", fuse=True)
    return model, model.init(jax.random.PRNGKey(1))


def _frames(rng, n):
    return {
        "image": rng.randn(n, H, W, 3).astype(np.float32),
        "label": rng.randint(0, N_CLASSES, (n, H, W)).astype(np.int32),
    }


def test_sharded_eval_const_matches_unsharded(psp):
    model, params = psp
    rng = np.random.RandomState(0)
    data = _frames(rng, 10)  # ragged vs 8 devices -> exercises ignore padding

    single = [
        {k: v[i : i + 1] for k, v in data.items()} for i in range(10)
    ]
    miou1 = EvalConstRes(scale=0.5)(model, params, single, N_CLASSES)

    mesh = data_mesh(8)
    sharded_batches = [
        {k: v[:8] for k, v in data.items()},
        {k: v[8:] for k, v in data.items()},  # ragged tail of 2 -> padded
    ]
    miou8 = EvalConstRes(scale=0.5, mesh=mesh)(model, params, sharded_batches, N_CLASSES)
    np.testing.assert_allclose(miou1, miou8, rtol=1e-5)


def test_unsharded_batched_eval_keeps_tail_samples(psp):
    """batch_size>1 on ONE device: the ragged tail must be ignore-padded to
    the compiled shape and measured, not dropped (the engines equalize every
    batch to the first batch's row count — one compile, every sample counted)."""
    model, params = psp
    rng = np.random.RandomState(1)
    data = _frames(rng, 10)

    single = [{k: v[i : i + 1] for k, v in data.items()} for i in range(10)]
    miou1 = EvalConstRes(scale=0.5)(model, params, single, N_CLASSES)

    batched = [
        {k: v[:4] for k, v in data.items()},
        {k: v[4:8] for k, v in data.items()},
        {k: v[8:] for k, v in data.items()},  # ragged tail of 2
    ]
    miou4 = EvalConstRes(scale=0.5)(model, params, batched, N_CLASSES)
    np.testing.assert_allclose(miou1, miou4, rtol=1e-5)

    # dropping the tail must actually change the answer on this data —
    # otherwise the equality above proves nothing
    miou_dropped = EvalConstRes(scale=0.5)(model, params, batched[:2], N_CLASSES)
    assert abs(miou_dropped - miou1) > 1e-7


def test_sharded_eval_alter_matches_unsharded(psp, psp_fuse):
    hr_model, hr_params = psp
    model, params = psp_fuse
    rng = np.random.RandomState(1)
    n = 6
    data = _frames(rng, n)
    data["ref_image"] = rng.randn(n, H, W, 3).astype(np.float32)
    data["flow"] = rng.uniform(-3, 3, (n, H, W, 2)).astype(np.float32)

    single = [{k: v[i : i + 1] for k, v in data.items()} for i in range(n)]
    miou1 = EvalAlterRes(scale=0.5)(hr_model, hr_params, model, params, single, N_CLASSES)

    mesh = data_mesh(8)
    miou8 = EvalAlterRes(scale=0.5, mesh=mesh)(
        hr_model, hr_params, model, params, [data], N_CLASSES  # 6 -> padded to 8
    )
    np.testing.assert_allclose(miou1, miou8, rtol=1e-5)


def _train_fixture(bn_mode, mesh, steps, batch):
    model = build_model("camvid-psp18", fuse=False)
    params = model.init(jax.random.PRNGKey(0))
    loss_fn = build_phase1_loss(model, "pspnet", "camvid", (W, H), 0.5)
    opt = masked_optimizer(make_optimizer("sgd", cosine_schedule(1e-2, 100)), params)
    step = make_train_step(loss_fn, opt, mesh=mesh, bn_mode=bn_mode)
    opt_state = opt.init(params)
    rngkey = jax.random.PRNGKey(42)
    losses = []
    for _ in range(steps):
        params, opt_state, metrics = step(params, opt_state, None, batch, rngkey)
        losses.append(float(metrics["loss"]))
    return params, losses


def test_multi_step_sharded_training_loss_decreases():
    rng = np.random.RandomState(2)
    batch = {
        "image": rng.randn(8, H, W, 3).astype(np.float32),
        "label": rng.randint(0, N_CLASSES, (8, H, W)).astype(np.int32),
        "existence": np.ones((8, N_CLASSES), np.float32),
    }
    mesh = data_mesh(8)
    from arseg_tpu.parallel import shard_batch, replicate

    sharded = shard_batch(batch, mesh)
    model = build_model("camvid-psp18", fuse=False)
    params = replicate(model.init(jax.random.PRNGKey(0)), mesh)
    loss_fn = build_phase1_loss(model, "pspnet", "camvid", (W, H), 0.5)
    opt = masked_optimizer(make_optimizer("sgd", cosine_schedule(1e-2, 100)), params)
    step = make_train_step(loss_fn, opt)
    opt_state = opt.init(params)
    rngkey = jax.random.PRNGKey(42)
    losses = []
    for _ in range(5):
        params, opt_state, metrics = step(params, opt_state, None, sharded, rngkey)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def _bn_running_leaves(params, out=None, path=""):
    if out is None:
        out = {}
    for k, v in params.items():
        p = f"{path}.{k}" if path else k
        if isinstance(v, dict):
            _bn_running_leaves(v, out, p)
        elif k in ("running_mean", "running_var"):
            out[p] = np.asarray(v)
    return out


def test_master_bn_mode_keeps_replica0_stats():
    """bn_mode='master' running stats == a single-device step run on ONLY
    replica 0's sub-batch (running-stat updates are independent of the
    gradients, so only the BN leaves are compared), on a batch where the
    shards differ. DataParallel semantics incl. the local-batch unbiased
    variance correction."""
    rng = np.random.RandomState(3)
    varied = {
        "image": rng.randn(8, H, W, 3).astype(np.float32) * np.linspace(
            0.2, 3.0, 8
        ).reshape(8, 1, 1, 1).astype(np.float32),
        "label": rng.randint(0, N_CLASSES, (8, H, W)).astype(np.int32),
        "existence": np.ones((8, N_CLASSES), np.float32),
    }
    shard0 = {k: v[:1] for k, v in varied.items()}

    mesh = data_mesh(8)
    p_master, _ = _train_fixture("master", mesh, 1, varied)
    p_sync_varied, _ = _train_fixture("sync", None, 1, varied)
    p_shard0, _ = _train_fixture("sync", None, 1, shard0)

    bn_master = _bn_running_leaves(p_master)
    bn_shard0 = _bn_running_leaves(p_shard0)
    bn_varied = _bn_running_leaves(p_sync_varied)
    assert bn_master.keys() == bn_shard0.keys() and len(bn_master) > 0

    # master == replica-0 oracle
    for k in bn_master:
        np.testing.assert_allclose(bn_master[k], bn_shard0[k], rtol=1e-4, atol=1e-5)
    # and it genuinely differs from the sync (global-batch) stats
    diffs = [np.abs(bn_master[k] - bn_varied[k]).max() for k in bn_master]
    assert max(diffs) > 1e-3, max(diffs)


def test_graft_final_conv_copy_on_write():
    from arseg_tpu.train.trainer import _graft_final_conv

    student = {
        "backbone": {"w": jnp.zeros((2,))},
        "head": {"final_conv": {"weight": jnp.zeros((3,)), "bias": jnp.zeros((1,))}},
    }
    teacher = {
        "head": {"final_conv": {"weight": jnp.ones((3,)), "bias": jnp.ones((1,))}}
    }
    before = student["head"]["final_conv"]["weight"]
    out = _graft_final_conv(student, teacher, "head.final_conv")
    # grafted result carries the teacher weights
    np.testing.assert_array_equal(np.asarray(out["head"]["final_conv"]["weight"]), 1.0)
    # the caller's tree is untouched (no in-place mutation)
    np.testing.assert_array_equal(np.asarray(student["head"]["final_conv"]["weight"]), 0.0)
    assert student["head"]["final_conv"]["weight"] is before
    # untouched subtrees are shared, touched path is rebuilt
    assert out["backbone"] is student["backbone"]
    assert out["head"] is not student["head"]
