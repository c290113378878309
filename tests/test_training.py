"""Training-stack smoke tests on the synthetic GOP tree: both phases run,
losses are finite, checkpoints are written, the frozen final_conv stays
frozen, and the data-parallel step matches the single-device step."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from synthetic_data import make_camvid_tree, FLOW_SHAPE
from arseg_tpu.train.trainer import train_phase1, train_phase2
from arseg_tpu.utils.checkpoint import save_checkpoint
from arseg_tpu.models import build_model

CROP = (64, 48)  # (W, H) small for CPU
SCALES = (1.0,)


@pytest.fixture(scope="module")
def camvid_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("camvid")
    make_camvid_tree(str(root), gop=2, splits=("train", "val", "test"))
    return root


@pytest.mark.slow
def test_phase1_trains(camvid_tree, tmp_path):
    data_path = str(camvid_tree / "camvid-sequence" / "3M-GOP2" / "decoded_GOP2_dist_1")
    models_path = str(tmp_path / "exp1")
    params, history = train_phase1(
        data_path=data_path,
        models_path=models_path,
        backend="resnet18",
        batch_size=2,
        epochs=1,
        scale=0.5,
        dataset="camvid",
        model_type="pspnet",
        num_workers=2,
        verbose=False,
        cropsize=CROP,
        randomscale=SCALES,
    )
    assert len(history) == 1
    assert np.isfinite(history[0]["loss"])
    assert any(f.endswith(".npz") for f in os.listdir(models_path))


@pytest.mark.slow
def test_phase2_trains_both_stages(camvid_tree, tmp_path):
    seq_path = str(camvid_tree / "camvid-sequence")
    data_path = os.path.join(seq_path, "3M-GOP2", "decoded_GOP2_dist_1")

    teacher = build_model("camvid-psp18", fuse=False)
    teacher_params = teacher.init(jax.random.PRNGKey(0))
    tpath = str(tmp_path / "teacher.npz")
    save_checkpoint(tpath, teacher_params, {"scale": 1.0})

    models_path = str(tmp_path / "exp2")
    params, history = train_phase2(
        data_path=data_path,
        sequence_path=seq_path,
        models_path=models_path,
        backend="resnet18",
        batch_size=2,
        epochs=2,
        scale=0.5,
        feat_loss="mse",
        stage1_epoch=1,  # epoch 0 stage 1, epoch 1 stage 2
        ref_gap=2,
        bitrate=3,
        with_motion=True,
        model_type="pspnet",
        dataset="camvid",
        teacher_snapshot=tpath,
        num_workers=2,
        verbose=False,
        flow_shape=FLOW_SHAPE,
        cropsize=CROP,
        randomscale=SCALES,
    )
    assert [h["stage"] for h in history] == [1, 2]
    assert all(np.isfinite(h["loss"]) for h in history)

    # FST froze final_conv at the teacher's values
    np.testing.assert_array_equal(
        np.asarray(params["final_conv"]["weight"]),
        np.asarray(teacher_params["final_conv"]["weight"]),
    )


def test_trainable_mask_and_masked_optimizer():
    from arseg_tpu.train.step import trainable_mask, masked_optimizer
    from arseg_tpu.train.optim import make_optimizer, cosine_schedule
    import optax

    params = {
        "final_conv": {"weight": jnp.ones((1, 1, 4, 2)), "bias": jnp.zeros((2,))},
        "bn": {
            "weight": jnp.ones((4,)),
            "bias": jnp.zeros((4,)),
            "running_mean": jnp.zeros((4,)),
            "running_var": jnp.ones((4,)),
        },
        "conv": {"weight": jnp.ones((3, 3, 4, 4))},
    }
    mask = trainable_mask(params, frozen_prefixes=("final_conv",))
    assert mask["final_conv"]["weight"] is False
    assert mask["bn"]["running_mean"] is False
    assert mask["bn"]["weight"] is True
    assert mask["conv"]["weight"] is True

    opt = masked_optimizer(
        make_optimizer("sgd", cosine_schedule(0.1, 100)), params, ("final_conv",)
    )
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    params2 = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(
        np.asarray(params2["final_conv"]["weight"]), np.asarray(params["final_conv"]["weight"])
    )
    np.testing.assert_array_equal(
        np.asarray(params2["bn"]["running_var"]), np.asarray(params["bn"]["running_var"])
    )
    assert not np.allclose(np.asarray(params2["conv"]["weight"]), np.asarray(params["conv"]["weight"]))


def test_data_parallel_step_matches_single_device():
    """Same batch, 1 device vs 8-device sharding: identical updated params."""
    from arseg_tpu.train.objectives import build_phase1_loss
    from arseg_tpu.train.step import make_train_step, masked_optimizer
    from arseg_tpu.train.optim import make_optimizer, cosine_schedule
    from arseg_tpu.parallel import data_mesh, shard_batch, replicate

    model = build_model("camvid-psp18", fuse=False)
    params = model.init(jax.random.PRNGKey(0))
    loss_fn = build_phase1_loss(model, "pspnet", "camvid", (64, 48), 0.5)
    # SGD: the update is proportional to the gradient, so cross-sharding fp
    # reassociation noise stays tiny (Adam's first step normalizes to +-lr
    # and would amplify sign flips of near-zero grads).
    opt = masked_optimizer(make_optimizer("sgd", cosine_schedule(1e-2, 100)), params)
    step = make_train_step(loss_fn, opt)

    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randn(8, 48, 64, 3).astype(np.float32),
        "label": rng.randint(0, 12, (8, 48, 64)).astype(np.int32),
        "existence": np.ones((8, 12), np.float32),
    }
    rngkey = jax.random.PRNGKey(42)

    p1, _, m1 = step(params, opt.init(params), None, batch, rngkey)

    mesh = data_mesh(8)
    sharded = shard_batch(batch, mesh)
    p8, _, m8 = step(replicate(params, mesh), opt.init(params), None, sharded, rngkey)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    a = jax.tree_util.tree_leaves(p1)
    b = jax.tree_util.tree_leaves(p8)
    # Conv biases that feed straight into BatchNorm have mathematically-zero
    # gradients realized as catastrophic fp cancellations, so their noise
    # depends on the cross-shard reduction order; bound the worst-case param
    # drift at lr * that noise scale rather than exact equality.
    worst = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(a, b))
    assert worst < 5e-3, worst


def test_grad_accumulation_step():
    """accum_steps>1: gradient = global-batch mean via microbatch scan
    (single-chip path for reference-scale batches, train/step.py)."""
    import jax
    import jax.numpy as jnp
    from arseg_tpu.models import build_model
    from arseg_tpu.train.objectives import build_phase1_loss
    from arseg_tpu.train.optim import make_optimizer, cosine_schedule
    from arseg_tpu.train.step import make_train_step, masked_optimizer

    rng = np.random.RandomState(0)
    h, w, batch = 48, 64, 4
    model = build_model("camvid-psp18", fuse=False)
    params = model.init(jax.random.PRNGKey(0))
    loss_fn = build_phase1_loss(model, "pspnet", "camvid", (w, h), 1.0)
    opt = masked_optimizer(
        make_optimizer("adam", cosine_schedule(1e-3, 100)), params
    )
    step = make_train_step(loss_fn, opt, accum_steps=2)
    data = {
        "image": rng.randn(batch, h, w, 3).astype(np.float32),
        "label": rng.randint(0, 12, (batch, h, w)).astype(np.int32),
        "existence": np.ones((batch, 12), np.float32),
    }
    opt_state = opt.init(params)
    losses = []
    key = jax.random.PRNGKey(7)
    for _ in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, None, data, sub)
        losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses)) and losses[-1] < losses[0]

    with pytest.raises(ValueError):
        make_train_step(loss_fn, opt, bn_mode="master", accum_steps=2)


@pytest.mark.slow
def test_train_cli_smoke(camvid_tree, tmp_path, capsys):
    """CLI arg plumbing -> trainer: one tiny epoch through
    cli/train.py main() (catches signature drift between the CLI surface
    and the trainer functions), then a true --resume for one more epoch
    (reuses the in-process jit cache, so the second leg is cheap)."""
    from arseg_tpu.cli import train as cli_train

    common = [
        "--data-path", str(camvid_tree / "camvid-sequence" / "3M-GOP2" / "decoded_GOP2_dist_1"),
        "--models-path", str(tmp_path / "m"),
        "--backend", "resnet18",
        "--batch-size", "2",
        "--dataset", "camvid",
        "--model_type", "pspnet",
        "--accum_steps", "2",
        "--num_devices", "1",
        "--cropsize", "64", "48",
    ]
    cli_train.main(common + ["--epochs", "1"])
    saved = [f for f in os.listdir(str(tmp_path / "m")) if f.endswith(".npz")]
    assert saved

    # resume from the saved epoch-1 checkpoint and run epoch 2 only
    capsys.readouterr()
    cli_train.main(common + ["--epochs", "2",
                             "--resume", str(tmp_path / "m" / saved[0])])
    out = capsys.readouterr().out
    assert "resuming from" in out
    assert "[1] it" not in out, "resume must skip the already-trained epoch"
    assert "[2] it" in out, "resume must run the second epoch"


@pytest.mark.heavy
def test_train_pair_cli_smoke(camvid_tree, tmp_path):
    """CLI arg plumbing -> phase-2 trainer (one tiny stage-2 epoch)."""
    import jax as _jax
    from arseg_tpu.cli import train_pair as cli_tp
    from arseg_tpu.models import build_model as _bm
    from arseg_tpu.utils.checkpoint import save_checkpoint as _sc

    teacher = _bm("camvid-psp18", fuse=False)
    tpath = str(tmp_path / "teacher.npz")
    _sc(tpath, teacher.init(_jax.random.PRNGKey(0)), {"scale": 1.0})

    seq_path = str(camvid_tree / "camvid-sequence")
    cli_tp.main([
        "--data-path", os.path.join(seq_path, "3M-GOP2", "decoded_GOP2_dist_1"),
        "--sequence-path", seq_path,
        "--models-path", str(tmp_path / "exp"),
        "--backend", "resnet18",
        "--batch-size", "2",
        "--epochs", "1",
        "--crop_x", "64", "--crop_y", "48",
        "--scale", "0.5",
        "--feat_loss", "mse",
        "--stage1_epoch", "1",  # stage-1 epoch only: the CLI plumbing and
        # the WithFlow data path (incl. --flow_shape) are fully exercised
        # while avoiding the stage-2 merge compile (20+ min on CPU)
        "--ref_gap", "2",
        "--with_motion", "1",
        "--teacher_snapshot", tpath,
        "--num_devices", "1",
        "--accum_steps", "2",
        "--flow_shape", "48", "64",
    ])
    assert any(f.endswith(".npz") for f in os.listdir(tmp_path / "exp"))


@pytest.mark.heavy
def test_mixed_precision_training_step():
    """compute_dtype=bfloat16: bf16 forward/backward with f32 master params,
    optimizer state, BN running stats, and losses (train/step.py). Checks:
    params/opt/BN stay f32, loss tracks the f32 step, loss decreases over
    steps, and grads flow (params actually change). (heavy: two bise18
    phase-2 train-step compiles, ~4-7 min on CPU.)"""
    import jax.numpy as jnp

    from arseg_tpu.train.objectives import build_phase2_loss
    from arseg_tpu.train.step import make_train_step, masked_optimizer
    from arseg_tpu.train.optim import make_optimizer, cosine_schedule

    model = build_model("camvid-bise18", fuse=True)
    teacher = build_model("camvid-bise18", fuse=False)
    params = model.init(jax.random.PRNGKey(0))
    tparams = teacher.init(jax.random.PRNGKey(1))
    loss_fn = build_phase2_loss(model, teacher, "bisenet", "camvid", (64, 64),
                                0.5, feat_loss="mse", stage2=True)
    opt = masked_optimizer(make_optimizer("sgd", cosine_schedule(1e-2, 100)), params)
    step32 = make_train_step(loss_fn, opt)
    step16 = make_train_step(loss_fn, opt, compute_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randn(2, 64, 64, 3).astype(np.float32),
        "label": rng.randint(0, 12, (2, 64, 64)).astype(np.int32),
        "ref_image": rng.randn(2, 64, 64, 3).astype(np.float32),
        "flow": rng.uniform(-2, 2, (2, 64, 64, 2)).astype(np.float32),
    }
    key = jax.random.PRNGKey(7)

    _, _, m32 = step32(params, opt.init(params), tparams, batch, key)
    p, s = params, opt.init(params)
    losses = []
    for i in range(3):
        p, s, m = step16(p, s, tparams, batch, jax.random.PRNGKey(7 + i))
        losses.append(float(m["loss"]))

    # all master state stays f32 (incl. BN running stats)
    assert all(l.dtype == np.float32 for l in jax.tree_util.tree_leaves(p)
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating))
    # bf16 loss tracks the f32 loss on the same batch
    assert abs(losses[0] - float(m32["loss"])) / float(m32["loss"]) < 0.05
    # training makes progress
    assert losses[-1] < losses[0]
    changed = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(params))
    )
    assert changed > 0
