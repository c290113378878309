"""True training resume: optimizer-state round-trip through the checkpoint
format, cursor restoration, and the guard rails (resume vs snapshot,
optimizer-less checkpoints, leaf-count mismatch). The end-to-end CLI resume
lives in test_training.py::test_train_cli_smoke (reuses its compile)."""

import numpy as np
import optax
import pytest

from arseg_tpu.train.trainer import _apply_resume, train_phase1
from arseg_tpu.utils.checkpoint import save_checkpoint, load_checkpoint


def _tiny_state(steps=3):
    """A params tree + adam state advanced `steps` real update steps."""
    params = {"w": np.ones((4, 4), np.float32), "b": np.zeros((4,), np.float32)}
    opt = optax.adam(1e-3)
    state = opt.init(params)
    for _ in range(steps):
        grads = {k: np.full_like(v, 0.1) for k, v in params.items()}
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return params, opt, state


def test_opt_state_roundtrip(tmp_path):
    params, opt, state = _tiny_state()
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, metadata={"epoch": 7, "miou": 0.42}, opt_state=state)

    template = opt.init(params)
    out = load_checkpoint(path, opt_state_template=template)
    # the schedule/step counter must survive — that is the point of resume
    assert int(out["opt_state"][0].count) == 3
    import jax

    saved = jax.tree_util.tree_leaves(state)
    loaded = jax.tree_util.tree_leaves(out["opt_state"])
    assert len(saved) == len(loaded)
    for a, b in zip(saved, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_apply_resume_restores_cursors(tmp_path):
    params, opt, state = _tiny_state()
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, metadata={"epoch": 7, "miou": 0.42}, opt_state=state)
    p2, s2, start_epoch, max_miou = _apply_resume(path, opt.init(params), verbose=False)
    assert start_epoch == 7 and max_miou == pytest.approx(0.42)
    np.testing.assert_array_equal(np.asarray(p2["w"]), params["w"])
    assert int(s2[0].count) == 3


def test_apply_resume_rejects_weights_only_checkpoint(tmp_path):
    params, opt, state = _tiny_state()
    path = str(tmp_path / "weights_only.npz")
    save_checkpoint(path, params, metadata={"epoch": 2})  # no opt_state
    with pytest.raises(ValueError, match="no optimizer state"):
        _apply_resume(path, opt.init(params), verbose=False)


def test_leaf_count_mismatch_is_loud(tmp_path):
    params, opt, state = _tiny_state()
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, opt_state=state)
    sgd_template = optax.sgd(1e-2, momentum=0.9).init(params)
    with pytest.raises(ValueError, match="optimizer-state leaves"):
        load_checkpoint(path, opt_state_template=sgd_template)


def test_resume_and_snapshot_mutually_exclusive(tmp_path):
    with pytest.raises(ValueError, match="mutually exclusive"):
        train_phase1(
            data_path=str(tmp_path),
            models_path=str(tmp_path / "m"),
            snapshot="a.npz",
            resume="b.npz",
        )
