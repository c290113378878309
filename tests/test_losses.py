"""Loss parity vs torch (reference loss surface, train.py:210-216 etc.)."""

import numpy as np
import torch
import torch.nn as nn
import jax.numpy as jnp

from arseg_tpu.train import losses as L


def _rand_logits(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def _rand_labels(shape, n, seed=1, ignore_frac=0.1):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, n, shape).astype(np.int64)
    y[rng.rand(*shape) < ignore_frac] = 255
    return y


def test_nll_loss():
    logits = _rand_logits((2, 8, 9, 5))
    y = _rand_labels((2, 8, 9), 5)
    logp = torch.log_softmax(torch.from_numpy(logits).permute(0, 3, 1, 2), dim=1)
    ref = nn.NLLLoss(ignore_index=255)(logp, torch.from_numpy(y))
    got = L.nll_loss(
        jnp.asarray(np.ascontiguousarray(logp.permute(0, 2, 3, 1).numpy())),
        jnp.asarray(y.astype(np.int32)),
    )
    np.testing.assert_allclose(float(got), ref.item(), rtol=1e-5)


def test_cross_entropy():
    logits = _rand_logits((2, 8, 9, 5), seed=2)
    y = _rand_labels((2, 8, 9), 5, seed=3)
    ref = nn.CrossEntropyLoss(ignore_index=255)(
        torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(y)
    )
    got = L.cross_entropy(jnp.asarray(logits), jnp.asarray(y.astype(np.int32)))
    np.testing.assert_allclose(float(got), ref.item(), rtol=1e-5)


def test_bce_with_logits():
    logits = _rand_logits((4, 12), seed=4)
    tgt = (np.random.RandomState(5).rand(4, 12) > 0.5).astype(np.float32)
    ref = nn.BCEWithLogitsLoss()(torch.from_numpy(logits), torch.from_numpy(tgt))
    got = L.bce_with_logits(jnp.asarray(logits), jnp.asarray(tgt))
    np.testing.assert_allclose(float(got), ref.item(), rtol=1e-5)


def _torch_ohem(logits, labels, thresh=0.7, ignore=255):
    t = -torch.log(torch.tensor(thresh, dtype=torch.float))
    n_min = labels[labels != ignore].numel() // 16
    loss = nn.CrossEntropyLoss(ignore_index=ignore, reduction="none")(logits, labels).view(-1)
    loss_hard = loss[loss > t]
    if loss_hard.numel() < n_min:
        loss_hard, _ = loss.topk(n_min)
    return torch.mean(loss_hard)


def test_ohem_ce():
    logits = _rand_logits((2, 16, 20, 7), seed=6) * 3  # spread => many hard
    y = _rand_labels((2, 16, 20), 7, seed=7)
    ref = _torch_ohem(torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(y))
    got = L.ohem_ce(jnp.asarray(logits), jnp.asarray(y.astype(np.int32)))
    np.testing.assert_allclose(float(got), ref.item(), rtol=1e-4)


def test_ohem_ce_few_hard():
    # near-perfect logits so that hard examples < n_min -> topk branch
    n = 4
    y = _rand_labels((1, 16, 16), n, seed=8, ignore_frac=0.0)
    logits = np.full((1, 16, 16, n), -8.0, np.float32)
    for c in range(n):
        logits[0, ..., c][y[0] == c] = 8.0
    logits += _rand_logits((1, 16, 16, n), seed=9) * 0.1
    ref = _torch_ohem(torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(y))
    got = L.ohem_ce(jnp.asarray(logits), jnp.asarray(y.astype(np.int32)))
    np.testing.assert_allclose(float(got), ref.item(), rtol=1e-3, atol=1e-5)


def test_ohem_ce_degenerate_zero_kth():
    # fewer POSITIVE losses than n_min: most valid pixels have exactly-zero
    # CE (saturated logits), so the n_min-th largest loss is 0.0. torch's
    # topk(n_min).mean() divides by n_min; a naive `loss >= kth` mask would
    # also sweep every ignored pixel's 0.0 into the denominator.
    n = 4
    y = _rand_labels((1, 16, 16), n, seed=12, ignore_frac=0.3)
    logits = np.full((1, 16, 16, n), -50.0, np.float32)
    for c in range(n):
        logits[0, ..., c][y[0] == c] = 50.0  # exp underflow -> loss exactly 0
    # a couple of mildly-wrong pixels (positive loss, but << n_min of them)
    flat_valid = np.argwhere(y[0] != 255)
    for i, j in flat_valid[:3]:
        logits[0, i, j, :] = 0.5
    ref = _torch_ohem(torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(y))
    got = L.ohem_ce(jnp.asarray(logits), jnp.asarray(y.astype(np.int32)))
    np.testing.assert_allclose(float(got), ref.item(), rtol=1e-5, atol=1e-7)


def test_mse_and_kl():
    a = _rand_logits((2, 4, 4, 3), seed=10)
    b = _rand_logits((2, 4, 4, 3), seed=11)
    ref = nn.MSELoss()(torch.from_numpy(a), torch.from_numpy(b))
    np.testing.assert_allclose(float(L.mse(jnp.asarray(a), jnp.asarray(b))), ref.item(), rtol=1e-6)

    lp = torch.log_softmax(torch.from_numpy(a).reshape(2, -1), dim=1)
    lq = torch.log_softmax(torch.from_numpy(b).reshape(2, -1), dim=1)
    ref_kl = nn.KLDivLoss(log_target=True, reduction="mean")(lp, lq)
    got_kl = L.kl_div_log_target(jnp.asarray(lp.numpy()), jnp.asarray(lq.numpy()))
    np.testing.assert_allclose(float(got_kl), ref_kl.item(), rtol=1e-5)
