"""Training losses, torch-parity, NHWC.

The reference loss surface (`train.py:210-216`, `train_pair.py:291-302`):
  * PSPNet-CamVid: NLLLoss(ignore 255) on log-softmax outputs + alpha *
    BCEWithLogits on the class-presence head,
  * PSPNet-Cityscapes: CrossEntropy(ignore 255) main + 0.4 * aux,
  * BiSeNet: OhemCELoss(0.7) x3 heads,
  * FST: MSELoss between teacher and student features.

OHEM note (`model/bisenet.py:600-614`): keep per-pixel CE losses above
-log(0.7); if fewer than n_min = n_valid/16 qualify, take the top n_min.
The reference's dynamic topk is re-expressed fixed-shape for XLA: the sum of
the n_min largest losses equals sum(loss > kth) + kth * (#tied slots), where
kth is the n_min-th largest value — exact torch topk(n_min).mean() parity
including ties and the all-easy (kth == 0) degenerate case.
"""

import jax
import jax.numpy as jnp


def _f32(x):
    """Loss math always runs in f32: under mixed-precision training the
    model emits bf16 logits/features, and bf16 log-softmax + means over 1e5+
    pixels lose mantissa. Identity for f32 inputs."""
    return x.astype(jnp.float32)


def nll_loss(log_probs, labels, ignore_label=255):
    """log_probs [N,H,W,C] (log-softmax), labels [N,H,W] int."""
    log_probs = _f32(log_probs)
    keep = labels != ignore_label
    safe = jnp.where(keep, labels, 0)
    picked = jnp.take_along_axis(log_probs, safe[..., None], axis=-1)[..., 0]
    losses = -picked * keep
    return jnp.sum(losses) / jnp.maximum(jnp.sum(keep), 1)


def cross_entropy(logits, labels, ignore_label=255):
    logp = jax.nn.log_softmax(_f32(logits), axis=-1)
    return nll_loss(logp, labels, ignore_label)


def bce_with_logits(logits, targets):
    """BCEWithLogitsLoss, mean reduction. logits/targets [N, C]."""
    logits, targets = _f32(logits), _f32(targets)
    m = jnp.clip(logits, 0, None)
    losses = m - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(losses)


def _per_pixel_ce(logits, labels, ignore_label):
    keep = labels != ignore_label
    safe = jnp.where(keep, labels, 0)
    logp = jax.nn.log_softmax(_f32(logits), axis=-1)
    picked = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return (-picked) * keep, keep


def ohem_ce(logits, labels, thresh=0.7, ignore_label=255):
    """OhemCELoss: mean of hard-example CE losses (see module docstring)."""
    losses, keep = _per_pixel_ce(logits, labels, ignore_label)
    flat = losses.reshape(-1)
    n_min = jnp.sum(keep) // 16
    t = -jnp.log(jnp.float32(thresh))

    sorted_desc = -jnp.sort(-flat)
    kth = sorted_desc[jnp.clip(n_min - 1, 0, flat.shape[0] - 1)]

    def enough_hard(_):
        mask = flat > t
        return jnp.sum(flat * mask) / jnp.maximum(jnp.sum(mask), 1)

    def top_nmin(_):
        # exact fixed-shape torch topk(n_min).mean(): the sum of the n_min
        # largest entries is sum(flat > kth) plus kth for each tied slot.
        # (A bare `flat >= kth` mask diverged when kth == 0 — fewer positive
        # losses than n_min — by sweeping every ignored pixel's 0.0 loss
        # into the mean's denominator.)
        n = jnp.maximum(n_min, 1)
        above = flat > kth
        total = jnp.sum(flat * above) + kth * (n - jnp.sum(above))
        return total / n

    n_hard = jnp.sum(flat > t)
    return jax.lax.cond(n_hard >= n_min, enough_hard, top_nmin, None)


def mse(a, b):
    return jnp.mean((_f32(a) - _f32(b)) ** 2)


def kl_div_log_target(log_p, log_q):
    """KLDivLoss(log_target=True, reduction='mean') parity:
    mean over all elements of exp(target) * (target - input)."""
    log_p, log_q = _f32(log_p), _f32(log_q)
    return jnp.mean(jnp.exp(log_q) * (log_q - log_p))
