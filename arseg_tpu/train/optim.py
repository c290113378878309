"""Optimizers and LR schedules (optax), torch-parity.

Reference policy (`train.py:190-203`, `train_pair.py:259-279`): Adam for
CamVid / SGD(momentum .9, wd 5e-4) for Cityscapes, CosineAnnealingLR stepped
per ITERATION with T_max = epochs * (len(ds)//bs + 1); when finetuning from a
snapshot, 500-step linear warmup from 1e-5 (GradualWarmupScheduler,
`model/warmup_scheduler.py`) handing off to the cosine schedule.
"""

import math

import jax.numpy as jnp
import optax


def cosine_schedule(base_lr: float, t_max: int):
    """torch CosineAnnealingLR (eta_min=0) closed form."""

    def schedule(step):
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * step / t_max))

    return schedule


def warmup_cosine_schedule(base_lr: float, warmup_start_lr: float, warmup_steps: int, t_max: int):
    """GradualWarmupScheduler(multiplier=base/start, total=warmup_steps,
    after=CosineAnnealingLR(T_max=t_max)) parity: linear ramp
    warmup_start->base over warmup_steps, then cosine restarted at step 0."""
    mult = base_lr / warmup_start_lr

    def schedule(step):
        warm = warmup_start_lr * ((mult - 1.0) * step / warmup_steps + 1.0)
        # after warmup the reference's after_scheduler steps from its own 0
        cos_step = jnp.maximum(step - (warmup_steps + 1), 0)
        cold = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * cos_step / t_max))
        return jnp.where(step <= warmup_steps, warm, cold)

    return schedule


def make_optimizer(kind: str, schedule, momentum=0.9, weight_decay=5e-4):
    """kind: 'adam' (CamVid) or 'sgd' (Cityscapes)."""
    if kind == "adam":
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_schedule(lambda s: -schedule(s)),
        )
    if kind == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum, nesterov=False),
            optax.scale_by_schedule(lambda s: -schedule(s)),
        )
    raise ValueError(kind)


def t_max_for(epochs: int, n_samples: int, batch_size: int):
    return epochs * (n_samples // batch_size + 1)
