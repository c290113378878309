"""Jitted train-step builder with data-parallel sharding.

TPU-native data parallelism (replaces nn.DataParallel, `train.py:41,167`):
params are replicated and the batch is sharded over the 1-D 'data' mesh axis
via NamedSharding; under jit, XLA inserts the gradient all-reduce (psum over
ICI) automatically because the loss is a mean over the global batch. This
also gives cross-replica (sync) BatchNorm statistics — a deliberate upgrade
over DataParallel's master-replica-only BN update, documented here.

Non-trainable leaves (BN running stats) and frozen subtrees (the FST-frozen
final_conv, `train_pair.py:259-263`) are excluded from the optimizer with
optax.masked.
"""

import jax
import optax

from arseg_tpu.nn import functional as Fn


def trainable_mask(params, frozen_prefixes=()):
    """Pytree of bools: False for BN running stats and frozen subtrees."""

    def walk(node, path):
        if not isinstance(node, dict):
            leaf = path.split(".")[-1]
            if leaf in ("running_mean", "running_var"):
                return False
            return not any(
                path == p or path.startswith(p + ".") for p in frozen_prefixes
            )
        return {k: walk(v, f"{path}.{k}" if path else k) for k, v in node.items()}

    return walk(params, "")


def masked_optimizer(base, params, frozen_prefixes=()):
    """optax.masked applies `base` to trainable leaves only — but passes the
    RAW gradient through as the update for masked-out leaves, so the frozen
    complement must be explicitly zeroed first."""
    mask = trainable_mask(params, frozen_prefixes)
    inverse = jax.tree_util.tree_map(lambda b: not b, mask)
    return optax.chain(
        optax.masked(optax.set_to_zero(), inverse),
        optax.masked(base, mask),
    )


def make_train_step(loss_fn, optimizer):
    """Returns step(params, opt_state, teacher_params, batch, rng) ->
    (params, opt_state, metrics)."""

    @jax.jit
    def step(params, opt_state, teacher_params, batch, rng):
        def wrapped(p):
            ctx = Fn.Ctx(train=True, rng=rng)
            loss, metrics = loss_fn(p, teacher_params, batch, ctx)
            return loss, (metrics, ctx.bn_updates)

        (_, (metrics, bn_updates)), grads = jax.value_and_grad(wrapped, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = Fn.apply_bn_updates(params, bn_updates)
        return params, opt_state, metrics

    return step
