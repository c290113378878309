"""Jitted train-step builder with data-parallel sharding.

TPU-native data parallelism (replaces nn.DataParallel, `train.py:41,167`):
params are replicated and the batch is sharded over the 1-D 'data' mesh axis
via NamedSharding; under jit, XLA inserts the gradient all-reduce (psum over
ICI) automatically because the loss is a mean over the global batch.

BatchNorm statistics mode (`bn_mode`):
  * "sync" (default): batch stats over the GLOBAL batch — a deliberate
    upgrade over DataParallel's per-replica stats (better stats, same
    expectation).
  * "master": faithful nn.DataParallel semantics — per-replica batch stats
    for normalization, and the running-stat momentum update keeps ONLY
    replica 0's statistics (DataParallel re-broadcasts the master replica's
    buffers every step). Use to A/B the sync-BN deviation against reference
    training runs. Requires a mesh (shard_map over the 'data' axis).

Non-trainable leaves (BN running stats) and frozen subtrees (the FST-frozen
final_conv, `train_pair.py:259-263`) are excluded from the optimizer with
optax.masked.
"""

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

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


def make_train_step(loss_fn, optimizer, mesh=None, bn_mode="sync",
                    accum_steps=1, compute_dtype=None):
    """Returns step(params, opt_state, teacher_params, batch, rng) ->
    (params, opt_state, metrics). See module docstring for bn_mode.

    compute_dtype=jnp.bfloat16 enables mixed-precision training, the TPU
    deployment mode the reference (f32-on-GPU) has no analog for: the
    forward/backward runs with bf16 params, activations, and image inputs
    (MXU 4x rate), while everything that needs range/accumulation stays
    f32 — master params, gradients (the cast's VJP upcasts them), optimizer
    state, BN batch statistics (nn/functional.py batch_norm accumulates
    stats in f32), and the loss math itself (train/losses.py upcasts at
    entry). Flow fields keep f32 (index math). None = pure-f32 parity mode.

    accum_steps > 1 splits the batch into that many microbatches and
    accumulates gradients over a lax.scan before the optimizer update —
    the single-chip answer to reference-scale batches (batch 16 at 720x960,
    `train.py:66`) whose full-batch backward exceeds the chip. Gradient =
    mean over the global batch exactly (equal microbatches, mean losses);
    BatchNorm batch statistics become per-MICRObatch (averaged into the
    running stats) — the same statistics class as DataParallel's
    per-replica stats, documented like bn_mode."""
    if bn_mode not in ("sync", "master"):
        raise ValueError(f"bn_mode must be 'sync' or 'master', got {bn_mode!r}")
    if bn_mode == "master" and mesh is None:
        raise ValueError("bn_mode='master' needs a mesh (per-replica stats)")
    multi_device = mesh is not None and mesh.devices.size > 1
    if accum_steps > 1 and (multi_device or bn_mode != "sync"):
        raise ValueError("accum_steps>1 is the single-device path "
                         "(shard over the mesh instead)")

    def _cast_params(tree):
        from arseg_tpu.utils.tree import cast_f32

        return cast_f32(tree, compute_dtype)

    def _cast_batch(b):
        # images/features to compute dtype; labels stay int, flow stays f32
        return {
            k: v.astype(compute_dtype) if k in ("image", "ref_image") else v
            for k, v in b.items()
        }

    def _grads(params, teacher_params, batch, rng):
        def wrapped(p):
            ctx = Fn.Ctx(train=True, rng=rng)
            if compute_dtype is not None:
                p = _cast_params(p)
                tp = _cast_params(teacher_params)
                b = _cast_batch(batch)
            else:
                tp, b = teacher_params, batch
            loss, metrics = loss_fn(p, tp, b, ctx)
            return loss, (metrics, ctx.bn_updates)

        (_, aux), grads = jax.value_and_grad(wrapped, has_aux=True)(params)
        return grads, aux

    if bn_mode == "master":

        def local(params, teacher_params, batch, rng):
            grads, (metrics, bn_updates) = _grads(params, teacher_params, batch, rng)
            # per-replica loss is a local-batch mean; pmean == global mean
            grads = jax.lax.pmean(grads, "data")
            metrics = jax.lax.pmean(metrics, "data")
            # keep ONLY replica 0's batch stats (DataParallel master-replica
            # buffer semantics): zero elsewhere, then one psum
            keep = (jax.lax.axis_index("data") == 0).astype(jnp.float32)
            bn_updates = jax.tree_util.tree_map(
                lambda u: jax.lax.psum(u * keep.astype(u.dtype), "data"), bn_updates
            )
            return grads, metrics, bn_updates

        sharded = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P()),
            out_specs=P(),
        )

        @jax.jit
        def step(params, opt_state, teacher_params, batch, rng):
            grads, metrics, bn_updates = sharded(params, teacher_params, batch, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = Fn.apply_bn_updates(params, bn_updates)
            return params, opt_state, metrics

        return step

    if accum_steps > 1:

        @jax.jit
        def step(params, opt_state, teacher_params, batch, rng):
            k = accum_steps

            def micro(x):
                assert x.shape[0] % k == 0, (
                    f"batch {x.shape[0]} not divisible by accum_steps {k}"
                )
                return x.reshape((k, x.shape[0] // k) + x.shape[1:])

            mb = jax.tree_util.tree_map(micro, batch)
            rngs = jax.random.split(rng, k)
            first = jax.tree_util.tree_map(lambda x: x[0], mb)
            g0, (m0, bn0) = _grads(params, teacher_params, first, rngs[0])

            def body(carry, xs):
                g_acc, m_acc, bn_acc = carry
                mb_i, rng_i = xs
                g, (m, bn) = _grads(params, teacher_params, mb_i, rng_i)
                add = lambda a, b: jax.tree_util.tree_map(jnp.add, a, b)
                return (add(g_acc, g), add(m_acc, m), add(bn_acc, bn)), None

            rest = jax.tree_util.tree_map(lambda x: x[1:], mb)
            (g, m, bn), _ = jax.lax.scan(body, (g0, m0, bn0), (rest, rngs[1:]))
            inv = 1.0 / k
            scale = lambda t: jax.tree_util.tree_map(
                lambda x: (x * jnp.asarray(inv, x.dtype)), t
            )
            grads, metrics, bn_updates = scale(g), scale(m), scale(bn)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = Fn.apply_bn_updates(params, bn_updates)
            return params, opt_state, metrics

        return step

    @jax.jit
    def step(params, opt_state, teacher_params, batch, rng):
        grads, (metrics, bn_updates) = _grads(params, teacher_params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = Fn.apply_bn_updates(params, bn_updates)
        return params, opt_state, metrics

    return step
