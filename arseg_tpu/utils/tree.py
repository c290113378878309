"""Pytree dtype utilities shared by serving, training, and bench."""

import jax
import jax.numpy as jnp


def cast_f32(tree, dtype):
    """Cast every float32 leaf of `tree` to `dtype`; all other leaves
    (int BN counters, bool masks, already-cast params) pass through.
    No-op for dtype float32. The single definition of the "serving params
    resident in bf16" cast used by ARPipeline, the mixed-precision train
    step, the CLIs, and bench.py."""
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float32:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        tree,
    )
