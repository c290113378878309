"""Device-mesh utilities — the TPU-native equivalent of the reference's
parallelism surface (SURVEY.md §2.3): single-node data parallelism
(nn.DataParallel scatter/gather -> batch sharding over a 1-D 'data' mesh with
XLA all-reduce over ICI) and the eval confusion-matrix reduction (the dormant
dist.all_reduce at `evaluation.py:134-135` -> lax.psum).

The models here are <= ResNet-18 scale, so tensor/pipeline/expert parallelism
are out of scope by design (documented in SURVEY §2.3); the framework's own
"pipeline" axis is the GOP schedule (arseg_tpu/gop). Multi-host DCN runs use
the same program via jax.distributed.initialize — the shardings don't change
(demonstrated by tests/test_multihost.py: a 2-process CPU-backend cluster
running the sharded train step and the psum'd eval histogram).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices=None, batch_size=None):
    """1-D 'data' mesh. If batch_size is given the mesh is clamped to the
    largest device count that divides it (sharding requires divisibility)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n:
            n -= 1
        devices = devices[:n]
    return Mesh(np.array(devices), ("data",))


def shard_batch(batch, mesh):
    """Shard dict-of-arrays along leading (batch) dim over the 'data' axis."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: put(v) for k, v in batch.items()}


def replicate(tree, mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def eval_psum_hist(hist, axis_name="data"):
    return jax.lax.psum(hist, axis_name)
