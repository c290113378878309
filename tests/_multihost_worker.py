"""Worker for tests/test_multihost.py: one of two processes in a
jax.distributed CPU-backend cluster. Runs a sharded phase-2 train step and a
psum'd eval confusion histogram over the 4-device global mesh (2 local
devices per process), asserting the cross-process psum matches a
single-process computation of the same global batch.

Usage: python _multihost_worker.py <coordinator host:port> <process_id> <tmp>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

coord, pid = sys.argv[1], int(sys.argv[2])

# pin CPU before any backend touch (the environment's TPU PJRT plugin
# overrides the JAX_PLATFORMS env var; see tests/conftest.py)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from arseg_tpu.models import build_model  # noqa: E402
from arseg_tpu.eval.engine import _alter_hist  # noqa: E402
from arseg_tpu.eval.metrics import psum_hist  # noqa: E402
from arseg_tpu.train.objectives import build_phase2_loss  # noqa: E402
from arseg_tpu.train.optim import make_optimizer, cosine_schedule  # noqa: E402
from arseg_tpu.train.step import make_train_step, masked_optimizer  # noqa: E402

devices = jax.devices()
assert len(devices) == 4, f"expected 4 global devices, got {len(devices)}"
assert len(jax.local_devices()) == 2
mesh = Mesh(np.array(devices), ("data",))


def make_global(np_value, spec):
    """Global array from a host-replicated numpy value (every process holds
    the full value; the callback serves each addressable shard its slice)."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        np_value.shape, sharding, lambda idx: np_value[idx]
    )


def replicate_tree(tree):
    return jax.tree_util.tree_map(
        lambda x: make_global(np.asarray(x), P()), tree
    )


def shard_tree(batch):
    return {
        k: make_global(v, P("data", *([None] * (v.ndim - 1))))
        for k, v in batch.items()
    }


B, H, W = 4, 48, 64
rng = np.random.RandomState(0)
batch_np = {
    "image": rng.randn(B, H, W, 3).astype(np.float32),
    "label": rng.randint(0, 12, (B, H, W)).astype(np.int32),
    "existence": np.ones((B, 12), np.float32),
    "ref_image": rng.randn(B, H, W, 3).astype(np.float32),
    "flow": rng.uniform(-4, 4, (B, H, W, 2)).astype(np.float32),
}

# ---- sharded train step (gradient all-reduce across processes) -------------
model = build_model("camvid-psp18", fuse=True)
teacher = build_model("camvid-psp18", fuse=False)
params_np = jax.tree_util.tree_map(
    np.asarray, model.init(jax.random.PRNGKey(0))
)
teacher_np = jax.tree_util.tree_map(
    np.asarray, teacher.init(jax.random.PRNGKey(1))
)

loss_fn = build_phase2_loss(
    model, teacher, "pspnet", "camvid", (W, H), scale=0.5,
    feat_loss="mse", stage2=True, with_motion=True,
)
optimizer = masked_optimizer(
    make_optimizer("adam", cosine_schedule(1e-3, 100)),
    params_np,
    frozen_prefixes=("final_conv",),
)
step = make_train_step(loss_fn, optimizer)

params_g = replicate_tree(params_np)
teacher_g = replicate_tree(teacher_np)
opt_state = optimizer.init(params_g)
new_params, _, metrics = step(
    params_g, opt_state, teacher_g, shard_tree(batch_np), jax.random.PRNGKey(42)
)
jax.block_until_ready(new_params)
loss = float(metrics["loss"])
assert np.isfinite(loss), f"non-finite loss {loss}"
print(f"LOSS {loss!r}", flush=True)

# ---- psum'd eval histogram across processes ---------------------------------
ehr = build_model("camvid-bise18", fuse=False)
elr = build_model("camvid-bise18", fuse=True)
ehr_np = jax.tree_util.tree_map(np.asarray, ehr.init(jax.random.PRNGKey(2)))
elr_np = jax.tree_util.tree_map(np.asarray, elr.init(jax.random.PRNGKey(3)))

local_hist = _alter_hist(ehr, elr, 0.5, 12, 255, None)
sharded_hist = jax.jit(
    shard_map(
        lambda hp, p, im, lb, ri, fx, fy: psum_hist(
            local_hist(hp, p, im, lb, ri, fx, fy)
        ),
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=P(),
    )
)

fx_np = np.ascontiguousarray(batch_np["flow"][..., 0])
fy_np = np.ascontiguousarray(batch_np["flow"][..., 1])
hist = sharded_hist(
    replicate_tree(ehr_np),
    replicate_tree(elr_np),
    make_global(batch_np["image"], P("data", None, None, None)),
    make_global(batch_np["label"], P("data", None, None)),
    make_global(batch_np["ref_image"], P("data", None, None, None)),
    make_global(fx_np, P("data", None, None)),
    make_global(fy_np, P("data", None, None)),
)
hist = np.asarray(hist)

# single-process reference on the full batch (local devices only, no mesh)
expected = np.asarray(
    jax.jit(local_hist)(
        ehr_np, elr_np, batch_np["image"], batch_np["label"],
        batch_np["ref_image"], fx_np, fy_np,
    )
)
np.testing.assert_array_equal(hist, expected)
assert hist.sum() == B * H * W, f"histogram mass {hist.sum()} != {B*H*W}"
print(f"HIST {hist.sum()!r}", flush=True)

jax.distributed.shutdown()
print("MULTIHOST_OK", flush=True)
