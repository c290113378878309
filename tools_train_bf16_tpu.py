"""Real-TPU A/B: phase-2 FST training step (stage 2, full CamVid crop
960x720, batch 1) in pure f32 vs mixed-precision bf16
(`make_train_step(compute_dtype=bfloat16)`). Also prints the first-step
loss of each mode — the bf16 trajectory must track f32.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.train.objectives import build_phase2_loss
from arseg_tpu.train.optim import make_optimizer, cosine_schedule
from arseg_tpu.train.step import make_train_step, masked_optimizer

enable_compile_cache()

CROP_W, CROP_H = 960, 720
BATCH = 1
BACKEND = sys.argv[1] if len(sys.argv) > 1 else "camvid-bise18"
MODEL_TYPE = "bisenet" if "bise" in BACKEND else "pspnet"


def _sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


model = build_model(BACKEND, fuse=True)
teacher = build_model(BACKEND, fuse=False)
params = model.init(jax.random.PRNGKey(0))
teacher_params = teacher.init(jax.random.PRNGKey(1))
frozen = ("conv_out.conv_out",) if MODEL_TYPE == "bisenet" else ("final_conv",)
loss_fn = build_phase2_loss(
    model, teacher, MODEL_TYPE, "camvid", (CROP_W, CROP_H), scale=0.5,
    feat_loss="mse", stage2=True, with_motion=True,
)
optimizer = masked_optimizer(
    make_optimizer("adam", cosine_schedule(1e-3, 100)), params,
    frozen_prefixes=frozen,
)

rng = np.random.RandomState(0)
data = {
    "image": jnp.asarray(rng.randn(BATCH, CROP_H, CROP_W, 3).astype(np.float32)),
    "label": jnp.asarray(rng.randint(0, 12, (BATCH, CROP_H, CROP_W)).astype(np.int32)),
    "existence": jnp.ones((BATCH, 12), jnp.float32),
    "ref_image": jnp.asarray(rng.randn(BATCH, CROP_H, CROP_W, 3).astype(np.float32)),
    "flow": jnp.asarray(rng.uniform(-4, 4, (BATCH, CROP_H, CROP_W, 2)).astype(np.float32)),
}

for name, dt in [("f32", None), ("bf16", jnp.bfloat16)]:
    step = make_train_step(loss_fn, optimizer, compute_dtype=dt)
    p, s = params, optimizer.init(params)
    key = jax.random.PRNGKey(42)
    t_first = time.perf_counter()
    p, s, m = step(p, s, teacher_params, data, key)
    _sync(m["loss"])
    first_loss = float(m["loss"])
    print(f"{name}: first step (incl. compile) {time.perf_counter() - t_first:.1f}s,"
          f" loss {first_loss:.5f}", flush=True)
    ts = []
    for r in range(5):
        t0 = time.perf_counter()
        for _ in range(4):
            p, s, m = step(p, s, teacher_params, data, key)
        _sync(m["loss"])
        ts.append((time.perf_counter() - t0) / 4)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name}: {t * 1e3:.1f} ms/step (batch {BATCH}, {CROP_W}x{CROP_H}),"
          f" loss after 21 steps {float(m['loss']):.5f}", flush=True)
print("DONE", flush=True)
