"""Round-3 probe I: AR multi-GOP throughput mode (B GOPs per program) on
camvid-bise18 — the AR-side counterpart of the HR baseline's best batching
(tools_probe_r3h). Reports fps at B in {1,2,4} plus the honest pairing
against the HR chunk-12 baseline."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline

enable_compile_cache()

H, W, G = 720, 960, 12
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, frames_per_call, iters=6, rounds=5):
    try:
        for _ in range(2):
            _sync(fn(*args))
    except Exception as e:
        print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name:12s} {t*1e3:8.2f} ms/call  ({frames_per_call/t:7.1f} fps)", flush=True)
    return frames_per_call / t


name = sys.argv[1] if len(sys.argv) > 1 else "camvid-bise18"
hr_model = build_model(name, fuse=False)
lr_model = build_model(name, fuse=True)
cast = lambda t: jax.tree_util.tree_map(
    lambda x: x.astype(DT) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
hr_params = cast(hr_model.init(jax.random.PRNGKey(0)))
lr_params = cast(lr_model.init(jax.random.PRNGKey(1)))
pipe = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
rng = np.random.RandomState(0)

for B in [1, 2, 4]:
    if B == 1:
        kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
        fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
        fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
        fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
    else:
        kf = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
        fr = jnp.asarray(rng.randn(B, G - 1, H, W, 3).astype(np.float32))
        fx = jnp.asarray(rng.uniform(-16, 16, (B, G - 1, H, W)).astype(np.float32))
        fy = jnp.asarray(rng.uniform(-16, 16, (B, G - 1, H, W)).astype(np.float32))
    bench(f"B={B}", pipe, hr_params, lr_params, kf, fr, (fx, fy),
          frames_per_call=B * G)
print("DONE", flush=True)
