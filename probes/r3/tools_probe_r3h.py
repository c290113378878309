"""Round-3 probe H: is the HR-everywhere baseline handicapped by its
chunk=1 lax.map? Measure the bise18 HR forward over 12 frames at chunk
1/2/4/6/12 (bf16, 720x960, resize+argmax head identical to bench.py).
If batching is materially faster, the honest bench baseline must use it."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.ops import resize_bilinear

enable_compile_cache()

H, W, G = 720, 960, 12
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=8, rounds=5):
    try:
        for _ in range(2):
            _sync(fn(*args))
    except Exception as e:
        print(f"{name:16s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
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
    print(f"{name:16s} {t*1e3:8.2f} ms/12f  ({G/t:7.1f} fps)", flush=True)
    return t


name = sys.argv[1] if len(sys.argv) > 1 else "camvid-bise18"
hr_model = build_model(name, fuse=False)
cast = lambda t: jax.tree_util.tree_map(
    lambda x: x.astype(DT) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
hr_params = cast(hr_model.init(jax.random.PRNGKey(0)))
rng = np.random.RandomState(0)
frames = jnp.asarray(rng.randn(G, H, W, 3).astype(np.float32))


def make(chunk):
    @jax.jit
    def hr_all(params, batch):
        def one(xs):
            out = hr_model.apply(params, xs.astype(DT))[0]
            out = resize_bilinear(out, (H, W), align_corners=True)
            return jnp.argmax(out, axis=-1)

        return jax.lax.map(one, batch.reshape(-1, chunk, H, W, 3))

    return hr_all


for c in [1, 2, 4, 6, 12]:
    bench(f"chunk={c}", make(c), hr_params, frames)
print("DONE", flush=True)
