"""r3l: finish the HR-baseline batching curve — does the HR-everywhere
bise18 forward plateau past batch 96? (r3j/r3k: b24 571.7, b48 777.3,
b96 956.6 fps; AR multi-GOP plateau is 1131.3 at B=8.)"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.ops import resize_bilinear
enable_compile_cache()
H, W = 720, 960
DT = jnp.bfloat16

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])

def bench(name, fn, *args, fpc, iters=3, rounds=5):
    try:
        for _ in range(2):
            _sync(fn(*args))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter(); out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out); ts.append((time.perf_counter() - t0) / iters)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name}: {t*1e3:.2f} ms/call ({fpc/t:.1f} fps)", flush=True)

hr_model = build_model("camvid-bise18", fuse=False)
cast = lambda t: jax.tree_util.tree_map(
    lambda x: x.astype(DT) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
hrp = cast(hr_model.init(jax.random.PRNGKey(0)))
rng = np.random.RandomState(0)
for n in [144, 192]:
    frames = jnp.asarray(rng.randn(n, H, W, 3).astype(np.float32))

    @jax.jit
    def hr_all(params, batch):
        out = hr_model.apply(params, batch.astype(DT))[0]
        out = resize_bilinear(out, (H, W), align_corners=True)
        return jnp.argmax(out, axis=-1)

    bench(f"HR batch={n}", hr_all, hrp, frames, fpc=n)
    del frames
print("DONE", flush=True)
