"""r5g: refresh the cityscapes headline configs under the round-5 serving
protocol (clip timing both sides, bf16-staged frames, all r5 defaults) —
the PERF.md all-four-configs table last measured these in round 3 under
dispatch-mode timing against the round-3 baseline build.

Per config (cityscapes-bise18, cityscapes-psp18 @1024x2048, GOP12, 0.5x):
  ar-scan4    ARPipeline.scan_step over K=4 GOPs (48 frames/dispatch)
  hr-clip48   HR-everyframe per-frame lax.map, 48 frames/dispatch

Usage: python probes/r5/tools_probe_r5g.py [config ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline
from arseg_tpu.ops import resize_bilinear

enable_compile_cache()

G = 12
DT = jnp.bfloat16
K = 4


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, frames, iters=4, rounds=5):
    try:
        for _ in range(2):
            _sync(fn(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:24s} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
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
    print(f"{name:24s} {t / (frames / G) * 1e3:8.2f} ms/GOP  "
          f"({frames / t:7.1f} fps)", flush=True)
    return t


def run_config(name):
    H, W = 1024, 2048
    hr = build_model(name, fuse=False)
    lr = build_model(name, fuse=True)
    from arseg_tpu.utils.tree import cast_f32

    hrp = cast_f32(hr.init(jax.random.PRNGKey(0)), DT)
    lrp = cast_f32(lr.init(jax.random.PRNGKey(1)), DT)
    rng = np.random.RandomState(0)
    pipe = ARPipeline(hr, lr, scale=0.5, dtype=DT)
    scan = pipe.scan_step()
    kfs = jnp.asarray(rng.randn(K, H, W, 3).astype(np.float32)).astype(DT)
    frs = jnp.asarray(rng.randn(K, G - 1, H, W, 3).astype(np.float32)).astype(DT)
    fxs = jnp.asarray(rng.uniform(-16, 16, (K, G - 1, H, W)).astype(np.float32))
    fys = jnp.asarray(rng.uniform(-16, 16, (K, G - 1, H, W)).astype(np.float32))
    t_ar = bench(f"{name} ar-scan{K}", scan, hrp, lrp, kfs, frs, fxs, fys,
                 frames=K * G)
    del kfs, frs, fxs, fys

    @jax.jit
    def hr_map(params, batch):
        def chunk(xs):
            out = hr.apply(params, xs)[0]
            out = resize_bilinear(out, (H, W), align_corners=True)
            return jnp.argmax(out, axis=-1)

        return jax.lax.map(chunk, batch.reshape(-1, 1, H, W, 3))

    clip = jnp.asarray(rng.randn(K * G, H, W, 3).astype(np.float32)).astype(DT)
    t_hr = bench(f"{name} hr-clip{K * G}", hr_map, hrp, clip, frames=K * G)
    del clip
    if t_ar and t_hr:
        print(f"{name} vs_baseline (clip both sides): {t_hr / t_ar:.3f}",
              flush=True)


def main():
    configs = sys.argv[1:] or ["cityscapes-bise18", "cityscapes-psp18"]
    for c in configs:
        run_config(c)


if __name__ == "__main__":
    main()
