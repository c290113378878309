"""r4c: A/B the trace-time unroll of the per-frame fuse loop on the
production camvid-bise18 AR program (gop/pipeline.py FUSE_UNROLL).

Motivation (round-4 profile2): the `while.16` loop annotation carries
~3.3 ms/call and the loop-carried lax.map serializes frame i+1's warp
gather behind frame i's CReFF custom call; an 11-way unroll removes the
bookkeeping and exposes cross-frame ILP to XLA's scheduler. Risk: HLO size
(11 inlined bodies) — compile time printed per arm.

Must be exact-equal (same math, same order per frame).

Usage: python probes/r4/tools_probe_r4c.py
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
from arseg_tpu.utils.tree import cast_f32
import arseg_tpu.gop.pipeline as P

enable_compile_cache()

H, W, G = 720, 960, 12
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=8, rounds=5):
    t0 = time.perf_counter()
    _sync(fn(*args))
    print(f"{name:14s} first call (compile) {time.perf_counter() - t0:.0f}s", flush=True)
    _sync(fn(*args))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name:14s} {t*1e3:8.2f} ms/GOP  ({G/t:7.1f} fps)", flush=True)
    return t


hr_model = build_model("camvid-bise18", fuse=False)
lr_model = build_model("camvid-bise18", fuse=True)
hrp = cast_f32(hr_model.init(jax.random.PRNGKey(0)), DT)
lrp = cast_f32(lr_model.init(jax.random.PRNGKey(1)), DT)
rng = np.random.RandomState(0)
kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))

assert not P.FUSE_UNROLL
pipe_map = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
t_map = bench("fuse=map", pipe_map, hrp, lrp, kf, fr, (fx, fy))
out_map = np.asarray(pipe_map(hrp, lrp, kf, fr, (fx, fy)))

P.FUSE_UNROLL = True
pipe_unr = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
t_unr = bench("fuse=unroll", pipe_unr, hrp, lrp, kf, fr, (fx, fy))
out_unr = np.asarray(pipe_unr(hrp, lrp, kf, fr, (fx, fy)))

agree = (out_map == out_unr).mean()
print(f"delta {1e3*(t_map-t_unr):+.2f} ms/GOP; agreement {agree:.6f} "
      f"(must be 1.0 — identical per-frame math)", flush=True)
print("DONE", flush=True)
