"""r3q: in-situ A/B of the s2d pixel-unshuffle formulation on the
production camvid-bise18 GOP program.

Same-compile profiler attribution (tools_profile_gop.py, session 5) pins
~1.6 ms/GOP on the 6-D reshape+transpose pixel-unshuffle feeding the s2d
stems: keyframe reshape.16 (0.74) + copy.290 (0.35), LR copy.353 (0.26) +
copy.354 (0.28). USE_S2D_SLICE_UNSHUFFLE swaps in the transpose-free form
(two stride-2 sublane slices + minor-dim bitcasts + one concat). Bitwise
identical data movement, so agreement must be 1.0 — any mismatch is a bug.

Standalone measurements of slice forms were misleading before (r3p: the
same slices looked 2x slower out of context) — this probe times the FULL
jitted GOP program both ways.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline
from arseg_tpu.utils.tree import cast_f32
import arseg_tpu.nn.functional as Fn

enable_compile_cache()

H, W, G = 720, 960, 12
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=8, rounds=5):
    for _ in range(2):
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
    print(f"{name:16s} {t*1e3:8.2f} ms/GOP  ({G/t:7.1f} fps)", flush=True)
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

assert not Fn.USE_S2D_SLICE_UNSHUFFLE
pipe_off = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
t_off = bench("slice_s2d=0", pipe_off, hrp, lrp, kf, fr, (fx, fy))
out_off = np.asarray(pipe_off(hrp, lrp, kf, fr, (fx, fy)))

Fn.USE_S2D_SLICE_UNSHUFFLE = True
pipe_on = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
print("compiling flag-on program (cold, minutes)...", flush=True)
t_on = bench("slice_s2d=1", pipe_on, hrp, lrp, kf, fr, (fx, fy))
out_on = np.asarray(pipe_on(hrp, lrp, kf, fr, (fx, fy)))

agree = (out_off == out_on).mean()
print(f"delta {1e3*(t_off-t_on):+.2f} ms/GOP; class-map agreement {agree:.6f}"
      f"  (must be 1.0 — bitwise-identical formulations)", flush=True)
print("DONE", flush=True)
