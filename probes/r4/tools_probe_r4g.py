"""r4g: layout-fish A/B on the production GOP program (post-r4f, ~13.9 ms).

Round-4 profile (bench_logs → tools_profile_gop on the r4f program) puts the
remaining non-compute costs at: frames f32->bf16 cast + relayout copy
(tree.py:17, 0.236 ms/GOP), resize_bilinear_s2d's 4-way output concatenate
(resize.py:252, 0.273 ms), and its merge reshape (0.133). Two flag-gated
rewrites target them:

  S2D_ONE_EINSUM  — stacked-matrix H+W passes, channel packing by reshape
                    (no concatenate)
  CAST_IN_RESIZE  — frames cast folded into the resize (no standalone
                    convert+copy of [11,720,960,3])

Both are bitwise-identical on CPU (test_resize.py lanes); this probe
measures ms/GOP and on-TPU agreement for the four flag combinations.

Usage: python probes/r4/tools_probe_r4g.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline, pipeline as plmod
from arseg_tpu.ops import resize as rsmod
from arseg_tpu.utils.tree import cast_f32

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
    print(f"{name:28s} {t*1e3:8.2f} ms/GOP  ({G/t:7.1f} fps)", flush=True)
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

arms = [
    ("base", False, False),
    ("one-einsum", True, False),
    ("cast-in-resize", False, True),
    ("both", True, True),
]
outs, times = {}, {}
for name, s2d_one, cast_in in arms:
    rsmod.S2D_ONE_EINSUM = s2d_one
    plmod.CAST_IN_RESIZE = cast_in
    pipe = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
    times[name] = bench(name, pipe, hrp, lrp, kf, fr, (fx, fy))
    outs[name] = np.asarray(pipe(hrp, lrp, kf, fr, (fx, fy)))
rsmod.S2D_ONE_EINSUM = False
plmod.CAST_IN_RESIZE = False

base = outs["base"]
for name in outs:
    if name != "base":
        a = float((outs[name] == base).mean())
        d = (times["base"] - times[name]) * 1e3
        print(f"{name:28s} agreement={a:.6f}  delta={d:+.2f} ms/GOP", flush=True)
print("DONE", flush=True)
