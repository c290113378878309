"""r4b: three-way A/B of the s2d pixel-unshuffle form on the production
camvid-bise18 programs (AR GOP pipeline + per-frame HR-everyframe map).

Round-4 context: r3q measured slice-form −0.24 ms/GOP on the AR program and
bench2 measured it +45% on the HR-everyframe program; profile2 attribution
showed the slice form's LR-batch cost (reshape copies [11,180,240,6] ~1.08
ms/GOP + slower stem conv fusions) roughly cancels its keyframe win inside
the AR program. Hypothesis: "auto" (slice iff n==1) keeps the HR win and
returns the LR batch to the cheaper 6-D transpose form.

Arms: transpose-all (False) / slice-all (True) / auto. All three must agree
bitwise on class maps (bitwise-identical formulations).

Usage: python probes/r4/tools_probe_r4b.py
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
    print(f"{name:24s} {t*1e3:8.2f} ms/call  ({G/t:7.1f} fps)", flush=True)
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
frames12 = jnp.concatenate([kf, fr], axis=0)


def hr_all_fn():
    @jax.jit
    def hr_all(params, batch):
        def one(xs):
            o = hr_model.apply(params, xs.astype(DT))[0]
            o = resize_bilinear(o, (H, W), align_corners=True)
            return jnp.argmax(o, axis=-1)
        return jax.lax.map(one, batch.reshape(-1, 1, H, W, 3))

    return hr_all


results = {}
outs = {}
for mode in (False, True, "auto"):
    Fn.USE_S2D_SLICE_UNSHUFFLE = mode
    tag = {False: "transpose-all", True: "slice-all", "auto": "auto(n==1)"}[mode]
    pipe = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
    t_ar = bench(f"AR {tag}", pipe, hrp, lrp, kf, fr, (fx, fy))
    outs[tag] = np.asarray(pipe(hrp, lrp, kf, fr, (fx, fy)))
    t_hr = bench(f"HR-everyframe {tag}", hr_all_fn(), hrp, frames12)
    results[tag] = (t_ar, t_hr)

base = outs["transpose-all"]
for tag, o in outs.items():
    agree = (o == base).mean()
    print(f"agreement {tag:14s} {agree:.6f} (must be 1.0)", flush=True)
print("SUMMARY " + "  ".join(
    f"{tag}: AR {G/a:.1f} fps HR {G/h:.1f} fps" for tag, (a, h) in results.items()),
    flush=True)
print("DONE", flush=True)
