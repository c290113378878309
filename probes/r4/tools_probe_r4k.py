"""r4k: full-program A/B of the s2d4 block-form stem (STEM_S2D4_BLOCKS).

r4j measured the isolated pieces (LR stem conv -0.59 ms, spatial pair
-0.47, HR stem+pool -1.22, HR spatial -0.50, bf16) but fed a precomputed
z4 — production pays one extra 2x2 unshuffle per stem. This probe A/Bs the
REAL programs:

  ar-off / ar-on      production ARPipeline (camvid-bise18 0.5x GOP12 bf16)
  hr-off / hr-on      bench.py's HR-everyframe baseline program
  psp-on / psp-off    psp18 fuse_version=2 AR pipeline (resnet stem path)

plus bf16 argmax agreement on/off for the AR program (expected ~1.0 but NOT
bitwise: the stem contraction order changes).

Usage: python probes/r4/tools_probe_r4k.py [arms]
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
from arseg_tpu.nn import functional as Fn
from arseg_tpu.ops import resize_bilinear
from arseg_tpu.utils.tree import cast_f32

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
    except Exception as e:  # noqa: BLE001
        print(f"{name:10s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
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
    print(f"{name:10s} {t*1e3:8.2f} ms/GOP  ({G/t:7.1f} fps)", flush=True)
    return t


rng = np.random.RandomState(0)
kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))

hr_model = build_model("camvid-bise18", fuse=False)
lr_model = build_model("camvid-bise18", fuse=True)
hrp = cast_f32(hr_model.init(jax.random.PRNGKey(0)), DT)
lrp = cast_f32(lr_model.init(jax.random.PRNGKey(1)), DT)

arms = ["ar-off", "ar-on", "hr-off", "hr-on", "psp-off", "psp-on"]
if len(sys.argv) > 1:
    arms = sys.argv[1].split(",")

ts, outs = {}, {}
for arm in arms:
    flag = arm.endswith("-on")
    Fn.STEM_S2D4_BLOCKS = flag
    if arm.startswith("ar"):
        pipe = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
        ts[arm] = bench(arm, pipe, hrp, lrp, kf, fr, (fx, fy))
        if ts[arm] is not None:
            outs[arm] = np.asarray(pipe(hrp, lrp, kf, fr, (fx, fy)))
    elif arm.startswith("hr"):
        def hr_all(params, batch):
            def chunk(xs):
                out = hr_model.apply(params, xs.astype(DT))[0]
                out = resize_bilinear(out, (H, W), align_corners=True)
                return jnp.argmax(out, axis=-1)
            return jax.lax.map(chunk, batch.reshape(-1, 1, H, W, 3))
        allf = jnp.concatenate([kf, fr], axis=0)
        ts[arm] = bench(arm, jax.jit(hr_all), hrp, allf)
    elif arm.startswith("psp"):
        phr = build_model("camvid-psp18", fuse=True, fuse_version=2)
        plr = build_model("camvid-psp18", fuse=True, fuse_version=2)
        php = cast_f32(phr.init(jax.random.PRNGKey(0)), DT)
        plp = cast_f32(plr.init(jax.random.PRNGKey(1)), DT)
        pipe = ARPipeline(phr, plr, scale=0.5, dtype=DT)
        ts[arm] = bench(arm, pipe, php, plp, kf, fr, (fx, fy))
Fn.STEM_S2D4_BLOCKS = False

for base in ("ar", "hr", "psp"):
    a, b = ts.get(f"{base}-off"), ts.get(f"{base}-on")
    if a and b:
        print(f"delta {base}: {(a - b) * 1e3:+.2f} ms/GOP (off {a*1e3:.2f} "
              f"-> on {b*1e3:.2f})", flush=True)
if "ar-off" in outs and "ar-on" in outs:
    agree = float((outs["ar-off"] == outs["ar-on"]).mean())
    print(f"ar argmax agreement on-vs-off: {agree:.6f}", flush=True)
print("DONE", flush=True)
