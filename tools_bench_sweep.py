"""Serving-envelope sweep: camvid-bise18 AR throughput across the reference's
own ablation axes — LR scale (evaluation.py --scale 0.3..0.9) and GOP length
(--ref_gap; reference datasets ship GOP12). One line per point:
scale, gop, AR fps/chip, HR-everywhere fps/chip, vs_baseline.

Usage: python tools_bench_sweep.py [scales] [gops]
  e.g. python tools_bench_sweep.py 0.3,0.5,0.7 4,8,12
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline
from arseg_tpu.ops import resize_bilinear

enable_compile_cache()

H, W = 720, 960
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def _time(fn, *args, iters=8, rounds=5, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[len(ts) // 2]


scales = [float(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "0.3,0.5,0.7").split(",")]
gops = [int(g) for g in (sys.argv[2] if len(sys.argv) > 2 else "4,8,12").split(",")]

hr_model = build_model("camvid-bise18", fuse=False)
lr_model = build_model("camvid-bise18", fuse=True)
cast = lambda t: jax.tree_util.tree_map(
    lambda x: x.astype(DT) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
hr_params = cast(hr_model.init(jax.random.PRNGKey(0)))
lr_params = cast(lr_model.init(jax.random.PRNGKey(1)))

rng = np.random.RandomState(0)

# HR-everywhere baseline per GOP length (scale-independent)
hr_fps = {}
for g in gops:
    frames_all = jnp.asarray(rng.randn(g, H, W, 3).astype(np.float32))

    @jax.jit
    def hr_all(params, batch):
        def chunk(xs):
            out = hr_model.apply(params, xs.astype(DT))[0]
            out = resize_bilinear(out, (H, W), align_corners=True)
            return jnp.argmax(out, axis=-1)

        return jax.lax.map(chunk, batch.reshape(-1, 1, H, W, 3))

    t = _time(hr_all, hr_params, frames_all)
    hr_fps[g] = g / t

for g in gops:
    keyframe = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    frames = jnp.asarray(rng.randn(g - 1, H, W, 3).astype(np.float32))
    flows_np = rng.uniform(-16, 16, (g - 1, H, W, 2)).astype(np.float32)
    flows = (
        jnp.asarray(np.ascontiguousarray(flows_np[..., 0])),
        jnp.asarray(np.ascontiguousarray(flows_np[..., 1])),
    )
    for s in scales:
        # LR dims must keep the backbone's /32 alignment reasonable; the
        # reference rounds with int() the same way
        pipe = ARPipeline(hr_model, lr_model, scale=s, dtype=DT)
        try:
            t = _time(pipe, hr_params, lr_params, keyframe, frames, flows)
        except Exception as e:
            print(f"scale={s} gop={g}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        ar = g / t
        print(
            f"scale={s} gop={g}: AR {ar:7.1f} fps/chip, HR-every {hr_fps[g]:6.1f},"
            f" vs_baseline {ar / hr_fps[g]:.3f}",
            flush=True,
        )
print("DONE", flush=True)
