"""r3s: A/B the resize layout fixes on the production camvid-bise18 GOP
program — (a) MERGED_ROW_GATHER (flow-plane H-pass gathers row-merged so
XLA stops relayouting the [11,720,960] f32 planes), (b) H_DOWNSAMPLE_MATMUL
(frame 0.5x H-pass as a constant-matrix matmul instead of a gather that
relayouts the [11,720,960,3] frames twice).

tools_probe_r3r attribution: ~2 ms/GOP of copy/reshape/transpose traffic in
the 15.5 ms program came from these two resizes. OFF/OFF is the previously
shipped program (warm cache via the last bench); ON/ON was compiled by the
r3r rerun. Flow path is bit-exact by construction; the frame matmul form
may flip rare argmax ties in bf16 (agreement printed).
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
from arseg_tpu.ops import resize

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
    print(f"{name:22s} {t*1e3:8.2f} ms/GOP  ({G/t:7.1f} fps)", flush=True)
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

resize.MERGED_ROW_GATHER = False
resize.H_DOWNSAMPLE_MATMUL = False
pipe_off = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
t_off = bench("layout_fix=off", pipe_off, hrp, lrp, kf, fr, (fx, fy))
out_off = np.asarray(pipe_off(hrp, lrp, kf, fr, (fx, fy)))

for name, mg, hm in [("merged_gather_only", True, False),
                     ("matmul_only", False, True),
                     ("both", True, True)]:
    resize.MERGED_ROW_GATHER = mg
    resize.H_DOWNSAMPLE_MATMUL = hm
    pipe_on = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
    t_on = bench(name, pipe_on, hrp, lrp, kf, fr, (fx, fy))
    out_on = np.asarray(pipe_on(hrp, lrp, kf, fr, (fx, fy)))
    agree = (out_off == out_on).mean()
    print(f"  delta {1e3*(t_off-t_on):+.2f} ms/GOP; agreement {agree:.6f}",
          flush=True)
