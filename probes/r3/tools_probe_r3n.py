"""r3n: A/B the fused resize-into-pad CReFF lr path (USE_FUSED_RESIZE) on
the production camvid-bise18 GOP program.

OFF is the shipped path (warm compile cache); ON replaces the per-frame
lr_up resize + kernel pad round trip with resize_bilinear_padded feeding
creff_qkv_fused(lr_prepadded=True). Expected win: the wrap share of the
5.04 ms CReFF stage (PERF.md round-3 budget). Also checks class-map
agreement (bf16 interiors differ by 1 ulp -> rare argmax tie flips only).

Run AFTER tools_profile_gop.py, BEFORE the crash-risky probes.
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
import arseg_tpu.nn.attention as attention

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

assert not attention.USE_FUSED_RESIZE
pipe_off = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
t_off = bench("fused_resize=0", pipe_off, hrp, lrp, kf, fr, (fx, fy))
out_off = np.asarray(pipe_off(hrp, lrp, kf, fr, (fx, fy)))

attention.USE_FUSED_RESIZE = True
pipe_on = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
print("compiling flag-on program (cold, minutes)...", flush=True)
t_on = bench("fused_resize=1", pipe_on, hrp, lrp, kf, fr, (fx, fy))
out_on = np.asarray(pipe_on(hrp, lrp, kf, fr, (fx, fy)))

agree = (out_off == out_on).mean()
print(f"delta {1e3*(t_off-t_on):+.2f} ms/GOP; class-map agreement {agree:.6f}",
      flush=True)

# multi-GOP (B=8) A/B — the flag rewrites the fuse inside _multi_gop_step
# too; its plateau number (bench extra.batch_matched) must be re-validated
# before flipping the flag on
B = 8
kf8 = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
fr8 = jnp.asarray(rng.randn(B, G - 1, H, W, 3).astype(np.float32))
fx8 = jnp.asarray(rng.uniform(-16, 16, (B, G - 1, H, W)).astype(np.float32))
fy8 = jnp.asarray(rng.uniform(-16, 16, (B, G - 1, H, W)).astype(np.float32))

attention.USE_FUSED_RESIZE = False
pipe8_off = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
t8_off = bench("multiB8=0", pipe8_off, hrp, lrp, kf8, fr8, (fx8, fy8), iters=4)
attention.USE_FUSED_RESIZE = True
pipe8_on = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
print("compiling flag-on multi-GOP program (cold)...", flush=True)
t8_on = bench("multiB8=1", pipe8_on, hrp, lrp, kf8, fr8, (fx8, fy8), iters=4)
m_off = np.asarray(pipe8_off(hrp, lrp, kf8, fr8, (fx8, fy8)))
m_on = np.asarray(pipe8_on(hrp, lrp, kf8, fr8, (fx8, fy8)))
print(f"multi-GOP delta {1e3*(t8_off-t8_on):+.2f} ms/call; agreement "
      f"{(m_off == m_on).mean():.6f}", flush=True)
print("DONE", flush=True)
