"""Time the planned two-pass warp at production scale on the real TPU and
compare against the exact gather warp. 720x960x64, scene-like flow."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.ops.warp import warp_feature
from arseg_tpu.ops.warp_plan import build_warp_plan
from arseg_tpu.ops.pallas_warp2 import (
    plan_to_device, ref_to_lanes_h, warp_planned_from_t, _pad128,
)

enable_compile_cache()
rng = np.random.RandomState(0)
H, W, C = 720, 960, 64
N = 1  # frames per call (pipeline runs lr_chunk=1)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=8, rounds=5):
    t0 = time.perf_counter()
    out0 = fn(*args)
    _sync(out0)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    ms = sorted(ts)[len(ts) // 2] * 1000
    print(f"{name}: {ms:.3f} ms  (compile {compile_s:.1f}s)", flush=True)
    return ms, out0


# scene-like flow (smooth background + objects), quarter-pel
fx = np.full((N, H, W), 0.0, np.float32) + np.round(rng.uniform(-12, 12) * 4) / 4
fy = np.full((N, H, W), 0.0, np.float32) + np.round(rng.uniform(-12, 12) * 4) / 4
for _ in range(4):
    y0, x0 = rng.randint(0, H // 2), rng.randint(0, W // 2)
    hh, ww = rng.randint(40, H // 2), rng.randint(40, W // 2)
    fx[:, y0 : y0 + hh, x0 : x0 + ww] = np.round(rng.uniform(-15, 15) * 4) / 4
    fy[:, y0 : y0 + hh, x0 : x0 + ww] = np.round(rng.uniform(-15, 15) * 4) / 4

feat = rng.randn(1, H, W, C).astype(np.float32)

t0 = time.perf_counter()
plan = build_warp_plan((fx, fy), (H, W))
host_ms = (time.perf_counter() - t0) * 1000
print(f"host plan build: {host_ms:.1f} ms/frame, corr_n={plan.corr_n}, "
      f"exact={plan.exact}", flush=True)
dev, meta = plan_to_device(plan)
print(f"meta: {meta}", flush=True)

feat_j = jnp.asarray(feat)
featpad = jnp.pad(feat_j[0], ((1, 1), (1, 1), (0, 0)))
hl, wl = _pad128(H + 2), _pad128(W + 2)

# per-GOP prep (amortized over 11 frames)
t1 = jax.jit(lambda fp: ref_to_lanes_h(fp, hl, wl))
ms_t1, featT = bench("T1 ref_to_lanes (per GOP)", t1, featpad)

planned = jax.jit(
    lambda ft, fp, j, v0, v1, xi, wx0, wx1, cp, cyx, cw, cn: warp_planned_from_t(
        ft, fp,
        {"j": j, "v0": v0, "v1": v1, "xi": xi, "wx0": wx0, "wx1": wx1,
         "corr_pos": cp, "corr_yx": cyx, "corr_w": cw, "corr_n": cn},
        meta, jnp.float32,
    )
)
args = (featT, featpad, dev["j"], dev["v0"], dev["v1"], dev["xi"],
        dev["wx0"], dev["wx1"], dev["corr_pos"], dev["corr_yx"],
        dev["corr_w"], dev["corr_n"])
ms_planned, out_planned = bench("planned warp (per frame)", planned, *args)

exact = jax.jit(lambda f, a, b: warp_feature(f, (a, b)))
fxj, fyj = jnp.asarray(fx), jnp.asarray(fy)
ms_exact, out_exact = bench("exact gather warp", exact, feat_j, fxj, fyj)

d = np.abs(np.asarray(out_planned) - np.asarray(out_exact)).max()
print(f"parity |delta|max = {d:.2e}", flush=True)
print(f"SPEEDUP: {ms_exact / ms_planned:.2f}x "
      f"({ms_exact:.2f} -> {ms_planned:.2f} ms + {ms_t1:.2f}/11 amort)",
      flush=True)
