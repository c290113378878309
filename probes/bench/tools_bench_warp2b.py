"""Bisect + time the three planned-warp kernels individually on the TPU."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.ops.warp_plan import build_warp_plan
from arseg_tpu.ops.pallas_warp2 import (
    plan_to_device, ref_to_lanes_h, warp_pass1, transpose_mid, warp_pass2,
    _apply_corrections, _pad128,
)

enable_compile_cache()
rng = np.random.RandomState(0)
H, W, C = 720, 960, 64


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=8, rounds=5):
    t0 = time.perf_counter()
    try:
        out0 = fn(*args)
        _sync(out0)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None, None
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


fx = np.full((1, H, W), 7.25, np.float32)
fy = np.full((1, H, W), -3.5, np.float32)
for _ in range(4):
    y0, x0 = rng.randint(0, H // 2), rng.randint(0, W // 2)
    hh, ww = rng.randint(40, H // 2), rng.randint(40, W // 2)
    fx[:, y0 : y0 + hh, x0 : x0 + ww] = np.round(rng.uniform(-15, 15) * 4) / 4
    fy[:, y0 : y0 + hh, x0 : x0 + ww] = np.round(rng.uniform(-15, 15) * 4) / 4

plan = build_warp_plan((fx, fy), (H, W))
dev, meta = plan_to_device(plan)
print(f"meta={meta} corr={plan.corr_n}", flush=True)

feat = rng.randn(1, H, W, C).astype(np.float32)
feat_j = jnp.asarray(feat)
featpad = jnp.pad(feat_j[0], ((1, 1), (1, 1), (0, 0)))
hl, wl = _pad128(H + 2), _pad128(W + 2)
featT = jax.jit(lambda fp: ref_to_lanes_h(fp, hl, wl))(featpad)
_sync(featT)

p1fn = jax.jit(lambda ft, j, v0, v1: warp_pass1(ft, j, v0, v1, meta["r1"]))
ms1, p1 = bench("P1 vertical pass", p1fn, featT, dev["j"], dev["v0"], dev["v1"])

if p1 is not None:
    t2fn = jax.jit(transpose_mid)
    ms2, p1t = bench("T2 mid transpose", t2fn, p1)
    if p1t is not None:
        p2fn = jax.jit(lambda x, xi, a, b: warp_pass2(x, xi, a, b, meta["r2"]))
        ms3, out = bench("P2 horizontal pass", p2fn, p1t, dev["xi"], dev["wx0"], dev["wx1"])
        if out is not None:
            cfn = jax.jit(
                lambda o, fp, cp, cyx, cw, cn: _apply_corrections(
                    o[:, :H, :W, :], fp, cp, cyx, cw, cn
                )
            )
            ms4, res = bench(
                "corrections", cfn, out, featpad, dev["corr_pos"],
                dev["corr_yx"], dev["corr_w"], dev["corr_n"],
            )
            if res is not None:
                from arseg_tpu.ops.warp import warp_feature

                ref = jax.jit(lambda f, a, b: warp_feature(f, (a, b)))(
                    feat_j, jnp.asarray(fx), jnp.asarray(fy)
                )
                d = np.abs(np.asarray(res) - np.asarray(ref)).max()
                print(f"parity |delta|max = {d:.2e}", flush=True)
                print(f"TOTAL per-frame: {ms1 + ms2 + ms3 + ms4:.2f} ms", flush=True)
print("DONE", flush=True)
