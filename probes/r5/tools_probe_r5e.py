"""r5e: two independent AR-numerator arms on the production camvid-bise18
program (0.5x GOP12 bf16 720x960, bf16-staged frames — the r5d serving
contract):

  A. batched-stem pool form: S2D4_POOL_D2S_BATCH (full d2s + reduce_window,
     0.775 ms/GOP in the round-5 profile: 0.525 transpose + 0.25 window)
     vs S2D4_POOL_HALF_D2S_BATCH (128-lane-aligned row-parity split +
     untiled-axis interleave + H reduce_window + shift-max W resolve).
     Bitwise-equal by construction; agreement asserted.

  B. isolated creff_qkv_fused tile-height sweep at the fusion shape
     [1,90,120,256] (production _pick_th choice is 30; kernel was last
     swept round 3 on a different wrapper) — th in {15, 18, 30, 45}.

Usage: python probes/r5/tools_probe_r5e.py
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
import arseg_tpu.nn.functional as Fn

enable_compile_cache()

H, Wd, G = 720, 960, 12
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, frames=G, iters=8, rounds=5):
    try:
        for _ in range(2):
            _sync(fn(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
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
    print(f"{name:12s} {t / (frames / G) * 1e3:8.2f} ms/GOP  "
          f"({frames / t:7.1f} fps)", flush=True)
    return t


def main():
    hr = build_model("camvid-bise18", fuse=False)
    lr = build_model("camvid-bise18", fuse=True)
    from arseg_tpu.utils.tree import cast_f32

    hrp = cast_f32(hr.init(jax.random.PRNGKey(0)), DT)
    lrp = cast_f32(lr.init(jax.random.PRNGKey(1)), DT)
    rng = np.random.RandomState(0)
    kf = jnp.asarray(rng.randn(1, H, Wd, 3).astype(np.float32)).astype(DT)
    fr = jnp.asarray(rng.randn(G - 1, H, Wd, 3).astype(np.float32)).astype(DT)
    fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, Wd)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, Wd)).astype(np.float32))

    outs = {}
    for name, half in (("pool-d2s", False), ("pool-half", True)):
        Fn.S2D4_POOL_HALF_D2S_BATCH = half
        pipe = ARPipeline(hr, lr, scale=0.5, dtype=DT)
        t = bench(name, pipe, hrp, lrp, kf, fr, (fx, fy))
        if t is not None:
            outs[name] = np.asarray(pipe(hrp, lrp, kf, fr, (fx, fy)))
    if len(outs) == 2:
        agree = float((outs["pool-half"] == outs["pool-d2s"]).mean())
        print(f"agreement pool-half vs pool-d2s: {agree:.6f}", flush=True)
    Fn.S2D4_POOL_HALF_D2S_BATCH = False

    # ---- B: creff_qkv_fused th sweep at the fusion shape ----
    from arseg_tpu.ops.pallas_creff import creff_qkv_fused

    c = 256
    lr_up = jnp.asarray(rng.randn(1, 90, 120, c).astype(np.float32)).astype(DT)
    ref = jnp.asarray(rng.randn(1, 90, 120, c).astype(np.float32)).astype(DT)
    wkey = jax.random.PRNGKey(3)
    dw = lambda k: {  # noqa: E731
        "weight": jax.random.normal(k, (3, 3, 1, c), DT) * 0.1,
        "bias": jax.random.normal(jax.random.fold_in(k, 1), (c,), DT) * 0.1,
    }
    wq, wk, wv = (dw(jax.random.fold_in(wkey, i)) for i in range(3))
    base_out = None
    for th in (15, 18, 30, 45):
        f = jax.jit(lambda a, b: creff_qkv_fused(a, b, wq, wk, wv, 7, 7, th=th))
        t = bench(f"creff-th{th}", f, lr_up, ref, frames=1, iters=32)
        if t is not None:
            o = np.asarray(f(lr_up, ref))
            if base_out is None:
                base_out = o
            else:
                print(f"  th{th} max|d| vs first: "
                      f"{float(np.abs(o.astype(np.float32) - base_out.astype(np.float32)).max()):.3e}",
                      flush=True)


if __name__ == "__main__":
    main()
