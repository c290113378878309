"""r4n: production A/B of the t4 corner-packed warp table and the
batch-gated d2s pool (both flags off by default; this probe decides).

  base       production AR pipeline (camvid-bise18 0.5x GOP12 bf16)
  t4         WARP_T4=True (gop/pipeline.py)
  poold2s    S2D4_POOL_D2S_BATCH=True (nn/functional.py)
  both       both flags
  mg-base    multi-GOP B=8 throughput program, flags off
  mg-t4      multi-GOP B=8 with WARP_T4 (the table repeat costs 4x the
             padded-feature repeat — 1.98 GB at B=8 — so this arm may lose)

plus bitwise agreement base-vs-each (expected exact: t4 gathers identical
values with identical lerp order; the pool forms are the same max set).

Usage: python probes/r4/tools_probe_r4n.py [arms]
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
import arseg_tpu.gop.pipeline as P
from arseg_tpu.nn import functional as Fn

enable_compile_cache()

H, W, G = 720, 960, 12
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, frames=G, iters=8, rounds=5):
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
    print(f"{name:10s} {t/ (frames/G) *1e3:8.2f} ms/GOP  ({frames/t:7.1f} fps)",
          flush=True)
    return t


def build_inputs(b=None):
    rng = np.random.RandomState(0)
    if b is None:
        kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
        fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
        fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
        fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
    else:
        kf = jnp.asarray(rng.randn(b, H, W, 3).astype(np.float32))
        fr = jnp.asarray(rng.randn(b, G - 1, H, W, 3).astype(np.float32))
        fx = jnp.asarray(rng.uniform(-16, 16, (b, G - 1, H, W)).astype(np.float32))
        fy = jnp.asarray(rng.uniform(-16, 16, (b, G - 1, H, W)).astype(np.float32))
    return kf, fr, (fx, fy)


def make_pipe():
    from arseg_tpu.utils.tree import cast_f32

    hr = build_model("camvid-bise18", fuse=False)
    lr = build_model("camvid-bise18", fuse=True)
    hp = cast_f32(hr.init(jax.random.PRNGKey(0)), DT)
    lp = cast_f32(lr.init(jax.random.PRNGKey(1)), DT)
    return ARPipeline(hr, lr, scale=0.5, dtype=DT), hp, lp


def main():
    arms = sys.argv[1:] or ["base", "t4", "poold2s", "both", "mg-base", "mg-t4"]
    kf, fr, fl = build_inputs()
    outs = {}
    for arm in [a for a in arms if not a.startswith("mg-")]:
        P.WARP_T4 = arm in ("t4", "both")
        Fn.S2D4_POOL_D2S_BATCH = arm in ("poold2s", "both")
        pipe, hp, lp = make_pipe()
        bench(arm, pipe, hp, lp, kf, fr, fl)
        outs[arm] = np.asarray(pipe(hp, lp, kf, fr, fl))
        del pipe
    if "base" in outs:
        for arm, o in outs.items():
            if arm != "base":
                print(f"agreement base-vs-{arm}: "
                      f"{(o == outs['base']).mean():.6f}", flush=True)
    B = 8
    if any(a.startswith("mg-") for a in arms):
        kf8, fr8, fl8 = build_inputs(B)
        for arm in [a for a in arms if a.startswith("mg-")]:
            P.WARP_T4 = arm == "mg-t4"
            Fn.S2D4_POOL_D2S_BATCH = False
            pipe, hp, lp = make_pipe()
            bench(arm, pipe, hp, lp, kf8, fr8, fl8, frames=B * G)
            del pipe
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
