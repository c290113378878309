"""r5b: production A/B of the two round-5 serving rewrites, camvid-bise18
0.5x GOP12 bf16 720x960 (the headline program):

  base       both flags off (round-4 ship: z12 resize + XLA planes head)
  z4         LR_INPUT_Z4 (gop/pipeline): resize emits the 4x4-unshuffled z4
             layout; z12 + second unshuffle never materialize
  head       USE_FUSED_UPSAMPLE_HEAD (nn/bisenet): CReFF + final_conv + x8
             bilinear + argmax in ONE Pallas kernel (round-5 per-class form)
  both       z4 + head

plus argmax agreement of every arm vs base (z4 expected bitwise on the MXU;
head expected ~0.99+ — float-association flips at class boundaries).

Usage: python probes/r5/tools_probe_r5b.py
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
import arseg_tpu.nn.bisenet as BN

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
        print(f"{name:10s} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
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
    print(f"{name:10s} {t / (frames / G) * 1e3:8.2f} ms/GOP  ({frames / t:7.1f} fps)",
          flush=True)
    return t


def main():
    hr = build_model("camvid-bise18", fuse=False)
    lr = build_model("camvid-bise18", fuse=True)
    from arseg_tpu.utils.tree import cast_f32

    hrp = cast_f32(hr.init(jax.random.PRNGKey(0)), DT)
    lrp = cast_f32(lr.init(jax.random.PRNGKey(1)), DT)
    rng = np.random.RandomState(0)
    kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))

    arms = [
        ("base", False, False),
        ("z4", True, False),
        ("head", False, True),
        ("both", True, True),
    ]
    outs = {}
    for name, z4, head in arms:
        P.LR_INPUT_Z4 = z4
        BN.USE_FUSED_UPSAMPLE_HEAD = head
        pipe = ARPipeline(hr, lr, scale=0.5, dtype=DT)
        t = bench(name, pipe, hrp, lrp, kf, fr, (fx, fy))
        if t is not None:
            outs[name] = np.asarray(pipe(hrp, lrp, kf, fr, (fx, fy)))
    for name in ("z4", "head", "both"):
        if name in outs and "base" in outs:
            agree = float((outs[name] == outs["base"]).mean())
            print(f"agreement {name} vs base: {agree:.6f}", flush=True)


if __name__ == "__main__":
    main()
