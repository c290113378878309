"""r5a: production A/B of the fused upsample+argmax head (round-5 per-class
rewrite of ops/pallas_creff.creff_phase2_upsample_argmax — compiles on this
toolchain, unlike the rank-3 round-3 form).

  off   production AR pipeline (camvid-bise18 0.5x GOP12 bf16), XLA
        channel-major planes head (bisenet.forward_phase2_argmax composed)
  on    USE_FUSED_UPSAMPLE_HEAD=True: CReFF + final_conv + x8 bilinear +
        argmax in ONE Pallas kernel (no fused-feature / logit HBM traffic)

plus argmax agreement on-vs-off (expected ~0.99+: float-association flips
at class boundaries — lane-reduction final conv vs MXU dot, and a
col-then-row upsample order; same caveat class as the planes head itself).

Usage: python probes/r5/tools_probe_r5a.py
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

    outs = {}
    for flag in (False, True):
        BN.USE_FUSED_UPSAMPLE_HEAD = flag
        pipe = ARPipeline(hr, lr, scale=0.5, dtype=DT)
        name = "on" if flag else "off"
        t = bench(name, pipe, hrp, lrp, kf, fr, (fx, fy))
        if t is not None:
            outs[name] = np.asarray(pipe(hrp, lrp, kf, fr, (fx, fy)))
    if len(outs) == 2:
        agree = float((outs["on"] == outs["off"]).mean())
        print(f"argmax agreement on-vs-off: {agree:.6f}", flush=True)


if __name__ == "__main__":
    main()
