"""r5d: the last input-side layout fat in the production GOP program
(camvid-bise18 0.5x GOP12 bf16 720x960), from the round-5 profile:

  * convert/copy chain on the [11,720,960,3] frames entering the fused
    resize (resize.py cast-in-resize materialization): ~0.37 ms/GOP
  * relayout copies on the f32 flow planes entering the H-axis take of the
    flow resize (copy.445/441): ~0.17 ms/GOP

Arms (all value-identical by construction; agreement asserted):

  base      production defaults, f32-staged frames
  bf16f     frames (keyframe + non-key) staged in the serving dtype on the
            host — the jit-boundary cast becomes a no-op, so the in-program
            convert chain vanishes. Same values: CAST_IN_RESIZE casts the
            same f32 numbers at the same point in the math.
  flowmrg   ops.warp.FLOW_MERGED_TAKE: flow-plane H-pass as a merged-row
            gather of the [N*H, W] view (natural layout, no relayout);
            identical elements + lerp expression -> bitwise.
  both      bf16f + flowmrg

plus the HR-everyframe baseline with f32- vs bf16-staged frames (the
denominator must get the same treatment).

Usage: python probes/r5/tools_probe_r5d.py
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
from arseg_tpu.ops import resize_bilinear
import arseg_tpu.ops.warp as W

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
    kf32 = jnp.asarray(rng.randn(1, H, Wd, 3).astype(np.float32))
    fr32 = jnp.asarray(rng.randn(G - 1, H, Wd, 3).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, Wd)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, Wd)).astype(np.float32))
    kf16 = kf32.astype(DT)
    fr16 = fr32.astype(DT)

    outs = {}
    arms = [
        ("base", False, False),
        ("bf16f", True, False),
        ("flowmrg", False, True),
        ("both", True, True),
    ]
    for name, b16, mrg in arms:
        W.FLOW_MERGED_TAKE = mrg
        pipe = ARPipeline(hr, lr, scale=0.5, dtype=DT)
        kf, fr = (kf16, fr16) if b16 else (kf32, fr32)
        t = bench(name, pipe, hrp, lrp, kf, fr, (fx, fy))
        if t is not None:
            outs[name] = np.asarray(pipe(hrp, lrp, kf, fr, (fx, fy)))
    for name in ("bf16f", "flowmrg", "both"):
        if name in outs and "base" in outs:
            print(f"agreement {name} vs base: "
                  f"{float((outs[name] == outs['base']).mean()):.6f}", flush=True)
    W.FLOW_MERGED_TAKE = False

    @jax.jit
    def hr_map(params, batch):
        def chunk(xs):
            out = hr.apply(params, xs.astype(DT))[0]
            out = resize_bilinear(out, (H, Wd), align_corners=True)
            return jnp.argmax(out, axis=-1)

        return jax.lax.map(chunk, batch.reshape(-1, 1, H, Wd, 3))

    all12_32 = jnp.concatenate([kf32, fr32], axis=0)
    bench("hr-f32", hr_map, hrp, all12_32)

    @jax.jit
    def hr_map16(params, batch):
        def chunk(xs):
            out = hr.apply(params, xs)[0]
            out = resize_bilinear(out, (H, Wd), align_corners=True)
            return jnp.argmax(out, axis=-1)

        return jax.lax.map(chunk, batch.reshape(-1, 1, H, Wd, 3))

    all12_16 = all12_32.astype(DT)
    bench("hr-bf16", hr_map16, hrp, all12_16)


if __name__ == "__main__":
    main()
