"""r5c: quantify per-dispatch overhead and the clip-mode (scan) serving
rates, camvid-bise18 0.5x GOP12 bf16 720x960.

Round-5 profile: the AR GOP program is ~10.1 ms DEVICE time but ~13.6 ms
wall per dispatch — ~3.5 ms/dispatch of host/tunnel RPC that does not
overlap across calls on the axon harness (the HR-everyframe baseline pays
the same per its dispatch). Production serving on a local host amortizes or
avoids this; ARPipeline.scan_step (one dispatch per K-GOP clip, per-GOP
program unchanged, sequential semantics preserved) is the serving-shaped
way to measure it on this harness.

  ar-1        single-GOP dispatch (the bench headline definition)
  ar-scan4/8  scan_step over K=4/8 GOPs, per-GOP ms = t/K
  hr-12       HR-everyframe, one dispatch per GOP (12 lax.map frames — the
              bench vs_baseline denominator definition)
  hr-scan96   HR-everyframe over 96 frames in ONE dispatch (same per-frame
              lax.map program, 8 GOPs worth)

plus agreement ar-scan8 vs 8x ar-1 (expected exact: identical per-GOP
program) and the implied dispatch overhead + clip-mode vs_baseline.

Usage: python probes/r5/tools_probe_r5c.py
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

    pipe = ARPipeline(hr, lr, scale=0.5, dtype=DT)
    t1 = bench("ar-1", pipe, hrp, lrp, kf, fr, (fx, fy))

    scan = pipe.scan_step()
    res = {}
    for K in (4, 8):
        kfs = jnp.asarray(rng.randn(K, H, W, 3).astype(np.float32))
        frs = jnp.asarray(rng.randn(K, G - 1, H, W, 3).astype(np.float32))
        fxs = jnp.asarray(rng.uniform(-16, 16, (K, G - 1, H, W)).astype(np.float32))
        fys = jnp.asarray(rng.uniform(-16, 16, (K, G - 1, H, W)).astype(np.float32))
        tk = bench(f"ar-scan{K}", scan, hrp, lrp, kfs, frs, fxs, fys,
                   frames=K * G, iters=4)
        if K == 8 and tk is not None:
            # exactness: scan row k == the single-GOP program on GOP k
            clip = np.asarray(scan(hrp, lrp, kfs, frs, fxs, fys))
            ok = True
            for k in range(K):
                one = np.asarray(
                    pipe(hrp, lrp, kfs[k : k + 1], frs[k], (fxs[k], fys[k]))
                )
                ok = ok and bool((clip[k] == one).all())
            print(f"scan8 == 8x single-GOP: {ok}", flush=True)
        res[f"scan{K}"] = tk
        del kfs, frs, fxs, fys

    @jax.jit
    def hr_map(params, batch):
        def chunk(xs):
            out = hr.apply(params, xs.astype(DT))[0]
            out = resize_bilinear(out, (H, W), align_corners=True)
            return jnp.argmax(out, axis=-1)

        return jax.lax.map(chunk, batch.reshape(-1, 1, H, W, 3))

    all12 = jnp.concatenate([kf, fr], axis=0)
    th1 = bench("hr-12", hr_map, hrp, all12)
    all96 = jnp.asarray(rng.randn(96, H, W, 3).astype(np.float32))
    th8 = bench("hr-scan96", hr_map, hrp, all96, frames=96, iters=4)

    if t1 and res.get("scan8") and th1 and th8:
        ar_d = res["scan8"] / 8
        hr_d = th8 / 8
        print(f"AR dispatch overhead: {(t1 - ar_d) * 1e3:+.2f} ms/GOP; "
              f"HR: {(th1 - hr_d) * 1e3:+.2f} ms/GOP", flush=True)
        print(f"clip-mode vs_baseline (scan8 both sides): {hr_d / ar_d:.3f} "
              f"(dispatch-mode: {th1 / t1:.3f})", flush=True)


if __name__ == "__main__":
    main()
