"""r5h: the LR-scale serving dial under the round-5 clip protocol
(camvid-bise18, GOP 12, bf16-staged frames, scan8 both sides) — the
reference's own ablation axis (checkpoints released for CamVid at
0.3x-0.9x). The HR-everyframe denominator is scale-independent (measured
once, clip-96).

Usage: python probes/r5/tools_probe_r5h.py [scales...]
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

H, W, G, K = 720, 960, 12, 8
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, frames, iters=4, rounds=5):
    try:
        for _ in range(2):
            _sync(fn(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:16s} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
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
    print(f"{name:16s} {t / (frames / G) * 1e3:8.2f} ms/GOP  "
          f"({frames / t:7.1f} fps)", flush=True)
    return t


def main():
    scales = [float(s) for s in sys.argv[1:]] or [0.3, 0.7]
    hr = build_model("camvid-bise18", fuse=False)
    lr = build_model("camvid-bise18", fuse=True)
    from arseg_tpu.utils.tree import cast_f32

    hrp = cast_f32(hr.init(jax.random.PRNGKey(0)), DT)
    lrp = cast_f32(lr.init(jax.random.PRNGKey(1)), DT)
    rng = np.random.RandomState(0)
    kfs = jnp.asarray(rng.randn(K, H, W, 3).astype(np.float32)).astype(DT)
    frs = jnp.asarray(rng.randn(K, G - 1, H, W, 3).astype(np.float32)).astype(DT)
    fxs = jnp.asarray(rng.uniform(-16, 16, (K, G - 1, H, W)).astype(np.float32))
    fys = jnp.asarray(rng.uniform(-16, 16, (K, G - 1, H, W)).astype(np.float32))

    @jax.jit
    def hr_map(params, batch):
        def chunk(xs):
            out = hr.apply(params, xs)[0]
            out = resize_bilinear(out, (H, W), align_corners=True)
            return jnp.argmax(out, axis=-1)

        return jax.lax.map(chunk, batch.reshape(-1, 1, H, W, 3))

    clip = jnp.asarray(rng.randn(K * G, H, W, 3).astype(np.float32)).astype(DT)
    t_hr = bench("hr-clip96", hr_map, hrp, clip, frames=K * G)
    del clip

    for s in scales:
        pipe = ARPipeline(hr, lr, scale=s, dtype=DT)
        scan = pipe.scan_step()
        t = bench(f"ar-{s}x-scan8", scan, hrp, lrp, kfs, frs, fxs, fys,
                  frames=K * G)
        if t and t_hr:
            print(f"  scale {s}: vs_baseline {t_hr / t:.3f}", flush=True)


if __name__ == "__main__":
    main()
