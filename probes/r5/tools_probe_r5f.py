"""r5f: production A/B of the r5e candidates on the full camvid-bise18 AR
program (0.5x GOP12 bf16 720x960, bf16-staged frames):

  base        production defaults (pool d2s, CReFF th auto -> 30)
  pool-half   S2D4_POOL_HALF_D2S_BATCH (bitwise; -0.30 isolated in r5e)
  th18        ARSEG_CREFF_TH=18 (r5e isolated sweep: th18 fastest; the
              isolated wrapper differs from production — lr_prepadded path
              — so this decides) [runs in a subprocess: the env is read at
              trace time]
  both        pool-half + th18

Arms with env changes run as subprocesses of THIS script; each prints one
line. Usage: python probes/r5/tools_probe_r5f.py [arm]
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

ARMS = ("base", "pool-half", "th18", "both")


def run_arm(arm):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from arseg_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from arseg_tpu.models import build_model
    from arseg_tpu.gop import ARPipeline
    import arseg_tpu.nn.functional as Fn
    from arseg_tpu.utils.tree import cast_f32

    if arm in ("pool-half", "both"):
        Fn.S2D4_POOL_HALF_D2S_BATCH = True

    H, Wd, G = 720, 960, 12
    DT = jnp.bfloat16
    hr = build_model("camvid-bise18", fuse=False)
    lr = build_model("camvid-bise18", fuse=True)
    hrp = cast_f32(hr.init(jax.random.PRNGKey(0)), DT)
    lrp = cast_f32(lr.init(jax.random.PRNGKey(1)), DT)
    rng = np.random.RandomState(0)
    kf = jnp.asarray(rng.randn(1, H, Wd, 3).astype(np.float32)).astype(DT)
    fr = jnp.asarray(rng.randn(G - 1, H, Wd, 3).astype(np.float32)).astype(DT)
    fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, Wd)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, Wd)).astype(np.float32))
    pipe = ARPipeline(hr, lr, scale=0.5, dtype=DT)

    def _sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf[(0,) * leaf.ndim])

    for _ in range(2):
        _sync(pipe(hrp, lrp, kf, fr, (fx, fy)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = None
        for _ in range(8):
            out = pipe(hrp, lrp, kf, fr, (fx, fy))
        _sync(out)
        ts.append((time.perf_counter() - t0) / 8)
    t = sorted(ts)[len(ts) // 2]
    print(f"{arm:10s} {t * 1e3:8.2f} ms/GOP  ({G / t:7.1f} fps)", flush=True)
    # checksum for cross-arm agreement (class-map histogram + sample)
    o = np.asarray(pipe(hrp, lrp, kf, fr, (fx, fy)))
    print(f"{arm:10s} checksum {int(o.astype(np.int64).sum())} "
          f"corner {o[0, :2, :2].tolist()} {o[-1, -1, -4:].tolist()}", flush=True)


def main():
    if len(sys.argv) > 1:
        run_arm(sys.argv[1])
        return
    for arm in ARMS:
        env = dict(os.environ)
        if arm in ("th18", "both"):
            env["ARSEG_CREFF_TH"] = "18"
        r = subprocess.run(
            [sys.executable, __file__, arm], env=env, timeout=3000,
            capture_output=True, text=True)
        for ln in r.stdout.splitlines():
            if ln.startswith(arm):
                print(ln, flush=True)
        if r.returncode:
            print(f"{arm} rc={r.returncode}: {r.stderr[-300:]}", flush=True)


if __name__ == "__main__":
    main()
