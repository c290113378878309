"""User-facing eval-protocol wall-clock at REAL CamVid shapes (VERDICT r3
next-#6): run the full 12-distance mIoU_d protocol (HR + LR + AR) on a
synthetic tree at 720x960 / flow [720,960,2] on the chip, verify the compile
count stays bounded (the engines share one compiled step per (engine, scale)
across all 12 distances — SURVEY §7's static-shape risk), and report
minutes-per-protocol extrapolated to the real CamVid test set (233 frames).

Usage: python tools_protocol_walltime_tpu.py [n_frames=4] [backbone=bise18]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from synthetic_data import make_camvid_tree  # noqa: E402
from arseg_tpu.models import build_model  # noqa: E402
from arseg_tpu.utils.checkpoint import save_checkpoint  # noqa: E402
from arseg_tpu.eval.protocol import run_protocol  # noqa: E402

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 4
BACKBONE = sys.argv[2] if len(sys.argv) > 2 else "bise18"
GOP, H, W = 12, 720, 960
REAL_TEST_FRAMES = 233  # CamVid test split size (reference README.md:79-93)

tmp = tempfile.mkdtemp(prefix="arseg-proto-wall-")
idxs = [6690 + 30 * i for i in range(N_FRAMES)]
t0 = time.perf_counter()
make_camvid_tree(os.path.join(tmp, "data"), gop=GOP, h=H, w=W,
                 flow_shape=(H, W, 2), dataset_idxs=idxs)
print(f"tree ({N_FRAMES} frames x {GOP} dists @ {H}x{W}) in "
      f"{time.perf_counter() - t0:.0f}s", flush=True)

ck = os.path.join(tmp, "ckpt")
for sub, key, scale in [("HR", 0, "1.0"), ("AR", 1, "0.5"), ("LR", 2, "0.5")]:
    d = os.path.join(ck, f"camvid-{BACKBONE}", sub)
    os.makedirs(d)
    m = build_model(f"camvid-{BACKBONE}", fuse=(sub != "HR"))
    save_checkpoint(os.path.join(d, f"PSPNet_resnet18_{scale}_1_.npz"),
                    m.init(jax.random.PRNGKey(key)), {"scale": float(scale)})

# compile-count boundedness is evidenced by the cold-vs-warm gap below: one
# compiled step per (engine, scale) serves all 12 distances, so the warm
# pass contains zero compiles and its fps is the protocol's steady state
times = {}
for mode, name in (((1, 0, 0), "HR"), ((0, 1, 0), "LR"), ((0, 0, 1), "AR")):
    t0 = time.perf_counter()
    run_protocol(
        dataset="camvid", backbone=BACKBONE, mode=mode, gop=GOP,
        test_scale=0.5, data_root=os.path.join(tmp, "data"), ckpt_root=ck,
        result_dir=os.path.join(tmp, "results"), num_workers=2, verbose=True,
        flow_shape=(H, W, 2), dtype=jnp.bfloat16,
    )
    times[name] = time.perf_counter() - t0
    print(f"{name}: {times[name]:.1f}s for {N_FRAMES * GOP} frame-evals "
          f"({N_FRAMES * GOP / times[name]:.1f} fps incl. compile)", flush=True)
    # steady-state: re-run (everything compiled + persistent cache warm)
    t0 = time.perf_counter()
    run_protocol(
        dataset="camvid", backbone=BACKBONE, mode=mode, gop=GOP,
        test_scale=0.5, data_root=os.path.join(tmp, "data"), ckpt_root=ck,
        result_dir=os.path.join(tmp, "results"), num_workers=2, verbose=True,
        flow_shape=(H, W, 2), dtype=jnp.bfloat16,
    )
    warm = time.perf_counter() - t0
    fps = N_FRAMES * GOP / warm
    times[name + "_warm"] = warm
    est_min = REAL_TEST_FRAMES * GOP / fps / 60
    print(f"{name} warm: {warm:.1f}s ({fps:.1f} fps) -> real CamVid "
          f"{REAL_TEST_FRAMES}x{GOP} ~= {est_min:.1f} min", flush=True)

total_warm = sum(v for k, v in times.items() if k.endswith("_warm"))
total_fps = 3 * N_FRAMES * GOP / total_warm
print("SUMMARY", {k: round(v, 1) for k, v in times.items()},
      f"full 3-mode protocol on real CamVid ~= "
      f"{3 * REAL_TEST_FRAMES * GOP / total_fps / 60:.1f} min", flush=True)
print("DONE", flush=True)
