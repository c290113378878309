"""End-to-end quickstart on synthetic data, CPU-only — no datasets, no
checkpoints, no TPU needed.

    python examples/quickstart.py [workdir]

Walks the whole serving journey a reference user would take:
  1. build the native video runtime (make -C native),
  2. synthesize a 2-GOP 96x128 clip and encode it to HEVC with the
     analysis sidecar (the encoder's own per-PU motion vectors — the
     HEVC-native MV source; an H.264 carrier remains the fallback for
     pre-encoded foreign streams),
  3. initialize HR + AR(fuse) camvid-bise18 models and save checkpoints
     (real deployments convert the released .pth via `arseg-convert`),
  4. serve STRAIGHT from the compressed streams (`--video`) — in-process
     decode, in-memory MV merge, raw uint8 to the device,
  5. export the AR checkpoint back to a reference-layout .pth
     (`--to_torch`) to show the deploy-back path.

Swap step 3 for converted real checkpoints and step 2 for your own video
to serve real content; see MIGRATION.md for the full command map.
"""

import os
import sys

workdir = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else "/tmp/arseg_quickstart")
os.makedirs(workdir, exist_ok=True)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from PIL import Image  # noqa: E402

H, W, GAP, N = 96, 128, 6, 12

# -- 1+2: native runtime + synthetic clip -> the two compressed streams ----
from arseg_tpu.tools.video import load_native  # noqa: E402

native = load_native()
if native is None:
    raise SystemExit("native build failed — check the FFmpeg dev packages "
                     "(libavcodec/libavformat/libswscale headers)")
rng = np.random.RandomState(0)
canvas = rng.randint(0, 255, (H, W + 2 * N, 3), np.uint8).astype(np.int32)
canvas = (canvas + np.roll(canvas, 1, 0) + np.roll(canvas, 1, 1)) // 3
canvas = canvas.astype(np.uint8)
frames_dir = os.path.join(workdir, "frames")
os.makedirs(frames_dir, exist_ok=True)
paths = []
for i in range(N):
    p = os.path.join(frames_dir, f"{i:03d}.png")
    Image.fromarray(canvas[:, 2 * i : 2 * i + W]).save(p)
    paths.append(p)
hevc = os.path.join(workdir, "clip.hevc")
analysis = hevc + ".analysis"
# HEVC-native MVs: the encode dumps its own analysis data (per-PU MVs —
# the bitstream's actual motion field); no carrier stream needed. For
# pre-encoded video of foreign provenance, encode a carrier instead:
#   native.encode(paths, "clip.264", codec="libx264", gop=GAP, ...)
# and serve with --mv_carrier clip.264.
native.encode_analysis(paths, hevc, analysis, gop=GAP, bitrate_kbps=2000)
print(f"[2/5] encoded {N} frames -> {hevc} + analysis sidecar (HEVC MVs)")

# -- 3: models + checkpoints ------------------------------------------------
from arseg_tpu.models import build_model  # noqa: E402
from arseg_tpu.utils.checkpoint import save_checkpoint  # noqa: E402

hr = build_model("camvid-bise18", fuse=False)
ar = build_model("camvid-bise18", fuse=True)
hr_ckpt = os.path.join(workdir, "hr.ckpt")
ar_ckpt = os.path.join(workdir, "ar.ckpt")
save_checkpoint(hr_ckpt, hr.init(jax.random.PRNGKey(0)))
save_checkpoint(ar_ckpt, ar.init(jax.random.PRNGKey(1)))
print("[3/5] camvid-bise18 HR + AR(fuse) checkpoints saved (random weights "
      "— convert released .pth via arseg-convert for real predictions)")

# -- 4: serve directly from the compressed streams --------------------------
from arseg_tpu.cli.infer_video import main as infer_main  # noqa: E402

out_dir = os.path.join(workdir, "out")
infer_main([
    "--video", hevc, "--mv_analysis", analysis, "--out_dir", out_dir,
    "--hr_snapshot", hr_ckpt, "--ar_snapshot", ar_ckpt,
    "--backend", "camvid-bise18", "--ref_gap", str(GAP),
    "--dtype", "float32", "--colorize",
])
print(f"[4/5] class maps in {out_dir} ({len(os.listdir(out_dir))} PNGs)")

# -- 5: deploy-back export ---------------------------------------------------
from arseg_tpu.cli.convert import main as convert_main  # noqa: E402

pth = os.path.join(workdir, "ar_for_torch.pth")
convert_main([ar_ckpt, pth, "--backend", "camvid-bise18", "--to_torch"])
print(f"[5/5] reference-layout state_dict at {pth} "
      "(loads strict=True into the reference BiSeNetV1WithFuse)")
print("quickstart complete:", workdir)
