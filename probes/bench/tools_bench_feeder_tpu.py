"""Measure the serving IO pipelining benefit on the real chip: the infer
CLI over a synthetic 30-GOP 720x960 sequence with --prefetch 0 (serial
decode -> H2D -> compute -> D2H -> encode) vs --prefetch 2 (+ writer
thread), and with --gop_batch 8. Generates the sequence under /tmp.

Usage: python tools_bench_feeder_tpu.py [n_gops]
"""
import os
import shutil
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ROOT = "/tmp/feeder_bench"
H, W, G = 720, 960, 12
N_GOPS = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def gen():
    from PIL import Image

    rng = np.random.RandomState(0)
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(f"{ROOT}/decoded")
    os.makedirs(f"{ROOT}/mv")
    base = rng.randint(0, 255, (H, W + 4 * G, 3), np.uint8)  # sliding crop
    for i in range(N_GOPS * G):
        x = (i * 3) % (4 * G)
        Image.fromarray(base[:, x : x + W]).save(f"{ROOT}/decoded/{i:05d}.png")
        rng.randint(-16, 16, (H, W, 2)).astype(np.int16).tofile(
            f"{ROOT}/mv/{i:05d}.bin"
        )
    print(f"generated {N_GOPS} GOPs", flush=True)


def ckpts():
    import jax

    from arseg_tpu.models import build_model
    from arseg_tpu.utils.checkpoint import save_checkpoint

    hr = build_model("camvid-bise18", fuse=False)
    ar = build_model("camvid-bise18", fuse=True)
    save_checkpoint(f"{ROOT}/hr.ckpt", hr.init(jax.random.PRNGKey(0)))
    save_checkpoint(f"{ROOT}/ar.ckpt", ar.init(jax.random.PRNGKey(1)))


def run(tag, extra):
    out = f"{ROOT}/out_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "arseg_tpu.cli.infer_video",
         "--data_path", f"{ROOT}/decoded", "--flow_path", f"{ROOT}/mv",
         "--out_dir", out, "--hr_snapshot", f"{ROOT}/hr.ckpt",
         "--ar_snapshot", f"{ROOT}/ar.ckpt", "--backend", "camvid-bise18",
         "--ref_gap", str(G), "--flow_shape", str(H), str(W)] + extra,
        cwd="/root/repo", capture_output=True, text=True, timeout=3600,
    )
    wall = time.perf_counter() - t0
    line = (r.stdout.strip().splitlines() or ["<no output>"])[-1]
    print(f"{tag:14s} wall {wall:7.1f}s  | {line}", flush=True)
    if r.returncode:
        print(r.stderr[-500:], flush=True)


def encode_streams():
    """Compressed streams for the --video mode (same frames). Returns False
    (skipping the video half) if the native lib is unavailable."""
    from arseg_tpu.tools.video import load_native

    native = load_native()
    if native is None:
        print("native lib unavailable — skipping the video-serving runs",
              flush=True)
        return False
    paths = [f"{ROOT}/decoded/{i:05d}.png" for i in range(N_GOPS * G)]
    native.encode(paths, f"{ROOT}/s.hevc", codec="libx265", gop=G,
                  bitrate_kbps=3000)
    native.encode(paths, f"{ROOT}/s.264", codec="libx264", gop=G,
                  bitrate_kbps=3000)
    return True


def run_video(tag, extra):
    out = f"{ROOT}/out_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "arseg_tpu.cli.infer_video",
         "--video", f"{ROOT}/s.hevc", "--mv_carrier", f"{ROOT}/s.264",
         "--out_dir", out, "--hr_snapshot", f"{ROOT}/hr.ckpt",
         "--ar_snapshot", f"{ROOT}/ar.ckpt", "--backend", "camvid-bise18",
         "--ref_gap", str(G)] + extra,
        cwd="/root/repo", capture_output=True, text=True, timeout=3600,
    )
    wall = time.perf_counter() - t0
    line = (r.stdout.strip().splitlines() or ["<no output>"])[-1]
    print(f"{tag:14s} wall {wall:7.1f}s  | {line}", flush=True)
    if r.returncode:
        print(r.stderr[-500:], flush=True)


if __name__ == "__main__":
    gen()
    ckpts()
    has_video = encode_streams()
    # serial first (also pays the compile); then pipelined (warm cache)
    run("prefetch0", ["--prefetch", "0"])
    run("prefetch2", ["--prefetch", "2", "--io_workers", "4"])
    run("gop_batch8", ["--prefetch", "2", "--io_workers", "4",
                       "--gop_batch", "8"])
    # direct video serving: decode HEVC + carrier in-process, raw uint8 to
    # the device (note: the uint8 feed is a NEW program shape -> one cold
    # compile here; the PNG runs above reuse the warmed f32 cache)
    if has_video:
        run_video("video", ["--prefetch", "2", "--io_workers", "2"])
        run_video("video_batch8", ["--prefetch", "2", "--io_workers", "2",
                                   "--gop_batch", "8"])
    print("DONE", flush=True)
