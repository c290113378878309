"""Host half of the serving-pipeline equation: GOPFeeder decode+assembly
throughput (PNG decode + merged-MV read + flow-plane split), no device.

Steady-state pipelined serving runs at max(device GOP time, host decode
time) (gop/feeder.py). The device side is measured at 748.7 fps/chip
(camvid-bise18, PERF.md); this prints the host side per worker count, i.e.
how many io_workers keep the host from becoming the bound — and the honest
ceiling if it is one anyway.

Usage: python tools_bench_feeder_host.py [n_gops] (default 20)
"""
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ROOT = "/tmp/feeder_host_bench"
H, W, G = 720, 960, 12
N_GOPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def gen():
    from PIL import Image

    rng = np.random.RandomState(0)
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(f"{ROOT}/decoded")
    os.makedirs(f"{ROOT}/mv")
    # natural-image-like content (smoothed noise): pure noise PNGs neither
    # compress nor decode at representative rates
    base = rng.randint(0, 255, (H // 8, (W + 4 * G) // 8, 3), np.uint8)
    base = np.kron(base, np.ones((8, 8, 1), np.uint8))
    for i in range(N_GOPS * G):
        x = (i * 3) % (4 * G)
        Image.fromarray(base[:, x : x + W]).save(f"{ROOT}/decoded/{i:05d}.png")
        rng.randint(-16, 16, (H, W, 2)).astype(np.int16).tofile(
            f"{ROOT}/mv/{i:05d}.bin"
        )
    print(f"generated {N_GOPS} GOPs ({N_GOPS*G} frames)", flush=True)


def main():
    from arseg_tpu.data.camvid import CamVidWithFlowTest
    from arseg_tpu.gop.feeder import GOPFeeder

    gen()
    ds = CamVidWithFlowTest(
        f"{ROOT}/decoded", ref_gap=G, ref_path=f"{ROOT}/decoded",
        flow_path=f"{ROOT}/mv", flow_shape=(H, W, 2),
    )
    for workers in (1, 2, 4, 8):
        feeder = GOPFeeder(ds, G, num_workers=workers, depth=2, stage=False)
        it = iter(feeder)
        next(it)  # warm the worker pool / page cache
        t0 = time.perf_counter()
        n = 1
        for _ in it:
            n += 1
        dt = time.perf_counter() - t0
        fps = (n - 1) * G / dt
        print(f"png io_workers={workers}: {fps:7.1f} frames/s host "
              f"decode+assembly ({dt/(n-1)*1e3:.1f} ms/GOP)", flush=True)

    # direct video source (gop/video_source.py): HEVC frames + H.264 MV
    # carrier decoded in-process, per-GOP in-memory merge — the serving
    # path that replaces the PNG/bin round trip above
    from arseg_tpu.tools.video import load_native
    from arseg_tpu.gop.video_source import VideoGOPSource

    native = load_native()
    if native is None:
        print("native lib unavailable (make -C native failed) — skipping "
              "the video-source half", flush=True)
        return
    paths = [f"{ROOT}/decoded/{i:05d}.png" for i in range(N_GOPS * G)]
    native.encode(paths, f"{ROOT}/s.hevc", codec="libx265", gop=G,
                  bitrate_kbps=3000)
    native.encode(paths, f"{ROOT}/s.264", codec="libx264", gop=G,
                  bitrate_kbps=3000)
    for tag, devnorm in (("host-norm", False), ("dev-norm", True)):
        src = VideoGOPSource(f"{ROOT}/s.hevc", f"{ROOT}/s.264", G,
                             (0.4, 0.4, 0.4), (0.3, 0.3, 0.3),
                             device_normalize=devnorm)
        feeder = GOPFeeder(src, G, depth=2, stage=False)
        it = iter(feeder)
        next(it)
        t0 = time.perf_counter()
        n = 1
        for _ in it:
            n += 1
        dt = time.perf_counter() - t0
        fps = (n - 1) * G / dt
        print(f"video ({tag}): {fps:7.1f} frames/s host decode+merge+"
              f"assembly ({dt/(n-1)*1e3:.1f} ms/GOP)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
