"""infer_video CLI smoke: the label-free serving path end-to-end — synthetic
decoded sequence + MV bins -> GOP pipeline -> per-frame class-map PNGs
(reference flow: `dataset/camvid.py:1153-1426` loader + `evaluation.py`
per-frame argmax maps)."""

import os

import numpy as np
import jax
import pytest
from PIL import Image

from arseg_tpu.models import build_model
from arseg_tpu.utils.checkpoint import save_checkpoint

H, W = 48, 64
GAP = 4
N = 8  # two GOPs


@pytest.mark.slow
def test_infer_video_cli(tmp_path):
    rng = np.random.RandomState(0)
    data = tmp_path / "decoded"
    flows = tmp_path / "mv"
    out = tmp_path / "out"
    data.mkdir()
    flows.mkdir()
    for i in range(N):
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
            data / f"{i:05d}.png"
        )
        rng.randint(-8, 8, (H // 2, W // 2, 2)).astype(np.int16).tofile(
            flows / f"{i:05d}.bin"
        )

    hr = build_model("camvid-psp18", fuse=False)
    ar = build_model("camvid-psp18", fuse=True)
    save_checkpoint(tmp_path / "hr.ckpt", hr.init(jax.random.PRNGKey(0)))
    save_checkpoint(tmp_path / "ar.ckpt", ar.init(jax.random.PRNGKey(1)))

    from arseg_tpu.cli.infer_video import main

    main([
        "--data_path", str(data), "--flow_path", str(flows),
        "--out_dir", str(out),
        "--hr_snapshot", str(tmp_path / "hr.ckpt"),
        "--ar_snapshot", str(tmp_path / "ar.ckpt"),
        "--backend", "camvid-psp18", "--ref_gap", str(GAP),
        "--dtype", "float32", "--flow_shape", str(H // 2), str(W // 2),
    ])

    preds = sorted(os.listdir(out))
    assert preds == [f"{i:05d}.png" for i in range(N)]
    arr = np.asarray(Image.open(out / "00003.png"))
    assert arr.shape == (H, W) and arr.max() < 12


@pytest.mark.slow
def test_infer_video_cli_streams(tmp_path):
    """Multi-stream sharded serving (--streams over a 2-device mesh) must
    write, per stream, exactly the single-stream pipeline's outputs."""
    rng = np.random.RandomState(7)
    streams = []
    for s in range(2):
        data = tmp_path / f"dec{s}"
        flows = tmp_path / f"mv{s}"
        data.mkdir()
        flows.mkdir()
        for i in range(GAP):  # one GOP per stream
            Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
                data / f"{i:05d}.png"
            )
            rng.randint(-8, 8, (H // 2, W // 2, 2)).astype(np.int16).tofile(
                flows / f"{i:05d}.bin"
            )
        streams.append(f"{data}:{flows}")

    hr = build_model("camvid-psp18", fuse=False)
    ar = build_model("camvid-psp18", fuse=True)
    save_checkpoint(tmp_path / "hr.ckpt", hr.init(jax.random.PRNGKey(0)))
    save_checkpoint(tmp_path / "ar.ckpt", ar.init(jax.random.PRNGKey(1)))

    from arseg_tpu.cli.infer_video import main

    common = [
        "--out_dir", str(tmp_path / "multi"),
        "--hr_snapshot", str(tmp_path / "hr.ckpt"),
        "--ar_snapshot", str(tmp_path / "ar.ckpt"),
        "--backend", "camvid-psp18", "--ref_gap", str(GAP),
        "--dtype", "float32", "--flow_shape", str(H // 2), str(W // 2),
    ]
    main(common + ["--streams", ",".join(streams), "--num_devices", "2"])

    # reference: each stream through the plain single-stream CLI
    for s in range(2):
        out = tmp_path / f"single{s}"
        main([
            "--data_path", str(tmp_path / f"dec{s}"),
            "--flow_path", str(tmp_path / f"mv{s}"),
            "--out_dir", str(out),
            "--hr_snapshot", str(tmp_path / "hr.ckpt"),
            "--ar_snapshot", str(tmp_path / "ar.ckpt"),
            "--backend", "camvid-psp18", "--ref_gap", str(GAP),
            "--dtype", "float32", "--flow_shape", str(H // 2), str(W // 2),
        ])
        for i in range(GAP):
            a = np.asarray(Image.open(tmp_path / "multi" / f"s{s}" / f"{i:05d}.png"))
            b = np.asarray(Image.open(out / f"{i:05d}.png"))
            np.testing.assert_array_equal(a, b)


# ---- shared fixtures for the video-mode composition tests -----------------


@pytest.fixture(scope="module")
def video_fx(tmp_path_factory):
    """One synthetic clip encoded once + camvid-psp18 checkpoints + the
    baseline single-device --video output, shared by every video-mode test
    (each previously rebuilt models, re-encoded, and re-ran the baseline)."""
    from arseg_tpu.tools.video import load_native

    native = load_native()
    if native is None:
        pytest.skip("native lib unavailable")
    root = tmp_path_factory.mktemp("videocli")
    rng = np.random.RandomState(11)
    canvas = rng.randint(0, 255, (H, W + 32, 3), np.uint8).astype(np.int32)
    canvas = (canvas + np.roll(canvas, 1, 0) + np.roll(canvas, 1, 1)) // 3
    canvas = canvas.astype(np.uint8)
    srcdir = root / "src"
    srcdir.mkdir()
    paths = []
    for i in range(N):
        pth = srcdir / f"{i:03d}.png"
        Image.fromarray(canvas[:, 2 * i : 2 * i + W]).save(pth)
        paths.append(str(pth))
    hevc = str(root / "s.hevc")
    carrier = str(root / "s.264")
    native.encode(paths, hevc, codec="libx265", gop=GAP, bitrate_kbps=2000)
    native.encode(paths, carrier, codec="libx264", gop=GAP, bitrate_kbps=2000)
    hr = build_model("camvid-psp18", fuse=False)
    ar = build_model("camvid-psp18", fuse=True)
    save_checkpoint(root / "hr.ckpt", hr.init(jax.random.PRNGKey(0)))
    save_checkpoint(root / "ar.ckpt", ar.init(jax.random.PRNGKey(1)))
    common = [
        "--hr_snapshot", str(root / "hr.ckpt"),
        "--ar_snapshot", str(root / "ar.ckpt"),
        "--backend", "camvid-psp18", "--ref_gap", str(GAP),
        "--dtype", "float32",
    ]
    from arseg_tpu.cli.infer_video import main

    base_out = root / "out_video"
    main(["--video", hevc, "--mv_carrier", carrier,
          "--out_dir", str(base_out)] + common)
    assert sorted(os.listdir(base_out)) == [f"{i:05d}.png" for i in range(N)]
    return native, root, hevc, carrier, common, base_out


def _assert_same_maps(out_dir, base_out):
    got = sorted(os.listdir(out_dir))
    assert got == [f"{i:05d}.png" for i in range(N)]
    for name in got:
        a = np.asarray(Image.open(os.path.join(out_dir, name)))
        b = np.asarray(Image.open(os.path.join(base_out, name)))
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_infer_video_cli_direct_video(video_fx, tmp_path):
    """--video serving: compressed HEVC + H.264 carrier straight to class
    maps. Output must equal the file-based path run on the SAME decoded
    frames + merged MVs (the artifacts the video mode replaces)."""
    native, root, hevc, carrier, common, base_out = video_fx
    from arseg_tpu.cli.infer_video import main

    dec = tmp_path / "dec"
    mvdir = tmp_path / "mvdump"
    flows = tmp_path / "mv"
    dec.mkdir()
    mvdir.mkdir()
    flows.mkdir()
    native.decode(hevc, str(dec))
    native.mvdump(carrier, str(mvdir))
    data = tmp_path / "decoded"
    data.mkdir()
    for i in range(N):
        os.rename(dec / f"decoded-{i + 1:03d}.png", data / f"{i:05d}.png")
    for g0 in range(0, N, GAP):
        bins = np.stack([
            np.fromfile(mvdir / f"test_{g0 + d:03d}.bin", np.int16).reshape(H, W, 3)
            for d in range(1, GAP)
        ])
        merged = native.merge_mv(bins, max_ref=GAP)
        for d in range(GAP):
            merged[d].astype(np.int16).tofile(flows / f"{g0 + d:05d}.bin")

    out_f = tmp_path / "out_files"
    main([
        "--data_path", str(data), "--flow_path", str(flows),
        "--out_dir", str(out_f), "--flow_shape", str(H), str(W),
    ] + common)
    _assert_same_maps(out_f, base_out)


@pytest.mark.slow
def test_infer_video_cli_video_streams(video_fx, tmp_path):
    """--streams accepts direct-video specs: two video streams (the shared
    clip + a distinct second clip, so stream-index crosswiring would show)
    over a 2-device mesh must reproduce the single-stream --video outputs
    per stream."""
    native, root, hevc, carrier, common, base_out = video_fx
    from arseg_tpu.cli.infer_video import main

    rng = np.random.RandomState(13)
    canvas = rng.randint(0, 255, (H, W + 16, 3), np.uint8).astype(np.int32)
    canvas = (canvas + np.roll(canvas, 1, 0) + np.roll(canvas, 1, 1)) // 3
    canvas = canvas.astype(np.uint8)
    src2 = tmp_path / "src2"
    src2.mkdir()
    paths = []
    for i in range(GAP):  # one GOP second stream (ragged lengths ok)
        pth = src2 / f"{i:03d}.png"
        Image.fromarray(canvas[:, 2 * i : 2 * i + W]).save(pth)
        paths.append(str(pth))
    hevc2 = str(tmp_path / "s2.hevc")
    carrier2 = str(tmp_path / "s2.264")
    native.encode(paths, hevc2, codec="libx265", gop=GAP, bitrate_kbps=2000)
    native.encode(paths, carrier2, codec="libx264", gop=GAP, bitrate_kbps=2000)
    base2 = tmp_path / "out_single2"
    main(["--video", hevc2, "--mv_carrier", carrier2,
          "--out_dir", str(base2)] + common)

    out_multi = tmp_path / "out_multi"
    main(["--streams", f"{hevc}:{carrier},{hevc2}:{carrier2}",
          "--num_devices", "2", "--out_dir", str(out_multi)] + common)
    # streams serve min(len) GOPs: one GOP from each stream
    for s, base in ((0, base_out), (1, base2)):
        got = sorted(os.listdir(out_multi / f"s{s}"))
        assert got == [f"{i:05d}.png" for i in range(GAP)]
        for name in got:
            a = np.asarray(Image.open(out_multi / f"s{s}" / name))
            b = np.asarray(Image.open(os.path.join(base, name)))
            np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_infer_video_cli_gop_devices(video_fx, tmp_path):
    """--gop_devices (frame-parallel latency mode) must write the same
    class maps as the single-device run — composed with --video."""
    native, root, hevc, carrier, common, base_out = video_fx
    from arseg_tpu.cli.infer_video import main

    outn = tmp_path / "outn"
    main(["--video", hevc, "--mv_carrier", carrier,
          "--out_dir", str(outn), "--gop_devices", "2"] + common)
    _assert_same_maps(outn, base_out)


@pytest.mark.slow
def test_infer_video_cli_video_gop_batch(video_fx, tmp_path):
    """--video composed with --gop_batch (uint8 multi-GOP stacks through
    the device-side normalize) must match the unbatched --video outputs."""
    native, root, hevc, carrier, common, base_out = video_fx
    from arseg_tpu.cli.infer_video import main

    outb = tmp_path / "outb"
    main(["--video", hevc, "--mv_carrier", carrier,
          "--out_dir", str(outb), "--gop_batch", "2"] + common)
    _assert_same_maps(outb, base_out)
