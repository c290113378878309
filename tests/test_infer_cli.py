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
