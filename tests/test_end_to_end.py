"""Full-stack integration: source PNGs -> native codec pipeline (libx265
encode, decode, MV dump, DP chain-merge — reference
pre-process/generate_compressed_dataset_camvid.py) -> serving layout ->
infer_video CLI (GOP AR pipeline) -> per-frame class maps.

This is the complete L0..L4 path of SURVEY.md §1 in one test: the only
pieces the piecewise tests don't already chain together are the naming/
layout handoff between the native tool and the loader, which is exactly
what this exercises."""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from arseg_tpu.models import build_model
from arseg_tpu.tools.video import load_native
from arseg_tpu.utils.checkpoint import save_checkpoint

native = load_native()
needs_native = pytest.mark.skipif(native is None, reason="native lib unavailable")

H, W, GAP = 96, 128, 6


@needs_native
@pytest.mark.slow
def test_source_frames_to_class_maps(tmp_path):
    # textured content with -2 px/frame global motion (codec gets real MVs)
    rng = np.random.RandomState(11)
    canvas = rng.randint(0, 255, (H, W + 2 * GAP, 3), np.uint8)
    src = tmp_path / "src"
    src.mkdir()
    paths = []
    for f in range(GAP):
        p = src / f"{f:03d}.png"
        Image.fromarray(canvas[:, 2 * f : 2 * f + W]).save(p)
        paths.append(str(p))

    work = tmp_path / "work"
    work.mkdir()
    native.gop_pipeline(paths, str(work), fps=30, bitrate_kbps=1500,
                        gop=GAP, merge_upto=GAP - 1)

    # marshal into the serving layout CamVidWithFlowTest consumes
    # (frames %05d.png, merged MV bins %05d.bin)
    data = tmp_path / "decoded"
    mv = tmp_path / "mv"
    data.mkdir()
    mv.mkdir()
    for i in range(GAP):
        os.link(work / f"decoded-{i + 1:03d}.png", data / f"{i:05d}.png")
        os.link(work / f"merged_test_{i:03d}.bin", mv / f"{i:05d}.bin")

    hr = build_model("camvid-psp18", fuse=False)
    ar = build_model("camvid-psp18", fuse=True)
    save_checkpoint(tmp_path / "hr.ckpt", hr.init(jax.random.PRNGKey(0)))
    save_checkpoint(tmp_path / "ar.ckpt", ar.init(jax.random.PRNGKey(1)))

    from arseg_tpu.cli.infer_video import main

    out = tmp_path / "out"
    main([
        "--data_path", str(data), "--flow_path", str(mv),
        "--out_dir", str(out),
        "--hr_snapshot", str(tmp_path / "hr.ckpt"),
        "--ar_snapshot", str(tmp_path / "ar.ckpt"),
        "--backend", "camvid-psp18", "--ref_gap", str(GAP),
        "--dtype", "float32", "--flow_shape", str(H), str(W),
    ])

    preds = sorted(os.listdir(out))
    assert preds == [f"{i:05d}.png" for i in range(GAP)]
    maps = [np.asarray(Image.open(out / p)) for p in preds]
    assert all(m.shape == (H, W) and m.max() < 12 for m in maps)
