"""Tests for the auxiliary CamVid dataset variants: BiFlow (past+future
keyframes, `dataset/camvid.py:782-1148`), FlowTest (label-free sequence,
`:1153-1426`), CUmap (+SingleBranch, `:1430-1912`), and the N-ary
triple/tripleOF transform family."""

import os
import random

import numpy as np
import pytest
from PIL import Image

from synthetic_data import make_camvid_tree, FLOW_SHAPE, SEQ, DATASET_IDXS, H, W

from arseg_tpu.data import (
    CamVidWithBiFlow,
    CamVidWithFlowTest,
    CamVidwithCUmap,
    CamVidwithCUmapSingleBranch,
)
from arseg_tpu.data import transform as T

CROP = (64, 48)
GOP = 2


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("camvid")
    seq_root = make_camvid_tree(str(root), gop=GOP, splits=("train",))
    rng = np.random.RandomState(1)

    # BiFlow extras: keyframes at decoded_idx -gop and +(12 - gop), plus
    # _last/_next MV bins next to the regular ones
    frame_dir = os.path.join(seq_root, "frames", SEQ)
    mv_dir = os.path.join(seq_root, f"MVmap_GOP{GOP}_dist_{GOP - 1}", SEQ)
    for d_idx in DATASET_IDXS:
        dec_idx = d_idx - 6690 + 31
        for idx in (dec_idx - GOP, dec_idx + (12 - GOP)):
            p = os.path.join(frame_dir, f"{SEQ}_{idx:06d}.png")
            if not os.path.exists(p):
                Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(p)
        for suffix in ("_last", "_next"):
            rng.randint(-8, 8, FLOW_SHAPE).astype(np.int16).tofile(
                os.path.join(mv_dir, f"{SEQ}_{d_idx:06d}{suffix}.bin")
            )

    # CUmap extras: grayscale partition maps under <root>/CUmap/<seq>/
    data_root = os.path.join(seq_root, f"decoded_GOP{GOP}_dist_{GOP - 1}")
    cu_dir = os.path.join(data_root, "CUmap", SEQ)
    os.makedirs(cu_dir, exist_ok=True)
    for d_idx in DATASET_IDXS:
        Image.fromarray(rng.randint(0, 255, (H, W), np.uint8)).save(
            os.path.join(cu_dir, f"{SEQ}_{d_idx:06d}.png")
        )
    return seq_root


def test_biflow_sample(tree):
    data_root = os.path.join(tree, f"decoded_GOP{GOP}_dist_{GOP - 1}")
    ds = CamVidWithBiFlow(
        data_root,
        mode="train",
        cropsize=CROP,
        randomscale=(1.0,),
        ref_gap=GOP,
        ref_path=os.path.join(tree, "frames"),
        flow_path=os.path.join(tree, f"MVmap_GOP{GOP}_dist_{GOP - 1}"),
        flow_shape=FLOW_SHAPE,
        rng=random.Random(0),
    )
    assert len(ds) == len(DATASET_IDXS)
    s = ds[0]
    cw, ch = CROP
    assert s["image"].shape == (ch, cw, 3)
    assert s["ref_image"].shape == (ch, cw, 3)
    assert s["ref_image2"].shape == (ch, cw, 3)
    assert s["flow"].shape == (ch, cw, 2)
    assert s["flow2"].shape == (ch, cw, 2)
    assert s["label"].shape == (ch, cw)
    assert s["existence"].shape == (12,)


def test_flowtest_sample(tmp_path):
    rng = np.random.RandomState(0)
    seq_dir = tmp_path / "decoded"
    ref_dir = tmp_path / "frames"
    flow_dir = tmp_path / "mv"
    for d in (seq_dir, ref_dir, flow_dir):
        d.mkdir()
    for i in range(4):
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        Image.fromarray(img).save(seq_dir / f"{i:05d}.png")
        if i % 2 == 0:  # keyframes for ref_gap=2
            Image.fromarray(img).save(ref_dir / f"{i:05d}.png")
        rng.randint(-8, 8, FLOW_SHAPE).astype(np.int16).tofile(
            flow_dir / f"{i:05d}.bin"
        )
    ds = CamVidWithFlowTest(
        str(seq_dir), ref_gap=2, ref_path=str(ref_dir), flow_path=str(flow_dir),
        flow_shape=FLOW_SHAPE,
    )
    assert len(ds) == 4
    s = ds[3]  # keyframe should be frame 2
    assert s["image"].shape == (H, W, 3)
    assert s["ref_image"].shape == (H, W, 3)
    assert s["flow"].shape == FLOW_SHAPE
    # keyframe lookup: frame 3 -> 3 // 2 * 2 == 2; its decoded PNG exists
    s0 = ds[0]
    np.testing.assert_allclose(s0["image"], s0["ref_image"])


@pytest.mark.parametrize("cls,concat", [(CamVidwithCUmap, True),
                                        (CamVidwithCUmapSingleBranch, False)])
def test_cumap_sample(tree, cls, concat):
    data_root = os.path.join(tree, f"decoded_GOP{GOP}_dist_{GOP - 1}")
    ds = cls(data_root, mode="train", cropsize=CROP, randomscale=(1.0,),
             rng=random.Random(0))
    s = ds[0]
    cw, ch = CROP
    if concat:
        assert s["image"].shape == (ch, cw, 4)
        # 4th channel is the CU map normalized with mean .75 / std .25:
        # values live in [(0-.75)/.25, (1-.75)/.25] = [-3, 1]
        cu = s["image"][..., 3]
        assert cu.min() >= -3.001 and cu.max() <= 1.001
    else:
        assert s["image"].shape == (ch, cw, 3)
        assert s["cumap"].shape == (ch, cw, 1)


def test_triple_transforms_share_draws():
    """One RNG draw applies to all parties; flow labels get the OF
    treatment (x negation on flip, magnitude rescale on scale)."""
    rng_img = np.random.RandomState(0)
    im = Image.fromarray(rng_img.randint(0, 255, (32, 48, 3), np.uint8))
    lb = Image.fromarray(rng_img.randint(0, 12, (32, 48), np.uint8))
    flow = rng_img.uniform(-4, 4, (32, 48, 2)).astype(np.float32)

    flip = T.TripleOFHorizontalFlip(p=1.1, rng=random.Random(0))  # always flip
    a, b, c = flip(dict(im=im, lb=lb), dict(im=im, lb=flow), dict(im=im, lb=flow))
    np.testing.assert_allclose(np.asarray(a["im"]), np.asarray(im)[:, ::-1])
    np.testing.assert_allclose(b["lb"][..., 0], -flow[:, ::-1, 0])
    np.testing.assert_allclose(c["lb"][..., 1], flow[:, ::-1, 1])

    scale = T.TripleOFRandomScaleV2((2.0,), rng=random.Random(0))
    a, b, c = scale(dict(im=im, lb=lb), dict(im=im, lb=flow), dict(im=im, lb=flow))
    assert a["im"].size == (96, 64)
    assert b["lb"].shape == (64, 96, 2)
    # V2 multiplies MV magnitude by the scale (transform.py:292-320)
    assert np.isclose(np.abs(b["lb"]).max(), 2 * np.abs(flow).max())

    crop = T.TripleOFRandomCrop((24, 16), rng=random.Random(0))
    a, b, c = crop(dict(im=im, lb=lb), dict(im=im, lb=flow), dict(im=im, lb=flow))
    assert a["im"].size == (24, 16)
    assert b["lb"].shape == (16, 24, 2)
    assert np.asarray(a["lb"]).shape == (16, 24)
