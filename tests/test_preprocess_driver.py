"""End-to-end smoke of the compressed-dataset generation driver
(tools/preprocess.generate_compressed_camvid): from a raw CamVid-shaped
tree (full video frames + annotated labels) it must produce the exact
directory/naming contract the datasets consume — and the produced tree
must actually load through CamVidWithFlow (reference
pre-process/generate_compressed_dataset_camvid.py:99-294)."""

import os

import numpy as np
import pytest
from PIL import Image

from arseg_tpu.tools.video import load_native

native = load_native()
needs_native = pytest.mark.skipif(native is None, reason="native lib unavailable")

SCENE = "0001TP"  # dataset_start 6690, encoded_start 31 -> offset 6659
H, W = 96, 128
GOP = 4


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    """16 raw video frames with global motion + ONE annotated test frame at
    encoded idx 34 (dataset idx 6693)."""
    root = tmp_path_factory.mktemp("raw")
    rng = np.random.RandomState(3)
    canvas = rng.randint(0, 255, (H, W + 64, 3), np.uint8).astype(np.int32)
    canvas = (canvas + np.roll(canvas, 1, 0) + np.roll(canvas, 1, 1)) // 3
    canvas = canvas.astype(np.uint8)

    frames_dir = root / "seq" / "frames" / SCENE
    frames_dir.mkdir(parents=True)
    for i, enc in enumerate(range(31, 47)):
        Image.fromarray(canvas[:, 2 * i : 2 * i + W]).save(
            frames_dir / f"{SCENE}_{enc:06d}.png"
        )

    camvid = root / "camvid"
    (camvid / "test").mkdir(parents=True)
    (camvid / "test_labels_with_ignored").mkdir()
    name = f"{SCENE}_006693.png"  # encoded 34 -> pos 3 in the 16-frame list
    Image.fromarray(canvas[:, 6 : 6 + W]).save(camvid / "test" / name)
    label = rng.randint(0, 12, (H, W)).astype(np.uint8)
    Image.fromarray(label).save(camvid / "test_labels_with_ignored" / name)
    return root


@needs_native
def test_generate_compressed_camvid_contract(raw_tree):
    from arseg_tpu.data.camvid import CamVidWithFlow
    from arseg_tpu.tools.preprocess import generate_compressed_camvid

    out_root = generate_compressed_camvid(
        str(raw_tree / "camvid"),
        str(raw_tree / "seq"),
        ref_gap=GOP,
        bitrate=1000,
        splits=("test",),
        key_dists=(0, 3),
        progress=lambda *a: None,
    )
    assert out_root == str(raw_tree / "seq" / f"1M-GOP{GOP}")
    name = f"{SCENE}_006693.png"

    # decoded annotated frame at both distances
    for d in (0, 3):
        p = os.path.join(out_root, f"decoded_GOP{GOP}_dist_{d}", "test", name)
        assert os.path.exists(p), p
        assert Image.open(p).size == (W, H)

    # labels ride along by symlink
    lbl = os.path.join(out_root, f"decoded_GOP{GOP}_dist_{d}",
                       "test_labels_with_ignored", name)
    assert os.path.exists(lbl)

    # merged MV bin only at distance > 0, int16 [H, W, 2]
    assert not os.path.exists(
        os.path.join(out_root, f"MVmap_GOP{GOP}_dist_0", SCENE, name[:-4] + ".bin")
    )
    mv_path = os.path.join(out_root, f"MVmap_GOP{GOP}_dist_3", SCENE, name[:-4] + ".bin")
    mv = np.fromfile(mv_path, np.int16)
    assert mv.size == H * W * 2

    # the keyframe the dataset's ref_frame_path will look for (enc 34 - 3)
    key = os.path.join(out_root, "frames", SCENE, f"{SCENE}_{34 - 3:06d}.png")
    assert os.path.exists(key)

    # and the produced tree actually loads through the dataset
    ds = CamVidWithFlow(
        os.path.join(out_root, f"decoded_GOP{GOP}_dist_3"),
        mode="test", load_pair=True, ref_gap=GOP,
        flow_path=os.path.join(out_root, f"MVmap_GOP{GOP}_dist_3"),
        ref_path=os.path.join(out_root, "frames"),
        flow_shape=(H, W, 2),
    )
    assert len(ds) == 1
    sample = ds[0]
    assert sample["image"].shape == (H, W, 3)
    assert sample["ref_image"].shape == (H, W, 3)
    assert sample["flow"].shape[-1] == 2


@needs_native
def test_generate_compressed_cityscapes_contract(tmp_path):
    """Cityscapes flavor: the annotated frame is index 19 of each 30-frame
    snippet; windows end at the annotated frame (reference
    ..._cityscapes.py:122-146)."""
    from arseg_tpu.tools.preprocess import generate_compressed_cityscapes

    rng = np.random.RandomState(5)
    canvas = rng.randint(0, 255, (H, W + 64, 3), np.uint8).astype(np.int32)
    canvas = (canvas + np.roll(canvas, 1, 0) + np.roll(canvas, 1, 1)) // 3
    canvas = canvas.astype(np.uint8)

    fn = "cityA_000000_000019_leftImg8bit.png"
    (tmp_path / "leftImg8bit" / "val" / "cityA").mkdir(parents=True)
    Image.fromarray(canvas[:, :W]).save(tmp_path / "leftImg8bit" / "val" / "cityA" / fn)
    seq_city = tmp_path / "leftImg8bit_sequence" / "val" / "cityA"
    seq_city.mkdir(parents=True)
    for i, idx in enumerate(range(14, 22)):
        Image.fromarray(canvas[:, 2 * i : 2 * i + W]).save(
            seq_city / f"cityA_000000_{idx:06d}_leftImg8bit.png"
        )

    out_root = generate_compressed_cityscapes(
        str(tmp_path), ref_gap=GOP, bitrate=1000, splits=("val",),
        key_dists=(3,), progress=lambda *a: None,
    )
    dec = os.path.join(out_root, f"decoded_GOP{GOP}_dist_3", "leftImg8bit", "val", "cityA", fn)
    assert os.path.exists(dec) and Image.open(dec).size == (W, H)
    mv = np.fromfile(
        os.path.join(out_root, f"MVmap_GOP{GOP}_dist_3", "val", "cityA", fn[:-4] + ".bin"),
        np.int16,
    )
    assert mv.size == H * W * 2
    # keyframe = window start (annotated idx 19 - dist 3 = 16)
    assert os.path.exists(
        os.path.join(out_root, "frames", "val", "cityA",
                     "cityA_000000_000016_leftImg8bit.png")
    )
