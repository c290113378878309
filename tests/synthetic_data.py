"""Synthetic compressed-GOP fixtures: a tiny CamVid-shaped directory tree
(decoded frames + keyframes + MV bins) for end-to-end pipeline tests without
the real datasets."""

import os

import numpy as np
from PIL import Image

SEQ = "0001TP"
# dataset idx 6690 maps to decoded idx 31 (scene_length_info)
DATASET_IDXS = [6690, 6720, 6750]
H, W = 96, 128  # test-size frames
FLOW_SHAPE = (48, 64, 2)


def _png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def make_camvid_tree(root, gop=4, bitrate="3M", seed=0, n_classes=12, splits=("test",),
                     h=H, w=W, flow_shape=None, dataset_idxs=DATASET_IDXS):
    """Build {root}/camvid-sequence/{bitrate}-GOP{gop}/... for all ref_gaps
    plus labels, mirroring the preprocessing layout
    (pre-process/generate_compressed_dataset_camvid.py, README.md:61-81).
    h/w/flow_shape default to the tiny test geometry; pass 720/960 and
    (720, 960, 2) for real-CamVid-shape measurement trees."""
    rng = np.random.RandomState(seed)
    flow_shape = flow_shape or FLOW_SHAPE
    seq_root = os.path.join(root, "camvid-sequence", f"{bitrate}-GOP{gop}")

    frames = {}
    for d_idx in dataset_idxs:
        dec_idx = d_idx - 6690 + 31
        for back in range(gop):
            frames[dec_idx - back] = rng.randint(0, 255, (h, w, 3), np.uint8)

    for ref_gap in range(1, gop + 1):
        dist = ref_gap - 1
        dec_dir = os.path.join(seq_root, f"decoded_GOP{gop}_dist_{dist}")
        mv_dir = os.path.join(seq_root, f"MVmap_GOP{gop}_dist_{dist}", SEQ)
        for d_idx in dataset_idxs:
            name = f"{SEQ}_{d_idx:06d}"
            img = frames[d_idx - 6690 + 31]
            label = rng.randint(0, n_classes, (h, w)).astype(np.uint8)
            label[0, 0] = 255  # exercise ignore_label
            for split in splits:
                _png(os.path.join(dec_dir, split, f"{name}.png"), img)
                _png(
                    os.path.join(dec_dir, f"{split}_labels_with_ignored", f"{name}.png"),
                    label,
                )
            if dist > 0:
                flow = rng.randint(-8, 8, flow_shape).astype(np.int16)
                os.makedirs(mv_dir, exist_ok=True)
                flow.tofile(os.path.join(mv_dir, f"{name}.bin"))

    frame_dir = os.path.join(seq_root, "frames", SEQ)
    for dec_idx, img in frames.items():
        _png(os.path.join(frame_dir, f"{SEQ}_{dec_idx:06d}.png"), img)
    return seq_root


CS_CITY = "frankfurt"
CS_FRAMES = [294, 576]  # annotated frame indices (arbitrary)
CS_H, CS_W = 96, 128
CS_FLOW_SHAPE = (48, 64, 2)


def make_cityscapes_tree(root, gop=3, bitrate="5M", seed=0):
    """Build {root}/cityscapes-sequence/{bitrate}-GOP{gop}/... with the
    leftImg8bit/gtFine/val layout inside each decoded dir plus frames/ and
    MVmap dirs, mirroring generate_compressed_dataset_cityscapes.py."""
    rng = np.random.RandomState(seed)
    seq_root = os.path.join(root, "cityscapes-sequence", f"{bitrate}-GOP{gop}")

    frames = {}
    for fi in CS_FRAMES:
        for back in range(gop):
            frames[fi - back] = rng.randint(0, 255, (CS_H, CS_W, 3), np.uint8)

    for ref_gap in range(1, gop + 1):
        dist = ref_gap - 1
        dec = os.path.join(seq_root, f"decoded_GOP{gop}_dist_{dist}")
        mv_dir = os.path.join(seq_root, f"MVmap_GOP{gop}_dist_{dist}", "val", CS_CITY)
        for fi in CS_FRAMES:
            name = f"{CS_CITY}_000000_{fi:06d}"
            img = frames[fi]
            label = rng.randint(0, 34, (CS_H, CS_W)).astype(np.uint8)
            _png(
                os.path.join(dec, "leftImg8bit", "val", CS_CITY,
                             f"{name}_leftImg8bit.png"),
                img,
            )
            _png(
                os.path.join(dec, "gtFine", "val", CS_CITY,
                             f"{name}_gtFine_labelIds.png"),
                label,
            )
            if dist > 0:
                os.makedirs(mv_dir, exist_ok=True)
                flow = rng.randint(-8, 8, CS_FLOW_SHAPE).astype(np.int16)
                flow.tofile(os.path.join(mv_dir, f"{name}_gtFine_leftImg8bit.bin"))

    for fi, img in frames.items():
        _png(
            os.path.join(seq_root, "frames", "val", CS_CITY,
                         f"{CS_CITY}_000000_{fi:06d}_leftImg8bit.png"),
            img,
        )
    return seq_root
