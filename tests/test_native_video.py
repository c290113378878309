"""Tests for the native arsegvid video runtime (native/arsegvid.cpp) and the
host-side preprocessing tools.

Validates the artifact contracts of reference
pre-process/generate_compressed_dataset_camvid.py: decoded PNG round-trip,
per-frame MV bins (int16 [H, W, 3] qpel), the chain-merge DP (C++ vs the
vectorized numpy oracle), and photometric MV accuracy on synthetic motion.
"""

import os

import numpy as np
import pytest
from PIL import Image

from arseg_tpu.tools.video import load_native, merge_motion_np

native = load_native()
needs_native = pytest.mark.skipif(native is None, reason="native lib unavailable")


@pytest.fixture(scope="module")
def gop_dir(tmp_path_factory):
    """12 frames of textured content with exact -2 px/frame global motion
    (a sliding window over a wide canvas), run through the full pipeline."""
    root = tmp_path_factory.mktemp("gop")
    rng = np.random.RandomState(7)
    canvas = rng.randint(0, 255, (192, 512, 3), np.uint8).astype(np.int32)
    canvas = (canvas + np.roll(canvas, 1, 0) + np.roll(canvas, 1, 1) + np.roll(canvas, 2, 1)) // 4
    canvas = canvas.astype(np.uint8)
    paths = []
    for f in range(12):
        p = root / f"{f:03d}.png"
        Image.fromarray(canvas[:, 2 * f : 2 * f + 256]).save(p)
        paths.append(str(p))
    out = root / "out"
    out.mkdir()
    native.gop_pipeline(paths, str(out), fps=30, bitrate_kbps=2000, gop=12, merge_upto=11)
    return out


@needs_native
def test_decode_roundtrip(gop_dir):
    decoded = sorted(f for f in os.listdir(gop_dir) if f.startswith("decoded-"))
    assert len(decoded) == 12
    src = np.asarray(Image.open(gop_dir / "decoded-001.png"))
    assert src.shape == (192, 256, 3)
    # lossy but recognizable (random-noise texture is codec worst-case;
    # the bound just guards against scrambled frame order / broken planes)
    orig = np.asarray(Image.open(gop_dir.parent / "000.png"))
    err_key = np.mean(np.abs(src.astype(np.int32) - orig.astype(np.int32)))
    assert err_key < 40
    # and frame order is right: decoded-001 matches frame 0 better than frame 11
    far = np.asarray(Image.open(gop_dir.parent / "011.png")).astype(np.int32)
    assert err_key < np.mean(np.abs(src.astype(np.int32) - far))


@needs_native
def test_mv_bins_layout(gop_dir):
    b = np.fromfile(gop_dir / "test_001.bin", np.int16).reshape(192, 256, 3)
    # every coded inter block references the previous frame (ref=1 encode)
    assert set(np.unique(b[..., 2])) <= {-1, 0}


@needs_native
def test_merged_mv_photometric(gop_dir):
    """Global -2 px/frame motion means the keyframe ancestor of a frame-d
    pixel sits +2d px to the right: merged map == +8d qpel in x, 0 in y."""
    for d in [1, 4, 11]:
        mv = np.fromfile(gop_dir / f"merged_test_{d:03d}.bin", np.int16).reshape(192, 256, 2)
        inner = mv[16:176, 32:200]
        assert np.mean(inner[..., 0] == 8 * d) > 0.95, f"dist {d}"
        assert np.mean(inner[..., 1] == 0) > 0.95, f"dist {d}"


@needs_native
def test_merged_dist0_is_zero(gop_dir):
    mv = np.fromfile(gop_dir / "merged_test_000.bin", np.int16)
    assert not mv.any()


@needs_native
def test_merge_native_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    n, h, w = 5, 33, 47
    bins = np.zeros((n, h, w, 3), np.int16)
    bins[..., 0] = rng.randint(-40, 40, (n, h, w))
    bins[..., 1] = rng.randint(-40, 40, (n, h, w))
    bins[..., 2] = rng.randint(-1, 5, (n, h, w))  # mix of intra/valid/far refs
    ours = native.merge_mv(bins, max_ref=3)
    oracle = merge_motion_np(bins, max_ref=3)
    np.testing.assert_array_equal(ours, oracle)


def test_merge_oracle_chains_displacements():
    """Two frames, constant +1 px x-motion per frame (qpel 4): distance-2 map
    must chain to +2 px (qpel 8)."""
    h, w = 8, 16
    bins = np.zeros((2, h, w, 3), np.int16)
    bins[..., 0] = 4
    out = merge_motion_np(bins)
    assert out.shape == (3, h, w, 2)
    # interior pixels (clipping affects the right border chain)
    assert (out[1, :, :-1, 0] == 4).all()
    assert (out[2, :, :-2, 0] == 8).all()
    assert not out[..., 1].any()


def test_merge_oracle_intra_absorption():
    """Intra codes (<0 or >= max_ref) behave as zero MV to the previous
    frame — the chain passes straight through (reference ...camvid.py:20-28)."""
    h, w = 4, 8
    bins = np.zeros((2, h, w, 3), np.int16)
    bins[0, ..., 0] = 4  # frame 1: +1 px
    bins[1, ..., 2] = -1  # frame 2: intra everywhere
    out = merge_motion_np(bins)
    assert (out[2, :, :-1, 0] == 4).all()


@pytest.fixture(scope="module")
def gop_dir_hevc(gop_dir, tmp_path_factory):
    """Same synthetic GOP, MV source = the HEVC encode's own analysis dump
    (mv_source='hevc' — the reference-faithful source, no H.264 carrier)."""
    root = tmp_path_factory.mktemp("gop_hevc")
    paths = [str(gop_dir.parent / f"{f:03d}.png") for f in range(12)]
    native.gop_pipeline(paths, str(root), fps=30, bitrate_kbps=2000, gop=12,
                        merge_upto=11, mv_source="hevc")
    return root


@needs_native
def test_hevc_mv_bins_layout(gop_dir_hevc):
    """Analysis-sourced bins follow the same [H, W, 3] contract; ref codes
    may exceed 0 (x265 medium uses up to 3 references; code r = r+1 frames
    back), intra/boundary = -1."""
    b = np.fromfile(gop_dir_hevc / "test_001.bin", np.int16).reshape(192, 256, 3)
    refs = set(np.unique(b[..., 2]))
    assert refs <= {-1, 0, 1, 2}, refs
    # the sliding window pans right, so content moves LEFT: the match in a
    # reference r+1 frames back sits +2*(r+1) px right -> +8*(r+1) qpel
    inter = b[..., 2] >= 0
    assert inter.mean() > 0.8
    expect = 8 * (b[..., 2].astype(np.int32) + 1)
    exact = (b[..., 0] == expect) & inter
    assert exact.sum() / inter.sum() > 0.7


@needs_native
def test_hevc_merged_mv_photometric(gop_dir_hevc):
    """The merged-map invariant of test_merged_mv_photometric must hold for
    the HEVC-native MV source too (global -2 px/frame -> +8d qpel x)."""
    for d in [1, 4, 11]:
        mv = np.fromfile(
            gop_dir_hevc / f"merged_test_{d:03d}.bin", np.int16
        ).reshape(192, 256, 2)
        inner = mv[16:176, 32:200]
        assert np.mean(inner[..., 0] == 8 * d) > 0.95, f"dist {d}"
        assert np.mean(inner[..., 1] == 0) > 0.95, f"dist {d}"


@needs_native
def test_hevc_analysis_sidecar_and_cb(gop_dir_hevc, tmp_path):
    """The analysis sidecar sits next to the bitstream; the callback API
    yields the same maps the file dump wrote (plus the all-intra keyframe),
    and encode_analysis reproduces the encode+dump pair."""
    analysis = gop_dir_hevc / "proxy_2000.hevc.analysis"
    assert analysis.exists()
    maps = {}
    n = native.hevc_analysis_mvs_cb(str(analysis),
                                    lambda i, a: maps.__setitem__(i, a.copy()))
    assert n == 12 and sorted(maps) == list(range(12))
    assert (maps[0][..., 2] == -1).all() and not maps[0][..., :2].any()
    for f in (1, 7, 11):
        disk = np.fromfile(
            gop_dir_hevc / f"test_{f:03d}.bin", np.int16
        ).reshape(192, 256, 3)
        np.testing.assert_array_equal(maps[f], disk)


@needs_native
def test_hevc_mv_fidelity_vs_carrier():
    """Geometric fidelity of the HEVC-native MVs on multi-object synthetic
    content: median EPE vs ground truth must match the carrier's
    pixel-exact bar (closing PARITY.md §3 — the MV field now IS the HEVC
    stream's, so the carrier-substitution question is moot on this path)."""
    import tempfile
    from arseg_tpu.tools.mv_fidelity import synth_frames, measure

    with tempfile.TemporaryDirectory() as d:
        paths, gt = synth_frames(d, n=6, h=96, w=160, seed=1)
        rows = measure(paths, gop=6, bitrate_kbps=2000, gt=gt,
                       mv_source="hevc")
    assert len(rows) == 5
    for r in rows[:3]:
        assert r["epe_p50"] <= 1.0, r
    gains = [r["psnr_warp"] - r["psnr_nowarp"] for r in rows]
    assert min(gains) > 3.0, rows


@needs_native
def test_video_source_analysis_mv_kind(gop_dir_hevc):
    """VideoGOPSource(mv_kind='analysis') serves the same GOP geometry from
    (hevc, analysis sidecar) with flows matching the merged bins."""
    from arseg_tpu.gop.video_source import VideoGOPSource

    src = VideoGOPSource(
        str(gop_dir_hevc / "proxy_2000.hevc"),
        str(gop_dir_hevc / "proxy_2000.hevc.analysis"),
        ref_gap=12, mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25),
        native=native, mv_kind="analysis",
    )
    gops = list(src.iter_gops())
    assert len(gops) == 1
    kf, frames, fx, fy = gops[0]
    assert kf.shape == (1, 192, 256, 3) and frames.shape == (11, 192, 256, 3)
    assert fx.shape == (11, 192, 256)
    # +2d px x-displacement on the interior (the merged-map invariant in px)
    for d in (1, 11):
        inner = fx[d - 1, 16:176, 32:200]
        assert np.mean(inner == 2.0 * d) > 0.95, d


def test_camvid_label_roundtrip():
    from arseg_tpu.tools.labels import CAMVID_COLORMAP, index_to_rgb, rgb_to_index

    rng = np.random.RandomState(3)
    label = rng.randint(0, 12, (20, 30)).astype(np.uint8)
    rgb = index_to_rgb(label)
    back = rgb_to_index(rgb)
    # class 11 (void) is black == the ignore render, still a valid class
    np.testing.assert_array_equal(back, label)
    # unknown colors -> 255 (reference camvid-pre-process.py:52)
    junk = np.full((5, 5, 3), 17, np.uint8)
    assert (rgb_to_index(junk) == 255).all()
    assert len(CAMVID_COLORMAP) == 12


def test_mv_fidelity_multi_object():
    """x264-carrier MV fidelity on multi-object synthetic content (VERDICT
    round-1 item #4): the merged maps must be pixel-exact for the typical
    pixel (median EPE 0 vs ground-truth motion; errors concentrate at
    occlusion boundaries) and the warp must clearly beat no-compensation
    photometrically."""
    import tempfile
    from arseg_tpu.tools.mv_fidelity import synth_frames, measure

    with tempfile.TemporaryDirectory() as d:
        paths, gt = synth_frames(d, n=6, h=96, w=160, seed=1)
        rows = measure(paths, gop=6, bitrate_kbps=2000, gt=gt)
    assert len(rows) == 5
    for r in rows[:3]:
        assert r["epe_p50"] <= 1.0, r
    gains = [r["psnr_warp"] - r["psnr_nowarp"] for r in rows]
    assert min(gains) > 3.0, rows
