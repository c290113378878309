"""VideoGOPSource: direct compressed-stream serving (frames from the HEVC
bitstream, MVs from the H.264 carrier, merged in memory) must reproduce the
file-based artifact path exactly — the reference's protocol round-trips
everything through decoded-%03d.png / test_%03d.bin / merged bins
(pre-process/generate_compressed_dataset_camvid.py:222-246); here the same
bytes flow device-ward with no intermediate file."""

import os

import numpy as np
import pytest
from PIL import Image

from arseg_tpu.tools.video import load_native

native = load_native()
needs_native = pytest.mark.skipif(native is None, reason="native lib unavailable")

H, W, GAP, N_GOPS = 48, 64, 4, 3
MEAN = (0.4, 0.45, 0.5)
STD = (0.3, 0.25, 0.2)


@pytest.fixture(scope="module")
def streams(tmp_path_factory):
    """N_GOPS*GAP + 2 frames of textured sliding content (the +2 tail
    checks partial-GOP dropping) encoded as the HEVC stream + the H.264 MV
    carrier, plus the file-based decode/mvdump artifacts to compare with."""
    root = tmp_path_factory.mktemp("vidsrc")
    rng = np.random.RandomState(3)
    canvas = rng.randint(0, 255, (H, W + 64, 3), np.uint8).astype(np.int32)
    canvas = (canvas + np.roll(canvas, 1, 0) + np.roll(canvas, 1, 1)) // 3
    canvas = canvas.astype(np.uint8)
    n = N_GOPS * GAP + 2
    paths = []
    for f in range(n):
        p = root / f"{f:03d}.png"
        Image.fromarray(canvas[:, 2 * f : 2 * f + W]).save(p)
        paths.append(str(p))
    hevc = str(root / "s.hevc")
    carrier = str(root / "s.264")
    native.encode(paths, hevc, codec="libx265", gop=GAP, bitrate_kbps=2000)
    native.encode(paths, carrier, codec="libx264", gop=GAP, bitrate_kbps=2000)
    dec = root / "dec"
    mv = root / "mv"
    dec.mkdir()
    mv.mkdir()
    native.decode(hevc, str(dec))
    native.mvdump(carrier, str(mv))
    return root, hevc, carrier, dec, mv


@needs_native
def test_iter_gops_matches_file_artifacts(streams):
    from arseg_tpu.gop.video_source import VideoGOPSource

    root, hevc, carrier, dec, mv = streams
    src = VideoGOPSource(hevc, carrier, GAP, MEAN, STD)
    gops = list(src.iter_gops())
    assert len(gops) == N_GOPS  # the 2-frame tail is dropped

    mean = np.asarray(MEAN, np.float32)
    std = np.asarray(STD, np.float32)
    for gi, (kf, frames, fx, fy) in enumerate(gops):
        assert kf.shape == (1, H, W, 3) and frames.shape == (GAP - 1, H, W, 3)
        assert fx.shape == (GAP - 1, H, W) and fx.dtype == np.float32
        # frames: byte-identical to the decoded PNGs, same normalize math
        for k in range(GAP):
            png = np.asarray(
                Image.open(dec / f"decoded-{gi * GAP + k + 1:03d}.png")
            )
            from arseg_tpu.data import transform as T

            want = T.normalize(png, MEAN, STD)
            got = kf[0] if k == 0 else frames[k - 1]
            np.testing.assert_array_equal(got, want)
        # flows: merge of this GOP's file-dumped bins, qpel -> px
        bins = np.stack([
            np.fromfile(mv / f"test_{gi * GAP + d:03d}.bin", dtype=np.int16)
            .reshape(H, W, 3)
            for d in range(1, GAP)
        ])
        merged = native.merge_mv(bins, max_ref=GAP)
        np.testing.assert_array_equal(fx, merged[1:, ..., 0].astype(np.float32) / 4.0)
        np.testing.assert_array_equal(fy, merged[1:, ..., 1].astype(np.float32) / 4.0)


@needs_native
def test_gop_feeder_over_video_source(streams):
    """GOPFeeder drives sequential sources (iter_gops) through the same
    host pipeline: ordered gi, identical items, gop_batch stacking with the
    ragged tail emitted GOP-at-a-time."""
    from arseg_tpu.gop.feeder import GOPFeeder
    from arseg_tpu.gop.video_source import VideoGOPSource

    root, hevc, carrier, dec, mv = streams
    src = VideoGOPSource(hevc, carrier, GAP, MEAN, STD)
    direct = list(VideoGOPSource(hevc, carrier, GAP, MEAN, STD).iter_gops())

    feeder = GOPFeeder(src, GAP, stage=False)
    items = list(feeder)
    assert [gi for gi, *_ in items] == list(range(N_GOPS))
    for (gi, kf, fr, (fx, fy)), want in zip(items, direct):
        np.testing.assert_array_equal(kf, want[0])
        np.testing.assert_array_equal(fr, want[1])
        np.testing.assert_array_equal(fx, want[2])
        np.testing.assert_array_equal(fy, want[3])

    # batched: N_GOPS=3, B=2 -> one [2,...] stack + one single-GOP tail
    feeder_b = GOPFeeder(
        VideoGOPSource(hevc, carrier, GAP, MEAN, STD), GAP,
        stage=False, gop_batch=2,
    )
    batched = list(feeder_b)
    assert len(batched) == 2
    gi0, kf0, fr0, (fx0, fy0) = batched[0]
    assert gi0 == 0 and kf0.shape == (2, H, W, 3)
    assert fr0.shape == (2, GAP - 1, H, W, 3)
    np.testing.assert_array_equal(kf0[1], direct[1][0][0])
    gi1, kf1, fr1, _ = batched[1]
    assert gi1 == 2 and fr1.shape == (GAP - 1, H, W, 3)


@needs_native
def test_mismatched_streams_error(streams, tmp_path):
    """A carrier with a different GOP count must raise, not silently
    truncate."""
    from arseg_tpu.gop.video_source import VideoGOPSource

    root, hevc, carrier, dec, mv = streams
    rng = np.random.RandomState(5)
    paths = []
    for f in range(GAP):  # one GOP only
        p = tmp_path / f"{f:03d}.png"
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(p)
        paths.append(str(p))
    short = str(tmp_path / "short.264")
    native.encode(paths, short, codec="libx264", gop=GAP)
    src = VideoGOPSource(hevc, short, GAP, MEAN, STD)
    with pytest.raises(RuntimeError, match="GOP counts differ"):
        list(src.iter_gops())


@needs_native
def test_device_normalize_matches_host(streams):
    """device_normalize=True (raw uint8 + ARPipeline(normalize=...)) must
    reproduce the host-normalized f32 feed bit-for-bit at f32: uint8->f32,
    /255, -mean, /std are exact IEEE ops on both sides."""
    import jax
    import jax.numpy as jnp

    from arseg_tpu.gop.pipeline import ARPipeline
    from arseg_tpu.gop.video_source import VideoGOPSource
    from arseg_tpu.models import build_model

    root, hevc, carrier, dec, mv = streams
    host = list(VideoGOPSource(hevc, carrier, GAP, MEAN, STD).iter_gops())
    raw = list(VideoGOPSource(hevc, carrier, GAP, MEAN, STD,
                              device_normalize=True).iter_gops())
    assert raw[0][0].dtype == np.uint8

    hr = build_model("camvid-psp18", fuse=False)
    ar = build_model("camvid-psp18", fuse=True)
    hrp = hr.init(jax.random.PRNGKey(0))
    arp = ar.init(jax.random.PRNGKey(1))
    pipe = ARPipeline(hr, ar, scale=0.5, normalize=(MEAN, STD))
    for (kf_h, fr_h, fx, fy), (kf_u, fr_u, _, _) in zip(host, raw):
        # the normalize op itself must be exact
        got = pipe._maybe_normalize(jnp.asarray(fr_u))
        np.testing.assert_array_equal(np.asarray(got), fr_h)
        # and the full program must agree between the two feeds
        p_host = pipe(hrp, arp, jnp.asarray(kf_h), jnp.asarray(fr_h), (fx, fy))
        p_raw = pipe(hrp, arp, jnp.asarray(kf_u), jnp.asarray(fr_u), (fx, fy))
        np.testing.assert_array_equal(np.asarray(p_host), np.asarray(p_raw))


@needs_native
def test_abandoned_iteration_stops_decode_threads(streams):
    """Breaking out of iter_gops early (e.g. zip over unequal streams) must
    stop both decode threads — closing the generator aborts the native
    decodes from their callbacks instead of leaking blocked producers."""
    import threading
    import time

    from arseg_tpu.gop.video_source import VideoGOPSource

    root, hevc, carrier, dec, mv = streams
    before = threading.active_count()
    src = VideoGOPSource(hevc, carrier, GAP, MEAN, STD, lookahead=1)
    it = src.iter_gops()
    next(it)
    it.close()  # what `for`-loop exit / GC does
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "decode threads leaked"

    # same through the GOPFeeder sequential driver
    from arseg_tpu.gop.feeder import GOPFeeder

    before = threading.active_count()
    feeder = iter(GOPFeeder(
        VideoGOPSource(hevc, carrier, GAP, MEAN, STD, lookahead=1),
        GAP, stage=False))
    next(feeder)
    feeder.close()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "feeder producer leaked"
