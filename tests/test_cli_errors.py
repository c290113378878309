"""infer_video CLI flag-validation paths: the mutually-exclusive mode
combinations and input sanity errors must fail fast with clear messages
(not crash deep in the pipeline)."""

import pytest


def _main(argv):
    from arseg_tpu.cli.infer_video import main

    return main(argv)


BASE = ["--out_dir", "/tmp/x", "--hr_snapshot", "h", "--ar_snapshot", "a"]


def test_video_requires_carrier():
    with pytest.raises(SystemExit):
        _main(BASE + ["--video", "s.hevc"])


def test_video_excludes_data_path():
    with pytest.raises(SystemExit):
        _main(BASE + ["--video", "s.hevc", "--mv_carrier", "s.264",
                      "--data_path", "d"])


def test_streams_exclude_video_and_gop_modes():
    with pytest.raises(SystemExit):
        _main(BASE + ["--streams", "a:b", "--video", "s.hevc"])
    with pytest.raises(SystemExit):
        _main(BASE + ["--streams", "a:b", "--gop_batch", "2"])
    with pytest.raises(SystemExit):
        _main(BASE + ["--streams", "a:b", "--gop_devices", "2"])


def test_gop_devices_excludes_gop_batch():
    with pytest.raises(SystemExit):
        _main(BASE + ["--gop_devices", "2", "--gop_batch", "2"])


def test_gop_devices_over_device_count():
    with pytest.raises(SystemExit, match="available devices"):
        _main(BASE + ["--data_path", "d", "--flow_path", "f",
                      "--gop_devices", "512"])


def test_missing_inputs():
    with pytest.raises(SystemExit):
        _main(BASE)


def test_video_stream_spec_file_not_found(tmp_path):
    with pytest.raises(SystemExit, match="not found"):
        _main(BASE + ["--streams", f"{tmp_path}/nope.hevc:{tmp_path}/nope.264"])
