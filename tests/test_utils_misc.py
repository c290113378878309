"""Unit tests for the small utility modules: utils/profiling (StepTimer,
trace/annotate — SURVEY.md §5 tracing subsystem), utils/compile_cache, and
tools/camvid_decode's rename/skip logic (reference camvid_decode.sh:1-12
equivalent, exercised with a stub decoder so no video files are needed)."""

import json
import os

import jax
import pytest

from arseg_tpu.utils.profiling import StepTimer, annotate, trace


def test_step_timer_fixed_frames():
    t = StepTimer(frames_per_step=12)
    for _ in range(3):
        with t:
            pass
    assert t.frames == [12, 12, 12]
    assert len(t.times) == 3
    assert t.fps > 0


def test_step_timer_variable_frames_and_summary(tmp_path):
    t = StepTimer()
    with t.step(96):
        pass
    with t.step(12):
        pass
    assert t.frames == [96, 12]
    s = t.summary(skip_warmup=1)  # drops the first (warmup) step
    assert s["steps"] == 2
    assert s["min_ms"] >= 0
    p = tmp_path / "timer.json"
    t.dump(p)
    assert json.loads(p.read_text())["steps"] == 2


def test_step_timer_empty():
    assert StepTimer().fps == 0.0


def test_trace_and_annotate_smoke(tmp_path):
    import jax.numpy as jnp

    with trace(tmp_path / "tr"):
        with annotate("region"):
            jax.block_until_ready(jnp.ones(8) + 1)
    # jax.profiler writes a plugins/profile tree under the log dir
    assert any((tmp_path / "tr").rglob("*"))


def test_compile_cache_sets_config(tmp_path):
    from arseg_tpu.utils.compile_cache import enable_compile_cache

    d = tmp_path / "cache"
    enable_compile_cache(str(d))
    assert d.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(d)
    enable_compile_cache(str(d))  # idempotent


class _StubNative:
    """Stands in for the native decoder: writes n dummy decoded-%03d.png."""

    def __init__(self, n):
        self.n = n

    def decode(self, src, dst):
        for i in range(1, self.n + 1):
            with open(os.path.join(dst, f"decoded-{i:03d}.png"), "wb") as f:
                f.write(b"png")
        return self.n


def test_camvid_decode_rename_and_skip(tmp_path, monkeypatch):
    from arseg_tpu.tools import camvid_decode as cd

    monkeypatch.setattr(cd, "load_native", lambda: _StubNative(3))
    vdir = tmp_path / "videos"
    vdir.mkdir()
    (vdir / "01TP_extract.avi").write_bytes(b"x")  # only one scene present
    msgs = []
    cd.decode_camvid_videos(str(vdir), str(tmp_path / "out"), progress=msgs.append)
    scene = tmp_path / "out" / "frames" / "0001TP"
    # decoded-NNN.png (1-based) renamed to <scene>_<frame:06d>.png (0-based)
    assert sorted(p.name for p in scene.iterdir()) == [
        "0001TP_000000.png", "0001TP_000001.png", "0001TP_000002.png"]
    assert sum("skip" in m for m in msgs) == 3  # the three absent scenes
    assert any(m == "0001TP: 3 frames" for m in msgs)


def test_camvid_decode_no_native(monkeypatch):
    from arseg_tpu.tools import camvid_decode as cd

    monkeypatch.setattr(cd, "load_native", lambda: None)
    with pytest.raises(RuntimeError, match="native"):
        cd.decode_camvid_videos("/nonexistent", "/nonexistent")
