"""bench.py driver contract: exactly one JSON line with the required keys,
and a failure in a transparency arm (psp18 / batch_matched) must not cost
the primary camvid-bise18 metric — the driver records whatever bench prints
as the round's headline number."""

import json

import pytest

import bench


@pytest.fixture()
def stubbed(monkeypatch):
    disp = {"ar_fps_per_dispatch": 400.0, "hr_fps_per_dispatch": 220.0,
            "vs_baseline_per_dispatch": 1.818}
    def fake_config(name):
        return {"camvid-bise18": (480.0, 240.0, disp),
                "camvid-psp18": (50.0, 100.0, disp)}[name]

    monkeypatch.setattr(bench, "bench_config", fake_config)
    monkeypatch.setattr(
        bench, "bench_batch_matched", lambda: {"hr_gop_batched_fps": 320.0}
    )
    # the session anchor is a real 4096^3 matmul and the psp18-V2 arm runs
    # the real pipeline — minutes on a 1-core CPU; stub both
    monkeypatch.setattr(bench, "_session_speed", lambda: 55.0)
    monkeypatch.setattr(
        bench, "bench_psp18_v2", lambda hr: {"ar_fps": 120.0, "vs_baseline": 1.2}
    )
    monkeypatch.setattr(
        bench, "bench_scale_dial",
        lambda hr: {"0.3x": {"ar_fps": 960.0, "vs_baseline": 4.0}},
    )


def _run(capsys):
    bench.main()
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(lines) == 1, "bench must print exactly ONE JSON line"
    return json.loads(lines[0])

def test_json_line_contract(stubbed, capsys):
    rec = _run(capsys)
    assert set(rec) == {"metric", "value", "unit", "vs_baseline", "extra"}
    assert rec["value"] == 480.0
    assert rec["vs_baseline"] == 2.0
    assert rec["unit"] == "frames/sec/chip"
    assert rec["extra"]["psp18_vs_baseline"] == 0.5
    assert rec["extra"]["batch_matched"]["vs_hr_gop_batched"] == 1.5


def test_extra_arm_failure_keeps_primary(stubbed, capsys, monkeypatch):
    def boom(name):
        if name == "camvid-psp18":
            raise RuntimeError("tunnel flaked")
        return (480.0, 240.0, {"vs_baseline_per_dispatch": 1.818})

    monkeypatch.setattr(bench, "bench_config", boom)
    monkeypatch.setattr(
        bench, "bench_batch_matched", lambda: (_ for _ in ()).throw(ValueError("x"))
    )
    rec = _run(capsys)
    assert rec["value"] == 480.0 and rec["vs_baseline"] == 2.0
    assert "tunnel flaked" in rec["extra"]["psp18_error"]
    assert "ValueError" in rec["extra"]["batch_matched_error"]
