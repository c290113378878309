"""tools_parity_real.py must stay runnable for the moment real checkpoints
land: generate an oracle .pth (reference WithFuse, random weights), run the
tool's main() at small size, and require perfect f32 argmax agreement."""

import sys

import pytest
import torch

sys.path.insert(0, "/root/repo")


@pytest.mark.slow
def test_parity_tool_end_to_end(tmp_path, monkeypatch):
    import tools_parity_real as tool
    from reference_oracle import install_reference

    install_reference()
    sys.path.insert(0, "/root/reference")
    from model.bisenet import BiSeNetV1WithFuse

    ckpt = str(tmp_path / "synth.pth")
    torch.save(
        BiSeNetV1WithFuse(n_classes=12, backend="resnet18").eval().state_dict(),
        ckpt,
    )

    monkeypatch.setattr(tool, "CKPT", ckpt)
    monkeypatch.setattr(tool, "CONFIG", "camvid-bise18")
    monkeypatch.setitem(tool.SIZES, "camvid", (96, 128))
    rows = tool.main()

    f32 = next(r for r in rows if r["mode"] == "f32")
    assert f32["fuse"] is True
    assert f32["argmax_agree"] == 1.0
    assert f32["logit_max"] < 1e-4
