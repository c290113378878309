"""models registry: backend lookup errors and the shared fused-head
dispatch predicate (models.phase2_argmax_head — the single decision point
for eval + serving, see the eval-serves-what-serving-serves invariant)."""

import pytest

from arseg_tpu.models import build_model, phase2_argmax_head


def test_unknown_backend():
    with pytest.raises(KeyError, match="unknown backend"):
        build_model("camvid-vgg16")


def test_phase2_argmax_head_psp():
    # PSPNet fuses at full resolution: upscale 1, head fires only when the
    # warped feature already matches the target
    m = build_model("camvid-psp18", fuse=True)
    assert phase2_argmax_head(m, (48, 64), (48, 64)) is not None
    assert phase2_argmax_head(m, (24, 32), (48, 64)) is None


def test_phase2_argmax_head_bise():
    # BiSeNet fuses at 1/8 resolution: the fused head upsamples x8
    m = build_model("camvid-bise18", fuse=True)
    assert m.phase2_argmax_upscale == 8
    assert phase2_argmax_head(m, (6, 8), (48, 64)) is not None
    assert phase2_argmax_head(m, (6, 8), (24, 32)) is None


def test_phase2_argmax_head_shape_gate():
    # the gate is purely the output-resolution match — a mismatched target
    # falls back to the phase2 -> resize -> argmax path regardless of model
    m = build_model("camvid-bise18", fuse=False)  # same class as fuse=True
    assert phase2_argmax_head(m, (6, 8), (48, 64)) is not None
    assert phase2_argmax_head(m, (6, 8), (50, 60)) is None
