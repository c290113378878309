"""Dual-framework protocol parity: our eval engines vs the UNMODIFIED
reference `evaluation.py` engines (EvalConstRes / EvalAlterRes,
/root/reference evaluation.py:90-215), on the same synthetic GOP tree and
the same weights (torch random-init -> converter -> our params).

This is the integration-level mIoU_d check that released-checkpoint golden
numbers would provide if datasets existed in this environment: both
frameworks crawl the same decoded/MV tree semantics, run the same HR/AR
math, and must produce the same per-distance mIoU.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from synthetic_data import make_camvid_tree, FLOW_SHAPE  # noqa: E402
from reference_oracle import install_reference, ref_state_dict  # noqa: E402

from arseg_tpu.eval.engine import EvalConstRes, EvalAlterRes  # noqa: E402
from arseg_tpu.eval.protocol import _make_dataset, _seq_paths  # noqa: E402
from arseg_tpu.data import Loader  # noqa: E402
from arseg_tpu.models import build_model  # noqa: E402
from arseg_tpu.utils.torch_convert import convert_state_dict  # noqa: E402

GOP = 3


class _DP:
    """CPU stand-in for nn.DataParallel: callable, with .module."""

    def __init__(self, module):
        self.module = module

    def __call__(self, *a, **k):
        return self.module(*a, **k)


def _patch_cuda(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(
        torch.nn.Module, "cuda", lambda self, *a, **k: self, raising=False
    )


def _const_batches(ds):
    for i in range(len(ds)):
        s = ds[i]
        img = torch.from_numpy(s["image"].transpose(2, 0, 1))[None]
        lbl = torch.from_numpy(s["label"].astype(np.int64))[None]
        yield img, lbl, 0


def _alter_batches(ds):
    for i in range(len(ds)):
        s = ds[i]
        img = torch.from_numpy(s["image"].transpose(2, 0, 1))[None]
        lbl = torch.from_numpy(s["label"].astype(np.int64))[None]
        ref = torch.from_numpy(s["ref_image"].transpose(2, 0, 1))[None]
        flow = torch.from_numpy(s["flow"])[None]
        yield img, lbl, 0, ref, flow


@pytest.mark.xslow
def test_protocol_miou_matches_reference_engines(tmp_path, monkeypatch):
    install_reference()
    _patch_cuda(monkeypatch)
    from model.pspnet import PSPNet as RefPSP, PSPNetWithFuse as RefFuse
    import evaluation as ref_eval

    data_root = str(tmp_path / "data")
    make_camvid_tree(data_root, gop=GOP)

    torch.manual_seed(0)
    ref_hr = RefPSP(
        sizes=(1, 2, 3, 6), n_classes=12, psp_size=512,
        deep_features_size=256, backend="resnet18",
    ).eval()
    torch.manual_seed(1)
    ref_ar = RefFuse(
        sizes=(1, 2, 3, 6), n_classes=12, psp_size=512,
        deep_features_size=256, backend="resnet18", atten_k=7,
    ).eval()

    hr_model = build_model("camvid-psp18", fuse=False)
    ar_model = build_model("camvid-psp18", fuse=True)
    hr_params = convert_state_dict(ref_state_dict(ref_hr), "camvid-psp18")
    ar_params = convert_state_dict(ref_state_dict(ref_ar), "camvid-psp18")

    ours, theirs = {}, {}
    with torch.no_grad():
        for ref_gap in range(1, GOP + 1):
            data_path, flow_path, ref_path = _seq_paths(
                data_root, "camvid", "3M", GOP, ref_gap
            )
            if ref_gap == 1:
                ds = _make_dataset("camvid", data_path, "psp18")
                ours[ref_gap] = EvalConstRes(scale=1.0)(
                    hr_model, hr_params,
                    Loader(ds, batch_size=1, shuffle=False, num_workers=0,
                           drop_last=True),
                    12,
                )
                theirs[ref_gap] = ref_eval.EvalConstRes(scale=1.0)(
                    _DP(ref_hr), _const_batches(ds), 12
                )
            else:
                ds = _make_dataset(
                    "camvid", data_path, "psp18", ref_gap, flow_path,
                    ref_path, FLOW_SHAPE,
                )
                ours[ref_gap] = EvalAlterRes(scale=0.5)(
                    hr_model, hr_params, ar_model, ar_params,
                    Loader(ds, batch_size=1, shuffle=False, num_workers=0,
                           drop_last=True),
                    12,
                )
                theirs[ref_gap] = ref_eval.EvalAlterRes(scale=0.5)(
                    _DP(ref_hr), _DP(ref_ar), _alter_batches(ds), 12
                )

    for ref_gap in range(1, GOP + 1):
        # random-init logits: a handful of argmax-boundary pixels may flip
        # between frameworks at f32; mIoU agreement bound reflects that
        assert ours[ref_gap] == pytest.approx(theirs[ref_gap], abs=2e-3), (
            ref_gap, ours, theirs,
        )
    # and the typical case should be much tighter than the bound
    diffs = [abs(ours[g] - theirs[g]) for g in ours]
    assert np.median(diffs) < 5e-4, (ours, theirs)


@pytest.mark.xslow
def test_protocol_miou_matches_reference_engines_bise(tmp_path, monkeypatch):
    """Same dual-framework check for the bench headline config
    (camvid-bise18; reference builds the HR net in aux_mode='train' so the
    AR branch warps forward()[-1], evaluation.py:26,34)."""
    install_reference()
    _patch_cuda(monkeypatch)
    from model.bisenet import BiSeNetV1 as RefBise, BiSeNetV1WithFuse as RefBiseFuse
    import evaluation as ref_eval

    data_root = str(tmp_path / "data")
    make_camvid_tree(data_root, gop=GOP)

    torch.manual_seed(2)
    ref_hr = RefBise(n_classes=12, backend="resnet18").eval()
    torch.manual_seed(3)
    ref_ar = RefBiseFuse(n_classes=12, backend="resnet18").eval()

    hr_model = build_model("camvid-bise18", fuse=False)
    ar_model = build_model("camvid-bise18", fuse=True)
    hr_params = convert_state_dict(ref_state_dict(ref_hr), "camvid-bise18")
    ar_params = convert_state_dict(ref_state_dict(ref_ar), "camvid-bise18")

    ours, theirs = {}, {}
    with torch.no_grad():
        for ref_gap in (2, GOP):
            data_path, flow_path, ref_path = _seq_paths(
                data_root, "camvid", "3M", GOP, ref_gap
            )
            ds = _make_dataset(
                "camvid", data_path, "bise18", ref_gap, flow_path,
                ref_path, FLOW_SHAPE,
            )
            ours[ref_gap] = EvalAlterRes(scale=0.5)(
                hr_model, hr_params, ar_model, ar_params,
                Loader(ds, batch_size=1, shuffle=False, num_workers=0,
                       drop_last=True),
                12,
            )
            theirs[ref_gap] = ref_eval.EvalAlterRes(scale=0.5)(
                _DP(ref_hr), _DP(ref_ar), _alter_batches(ds), 12
            )

    for ref_gap in ours:
        assert ours[ref_gap] == pytest.approx(theirs[ref_gap], abs=2e-3), (
            ref_gap, ours, theirs,
        )
