"""export_state_dict: the inverse converter. Models trained here must load
back into the UNMODIFIED reference PyTorch models with strict=True and
produce identical tensors — the deploy-back migration path (train on TPU,
serve on the reference's stack)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from reference_oracle import install_reference, ref_state_dict  # noqa: E402

install_reference()

from arseg_tpu.utils.torch_convert import (  # noqa: E402
    convert_state_dict,
    export_state_dict,
)


def _roundtrip(ref_module, backend):
    sd0 = ref_state_dict(ref_module)
    tree = convert_state_dict(sd0, backend)
    exported = export_state_dict(tree, backend)
    # strict load into the unmodified reference model
    missing, unexpected = ref_module.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in exported.items()},
        strict=False,
    )
    assert not missing, f"missing keys: {missing[:5]}"
    assert not unexpected, f"unexpected keys: {unexpected[:5]}"
    # every original tensor reproduced exactly (num_batches_tracked is
    # re-emitted as 0 — its value only matters for momentum=None training)
    for k, v in sd0.items():
        if k.endswith("num_batches_tracked"):
            assert k in exported
            continue
        np.testing.assert_array_equal(
            np.asarray(exported[k]), v.numpy(), err_msg=k
        )
    # DataParallel flavor
    dp = export_state_dict(tree, backend, data_parallel=True)
    assert all(k.startswith("module.") for k in dp)


def test_export_camvid_psp18_fuse():
    from model.pspnet import PSPNetWithFuse as RefFuse

    torch.manual_seed(0)
    ref = RefFuse(
        sizes=(1, 2, 3, 6), n_classes=12, psp_size=512,
        deep_features_size=256, backend="resnet18", atten_k=7,
    ).eval()
    _roundtrip(ref, "camvid-psp18")


def test_export_cityscapes_psp18():
    from model.pspnet_semseg import PSPNetWithFuse as RefCity

    torch.manual_seed(1)
    ref = RefCity(
        layers=18, bins=(1, 2, 3, 6), dropout=0.1, classes=19,
        zoom_factor=8, feat_dim=512, use_ppm=True, pretrained=True,
    ).eval()
    _roundtrip(ref, "cityscapes-psp18")


def test_export_camvid_bise18():
    from model.bisenet import BiSeNetV1WithFuse as RefBise

    torch.manual_seed(2)
    ref = RefBise(n_classes=12, backend="resnet18", aux_mode="eval", atten_k=7).eval()
    _roundtrip(ref, "camvid-bise18")


def test_convert_cli_to_torch_roundtrip(tmp_path):
    """arseg-convert --to_torch writes a .pth that re-imports to the exact
    same param tree (CLI-level inverse-converter path)."""
    import jax

    from arseg_tpu.cli.convert import main
    from arseg_tpu.models import build_model
    from arseg_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    m = build_model("camvid-bise18", fuse=True)
    src = tmp_path / "a.ckpt"
    save_checkpoint(src, m.init(jax.random.PRNGKey(0)))
    pth = tmp_path / "a.pth"
    back = tmp_path / "b.ckpt"
    main([str(src), str(pth), "--backend", "camvid-bise18", "--to_torch"])
    main([str(pth), str(back), "--backend", "camvid-bise18"])

    def flat(t, pre=""):
        out = {}
        for k, v in t.items():
            if isinstance(v, dict):
                out.update(flat(v, f"{pre}{k}."))
            else:
                out[pre + k] = np.asarray(v)
        return out

    fo = flat(load_checkpoint(src)["params"])
    fb = flat(load_checkpoint(back)["params"])
    assert set(fo) == set(fb)
    for k in fo:
        np.testing.assert_array_equal(fo[k], fb[k], err_msg=k)


def test_export_refuses_ablation_backbones():
    """densenet/squeezenet exports would not strict-load (dropped duplicate
    registrations) — refuse loudly rather than emit a broken .pth."""
    with pytest.raises(NotImplementedError, match="psp-densenet"):
        export_state_dict({}, "psp-densenet")
