"""End-to-end model parity: reference torch models (random init, eval mode)
vs arseg_tpu functional models with converted weights."""

import os
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from reference_oracle import install_reference, ref_state_dict
from arseg_tpu.models import build_model
from arseg_tpu.utils.torch_convert import convert_state_dict
from arseg_tpu.nn import functional as Fn

install_reference()

torch.manual_seed(0)

H, W = 96, 128  # divisible by 32; PSP feature 12x16 >= (6,6) pyramid


def _x(n=1, h=H, w=W, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(n, 3, h, w).astype(np.float32)


def _assert_close(got_nhwc, ref_nchw, tol=2e-4):
    ref = ref_nchw.detach().permute(0, 2, 3, 1).numpy()
    got = np.asarray(got_nhwc)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)


def test_camvid_psp18_forward():
    from model.pspnet import PSPNet as RefPSPNet

    ref = RefPSPNet(
        sizes=(1, 2, 3, 6), n_classes=12, psp_size=512,
        deep_features_size=256, backend="resnet18",
    ).eval()
    x = _x()
    with torch.no_grad():
        out, cls, p = ref(torch.from_numpy(x))

    model = build_model("camvid-psp18", fuse=False)
    params = convert_state_dict(ref_state_dict(ref), "camvid-psp18")
    got_out, got_cls, got_p = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(got_out, out)
    _assert_close(got_p, p)
    np.testing.assert_allclose(np.asarray(got_cls), cls.numpy(), rtol=2e-4, atol=2e-4)


def test_camvid_psp18_fuse_merge():
    from model.pspnet import PSPNetWithFuse as RefFuse

    ref = RefFuse(
        sizes=(1, 2, 3, 6), n_classes=12, psp_size=512,
        deep_features_size=256, backend="resnet18", atten_k=7,
    ).eval()
    x = _x(seed=1)
    rng = np.random.RandomState(2)
    ref_p = rng.randn(1, 64, H, W).astype(np.float32)
    with torch.no_grad():
        out, cls, p = ref(torch.from_numpy(x), mode="merge", ref_p=torch.from_numpy(ref_p))

    model = build_model("camvid-psp18", fuse=True)
    params = convert_state_dict(ref_state_dict(ref), "camvid-psp18")
    got_out, got_cls, got_p = model.apply(
        params,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        mode="merge",
        ref_p=jnp.asarray(ref_p.transpose(0, 2, 3, 1)),
    )
    _assert_close(got_out, out)
    _assert_close(got_p, p)


def test_cityscapes_psp18_forward_and_merge():
    from model.pspnet_semseg import PSPNetWithFuse as RefCity

    ref = RefCity(
        layers=18, bins=(1, 2, 3, 6), dropout=0.1, classes=19,
        zoom_factor=8, feat_dim=512, use_ppm=True, pretrained=True,
    ).eval()
    x = _x(seed=3)
    with torch.no_grad():
        out, aux, p = ref(torch.from_numpy(x))

    model = build_model("cityscapes-psp18", fuse=True)
    params = convert_state_dict(ref_state_dict(ref), "cityscapes-psp18")
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    got_out, got_aux, got_p = model.apply(params, xj)
    _assert_close(got_out, out)
    _assert_close(got_aux, aux)
    _assert_close(got_p, p)

    rng = np.random.RandomState(4)
    ref_p = rng.randn(1, 512, H // 8, W // 8).astype(np.float32)
    with torch.no_grad():
        out_m, aux_m, p_m = ref(
            torch.from_numpy(x), mode="merge", ref_p=torch.from_numpy(ref_p)
        )
    got_out, got_aux, got_p = model.apply(
        params, xj, mode="merge", ref_p=jnp.asarray(ref_p.transpose(0, 2, 3, 1))
    )
    _assert_close(got_out, out_m)
    _assert_close(got_p, p_m)


def test_camvid_bise18_forward():
    from model.bisenet import BiSeNetV1 as RefBise

    ref = RefBise(n_classes=12, backend="resnet18").eval()
    x = _x(seed=5)
    with torch.no_grad():
        out, out16, out32, feat = ref(torch.from_numpy(x))

    model = build_model("camvid-bise18", fuse=False)
    params = convert_state_dict(ref_state_dict(ref), "camvid-bise18")
    got = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(got[0], out)
    _assert_close(got[1], out16)
    _assert_close(got[2], out32)
    _assert_close(got[3], feat)


def test_camvid_bise18_fuse_merge():
    from model.bisenet import BiSeNetV1WithFuse as RefBiseFuse

    ref = RefBiseFuse(n_classes=12, backend="resnet18").eval()
    x = _x(seed=6)
    rng = np.random.RandomState(7)
    ref_p = rng.randn(1, 256, H // 8, W // 8).astype(np.float32)
    with torch.no_grad():
        out, out16, out32, fused = ref(
            torch.from_numpy(x), mode="merge", ref_p=torch.from_numpy(ref_p)
        )

    model = build_model("camvid-bise18", fuse=True)
    params = convert_state_dict(ref_state_dict(ref), "camvid-bise18")
    got = model.apply(
        params,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        mode="merge",
        ref_p=jnp.asarray(ref_p.transpose(0, 2, 3, 1)),
    )
    _assert_close(got[0], out)
    _assert_close(got[3], fused)


def test_camvid_bise18_phase2_argmax_head():
    """The channel-major fused inference head (final_conv + x8 bilinear
    align_corners=False + argmax as constant-matrix matmuls) must agree with
    the composed forward_phase2 -> argmax chain; f32 keeps the math exact up
    to accumulation-order float ties."""
    model = build_model("camvid-bise18", fuse=True)
    params = model.init(jax.random.PRNGKey(3))
    rng = np.random.RandomState(8)
    mid = jnp.asarray(rng.randn(1, 12, 16, 256).astype(np.float32))
    ref_p = jnp.asarray(rng.randn(1, 12, 16, 256).astype(np.float32))

    out, _ = model.forward_phase2(params, mid, ref_p)
    want = np.argmax(np.asarray(out), axis=-1)
    got = np.asarray(model.forward_phase2_argmax(params, mid, ref_p))
    assert got.shape == want.shape == (1, 96, 128)
    agree = np.mean(got == want)
    assert agree > 0.999, agree


@pytest.mark.parametrize(
    "atten_type", ["local", "localNoGroup", "localOnly", "local2", "local3", "conv", "upsample"]
)
def test_attention_variants(atten_type):
    """Each fusion variant vs its reference class with converted weights."""
    import model.attention as ra

    cls = {
        "local": ra.MyAttention,
        "localNoGroup": ra.MyAttentionNoGroup,
        "localOnly": ra.MyAttentionLocalOnly,
        "local2": ra.MyAttentionV2,
        "local3": ra.MyAttentionV3,
        "conv": ra.ConvFusion,
        "upsample": ra.MyAttentionUpsample,
    }[atten_type]
    if atten_type == "conv":
        ref = cls(16).eval()
    elif atten_type == "upsample":
        ref = cls(16).eval()
    else:
        ref = cls(16, kW=5, kH=5).eval()

    rng = np.random.RandomState(8)
    hr = rng.randn(1, 16, 24, 32).astype(np.float32)
    lr = rng.randn(1, 16, 12, 16).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.from_numpy(hr), torch.from_numpy(lr))

    from arseg_tpu.nn.attention import get_fusion

    _, apply = get_fusion(atten_type, 5)
    params = convert_state_dict(ref_state_dict(ref))
    got = apply(
        params,
        jnp.asarray(hr.transpose(0, 2, 3, 1)),
        jnp.asarray(lr.transpose(0, 2, 3, 1)),
    )
    _assert_close(got, out)


def test_global_attention_variant():
    import model.attention as ra

    ref = ra.MyAttentionGlobal(16, kScale=4).eval()
    rng = np.random.RandomState(9)
    hr = rng.randn(1, 16, 32, 32).astype(np.float32)
    lr = rng.randn(1, 16, 16, 16).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.from_numpy(hr), torch.from_numpy(lr))

    from arseg_tpu.nn.attention import get_fusion

    _, apply = get_fusion("global", 4)
    params = convert_state_dict(ref_state_dict(ref))
    got = apply(
        params,
        jnp.asarray(hr.transpose(0, 2, 3, 1)),
        jnp.asarray(lr.transpose(0, 2, 3, 1)),
    )
    _assert_close(got, out, tol=5e-4)


def test_bn_training_stats_match_torch():
    """Training-mode BN: batch stats + running-stat momentum update parity."""
    import torch.nn as nn

    tbn = nn.BatchNorm2d(6)
    tbn.train()
    rng = np.random.RandomState(10)
    x = rng.randn(4, 6, 5, 7).astype(np.float32)
    with torch.no_grad():
        out = tbn(torch.from_numpy(x))

    p = {
        "weight": jnp.ones((6,)),
        "bias": jnp.zeros((6,)),
        "running_mean": jnp.zeros((6,)),
        "running_var": jnp.ones((6,)),
    }
    ctx = Fn.Ctx(train=True)
    got = Fn.batch_norm(p, jnp.asarray(x.transpose(0, 2, 3, 1)), ctx, "bn")
    _assert_close(got, out, tol=1e-4)
    new_params = Fn.apply_bn_updates({"bn": p}, ctx.bn_updates)
    np.testing.assert_allclose(
        np.asarray(new_params["bn"]["running_mean"]), tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_params["bn"]["running_var"]), tbn.running_var.numpy(), rtol=1e-5, atol=1e-6
    )


@pytest.mark.skipif(
    not os.path.exists("/tmp/ref_ckpt.pth"), reason="no released checkpoint"
)
@pytest.mark.slow
def test_real_checkpoint_parity():
    """Released reference checkpoint loads strict-clean through the converter
    and reproduces the torch oracle's predictions (PARITY.md §1)."""
    import torch
    from reference_oracle import install_reference
    from arseg_tpu.utils.torch_convert import load_torch_checkpoint

    install_reference()
    sys.path.insert(0, "/root/reference")
    from model import pspnet as ref_pspnet

    sd = torch.load("/tmp/ref_ckpt.pth", map_location="cpu", weights_only=False)
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}
    ref = ref_pspnet.PSPNet(
        n_classes=12, sizes=(1, 2, 3, 6), psp_size=512,
        deep_features_size=256, backend="resnet18", pretrained=False,
    )
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    assert not missing and not unexpected
    ref.eval()

    model = build_model("camvid-psp18", fuse=False)
    params = load_torch_checkpoint("/tmp/ref_ckpt.pth", "camvid-psp18")

    rng = np.random.RandomState(0)
    x = rng.randn(1, 240, 320, 3).astype(np.float32) * 0.8
    with torch.no_grad():
        t_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0].numpy()
    t_out = t_out.transpose(0, 2, 3, 1)
    j_out = np.asarray(model.apply(params, jnp.asarray(x))[0], np.float32)
    assert np.abs(j_out - t_out).max() < 1e-3
    assert (j_out.argmax(-1) == t_out.argmax(-1)).mean() > 0.999
