"""Parity of the non-ResNet PSPNet backbones (DenseNet-121 8x, SqueezeNet)
vs the reference torch implementations (`model/extractors.py:165-320`),
including checkpoint key conversion (duplicate ModuleList keys, dotted
'norm.1' names, Sequential index names)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from reference_oracle import install_reference, ref_state_dict
from arseg_tpu.utils.torch_convert import convert_state_dict
from arseg_tpu.nn.pspnet import PSPNet

install_reference()

torch.manual_seed(0)

H, W = 96, 128


def _x(seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(1, 3, H, W).astype(np.float32)


def _assert_close(got_nhwc, ref_nchw, tol=2e-4):
    ref = ref_nchw.detach().permute(0, 2, 3, 1).numpy()
    got = np.asarray(got_nhwc)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)


@pytest.mark.parametrize(
    "backend,psp,deep,conv_key,tol",
    [
        ("densenet", 1024, 512, "psp-densenet", 5e-4),
        ("squeezenet", 512, 256, "psp-squeezenet", 2e-4),
    ],
)
def test_psp_backbone_forward_parity(backend, psp, deep, conv_key, tol):
    from model.pspnet import PSPNet as RefPSPNet

    ref = RefPSPNet(
        sizes=(1, 2, 3, 6), n_classes=12, psp_size=psp,
        deep_features_size=deep, backend=backend, pretrained=False,
    ).eval()
    x = _x()
    with torch.no_grad():
        out, cls, p = ref(torch.from_numpy(x))

    model = PSPNet(
        n_classes=12, psp_size=psp, deep_features_size=deep, backend=backend
    )
    params = convert_state_dict(ref_state_dict(ref), conv_key)
    got_out, got_cls, got_p = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(got_out, out, tol)
    _assert_close(got_p, p, tol)
    np.testing.assert_allclose(np.asarray(got_cls), cls.numpy(), rtol=tol, atol=tol)


def test_densenet_key_conversion_covers_tree():
    """Converted torch keys must exactly cover our init tree (no orphans)."""
    from model.pspnet import PSPNet as RefPSPNet
    import jax

    ref = RefPSPNet(
        sizes=(1, 2, 3, 6), n_classes=12, psp_size=1024,
        deep_features_size=512, backend="densenet", pretrained=False,
    )
    conv = convert_state_dict(ref_state_dict(ref), "psp-densenet")
    ours = PSPNet(
        n_classes=12, psp_size=1024, deep_features_size=512, backend="densenet"
    ).init(jax.random.PRNGKey(0))

    def paths(tree, prefix=""):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, prefix + k + ".")
            else:
                out.add(prefix + k)
        return out

    ours_p = paths(ours)
    conv_p = paths(conv)
    assert ours_p <= conv_p, sorted(ours_p - conv_p)[:10]
