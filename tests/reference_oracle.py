"""Load the UNMODIFIED reference implementation (/root/reference) as a torch
oracle for end-to-end model parity tests.

We stub the `localAttention` CUDA extension with unfold-based equivalents and
neutralize `model_zoo.load_url` (zero egress -> pretrained downloads become
no-ops; models keep their random init, which is all parity tests need).
This imports reference code at test time only — nothing is copied into the
framework.
"""

import sys
import types

import torch
import torch.nn as nn


def _similar_forward(query, key, kh, kw):
    n, c, h, w = query.shape
    unfold = nn.Unfold(kernel_size=(kh, kw), padding=(kh // 2, kw // 2))
    key_uf = unfold(key).view(n, c, kh * kw, h, w)
    return torch.einsum("nchw,ncohw->nhwo", query, key_uf)


def _weighting_forward(value, weight, kh, kw):
    n, c, h, w = value.shape
    unfold = nn.Unfold(kernel_size=(kh, kw), padding=(kh // 2, kw // 2))
    value_uf = unfold(value).view(n, c, kh * kw, h, w)
    return torch.einsum("ncohw,nhwo->nchw", value_uf, weight)


def install_reference():
    if "localAttention" not in sys.modules:
        stub = types.ModuleType("localAttention")
        stub.similar_forward = _similar_forward
        stub.weighting_forward = _weighting_forward
        for name in (
            "similar_backward",
            "weighting_backward_ori",
            "weighting_backward_weight",
        ):
            setattr(
                stub,
                name,
                lambda *a, **k: (_ for _ in ()).throw(
                    NotImplementedError("oracle stub is forward-only")
                ),
            )
        sys.modules["localAttention"] = stub

    import torch.utils.model_zoo as mz

    mz.load_url = lambda *a, **k: {}

    # torchvision is absent in this image; the reference only needs
    # densenet121/squeezenet1_1 factories, which our tests never exercise.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        dn = types.ModuleType("torchvision.models.densenet")
        sq = types.ModuleType("torchvision.models.squeezenet")

        def _unavailable(*a, **k):
            raise RuntimeError("torchvision stub: pretrained factory unavailable")

        dn.densenet121 = _unavailable
        sq.squeezenet1_1 = _unavailable
        tv.models = tvm
        tvm.densenet = dn
        tvm.squeezenet = sq
        sys.modules.update(
            {
                "torchvision": tv,
                "torchvision.models": tvm,
                "torchvision.models.densenet": dn,
                "torchvision.models.squeezenet": sq,
            }
        )

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def ref_state_dict(module):
    return {k: v.detach().clone() for k, v in module.state_dict().items()}
