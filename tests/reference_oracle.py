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

    # the reference's DenseNet registers modules as 'norm.1'/'conv.2'
    # (torch 1.7 allowed dots, `model/extractors.py:168-175`); torch 2.x
    # raises. Sanitize at registration — oracle state_dict keys then come
    # out dot-free ('norm1'), matching our tree directly (checkpoints
    # saved by torch 1.7 keep dots and go through the converter's
    # SUBSTITUTIONS instead).
    _orig_add_module = nn.Module.add_module

    def _add_module(self, name, module):
        return _orig_add_module(self, name.replace(".", ""), module)

    nn.Module.add_module = _add_module

    # torchvision is absent in this image; the reference only needs
    # densenet121/squeezenet1_1 factories, which our tests never exercise.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        dn = types.ModuleType("torchvision.models.densenet")
        sq = types.ModuleType("torchvision.models.squeezenet")

        def _unavailable(*a, **k):
            raise RuntimeError("torchvision stub: pretrained factory unavailable")

        def _dummy_densenet121(*a, **k):
            # reference DenseNet.__init__ unconditionally lists the
            # torchvision features (`model/extractors.py:225`); with
            # pretrained=False nothing is loaded from them, so an empty
            # children() satisfies it
            return types.SimpleNamespace(
                features=types.SimpleNamespace(children=lambda: [])
            )

        dn.densenet121 = _dummy_densenet121
        sq.squeezenet1_1 = _unavailable
        tv.models = tvm
        tvm.densenet = dn
        tvm.squeezenet = sq
        # dataset modules do `import torchvision.transforms` at module scope
        # (used only inside their __getitem__, which oracle tests never call)
        tvt = types.ModuleType("torchvision.transforms")
        tv.transforms = tvt
        sys.modules.update(
            {
                "torchvision": tv,
                "torchvision.models": tvm,
                "torchvision.models.densenet": dn,
                "torchvision.models.squeezenet": sq,
                "torchvision.transforms": tvt,
            }
        )

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def ref_state_dict(module):
    return {k: v.detach().clone() for k, v in module.state_dict().items()}
