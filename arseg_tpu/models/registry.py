"""Model registry mirroring the reference's `models` / `models_fuse` dicts
(/root/reference `evaluation.py:24-36`).

build_model(backend, fuse) -> model object with .init(key) and .apply(...).
Backends: camvid-psp18, camvid-bise18, cityscapes-psp18, cityscapes-bise18.
Note the reference uses the WithFuse class for cityscapes-psp18 in BOTH
registries; we mirror that (with_fuse=True either way).
"""

from arseg_tpu.nn.pspnet import PSPNet
from arseg_tpu.nn.pspnet_semseg import PSPNetSemseg
from arseg_tpu.nn.bisenet import BiSeNetV1


def _camvid_psp18(fuse, **kw):
    return PSPNet(
        n_classes=12,
        sizes=(1, 2, 3, 6),
        psp_size=512,
        deep_features_size=256,
        backend="resnet18",
        fuse_version=(kw.get("fuse_version", 1) if fuse else 0),
        attention_type=kw.get("attention_type", "local"),
        atten_k=kw.get("atten_k", 7),
    )


def _camvid_bise18(fuse, **kw):
    return BiSeNetV1(
        n_classes=12,
        backend="resnet18",
        aux_mode=kw.get("aux_mode", "train"),
        with_fuse=fuse,
        attention_type=kw.get("attention_type", "local"),
        atten_k=kw.get("atten_k", 7),
    )


def _cityscapes_psp18(fuse, **kw):
    return PSPNetSemseg(
        layers=18,
        bins=(1, 2, 3, 6),
        classes=19,
        feat_dim=512,
        with_fuse=True,  # reference uses the WithFuse class in both registries
        attention_type=kw.get("attention_type", "local"),
        atten_k=kw.get("atten_k", 7),
    )


def _cityscapes_bise18(fuse, **kw):
    return BiSeNetV1(
        n_classes=19,
        backend="resnet18",
        aux_mode=kw.get("aux_mode", "train"),
        with_fuse=fuse,
        attention_type=kw.get("attention_type", "local"),
        atten_k=kw.get("atten_k", 7),
    )


MODELS = {
    "camvid-psp18": _camvid_psp18,
    "camvid-bise18": _camvid_bise18,
    "cityscapes-psp18": _cityscapes_psp18,
    "cityscapes-bise18": _cityscapes_bise18,
}


_MODEL_CACHE = {}


def build_model(backend: str, fuse: bool = False, **kw):
    backend = backend.lower()
    if backend not in MODELS:
        raise KeyError(f"unknown backend {backend}; options: {sorted(MODELS)}")
    # Memoize by construction args: models are stateless (params live outside,
    # init/apply style), and the eval engines key their jitted steps on model
    # IDENTITY (engine.py lru_caches) — without this, every run_protocol call
    # builds fresh model objects and re-traces + re-lowers all 720x960 engine
    # programs (~minutes of host work per protocol invocation).
    key = (backend, bool(fuse), tuple(sorted(kw.items())))
    try:
        m = _MODEL_CACHE.get(key)
    except TypeError:  # unhashable kwarg: fall back to uncached construction
        return MODELS[backend](fuse, **kw)
    if m is None:
        m = _MODEL_CACHE[key] = MODELS[backend](fuse, **kw)
    return m


def phase2_argmax_head(model, warped_hw, out_hw):
    """The ONE dispatch predicate for the fused phase-2+argmax fast path,
    shared by the eval engine and the serving pipeline (so eval always
    evaluates exactly the head serving serves with).

    Returns model.forward_phase2_argmax when the model defines it AND its
    output resolution (warped feature x phase2_argmax_upscale — 1 for
    PSPNet's full-res fusion, 8 for BiSeNet's 1/8-res fusion) equals the
    requested out_hw, making the post-logit upsample the identity (and the
    elided log_softmax monotone). Otherwise None — callers take the
    forward_phase2 -> resize -> argmax path."""
    up = getattr(model, "phase2_argmax_upscale", 1)
    if hasattr(model, "forward_phase2_argmax") and (
        warped_hw[0] * up,
        warped_hw[1] * up,
    ) == tuple(out_hw):
        return model.forward_phase2_argmax
    return None
