"""CReFF cross-resolution fusion module family, NHWC functional.

Re-implements all fusion variants of the reference
(/root/reference `model/attention.py`), selected by the same
``attention_type`` strings as `model/pspnet.py:133-162`.  Every variant is
``apply(params, hr_feat, lr_feat) -> fused feature at HR spatial size``
(except 'no', which is bug-faithfully the identity on lr_feat,
`model/attention.py:1159-1167`).

The production variant is 'local' (MyAttention, `model/attention.py:157-213`):
depthwise-3x3 Q/K/V convs, kxk windowed similar -> softmax -> weighting, with
a residual on the upsampled LR feature.  Here the windowed attention runs
through the fused Pallas kernel (ops/local_attention.creff_attention).

Faithfulness notes:
* 'local1' maps to MyAttentionV1 in the reference registry but no such class
  exists in the snapshot (NameError there); we raise NotImplementedError.
* MyAttentionGlobal rebinds hr_feat to the value-conv output before applying
  the key conv (`model/attention.py:846-850`); replicated as-is.
"""

import jax.numpy as jnp

from arseg_tpu.nn import functional as Fn
from arseg_tpu.nn import init as Init
from arseg_tpu.ops import resize_bilinear, local_similar, local_weighting, creff_attention
from arseg_tpu.ops.local_attention import creff_local_module, creff_local_module_resize
from arseg_tpu.ops.resize import _nearest_index


def _dwconv(rng, c):
    return Init.conv_kaiming_normal_a1(rng, 3, 3, 1, c, bias=True)


def _conv(rng, cin, cout):
    return Init.conv_kaiming_normal_a1(rng, 3, 3, cin, cout, bias=True)


def _apply_dw(p, x, c):
    return Fn.conv2d(p, x, stride=1, padding=1, groups=c)


def _mha(p, q, k, v):
    """torch nn.MultiheadAttention(num_heads=1) forward on [N, L, E]."""
    e = q.shape[-1]
    wq, wk, wv = (p["in_proj_weight"][i * e : (i + 1) * e] for i in range(3))
    bq, bk, bv = (p["in_proj_bias"][i * e : (i + 1) * e] for i in range(3))
    qp = jnp.einsum("nle,fe->nlf", q, wq, precision="highest") + bq
    kp = jnp.einsum("nle,fe->nlf", k, wk, precision="highest") + bk
    vp = jnp.einsum("nle,fe->nlf", v, wv, precision="highest") + bv
    logits = jnp.einsum("nqf,nkf->nqk", qp, kp, precision="highest") / jnp.sqrt(
        jnp.float32(e)
    ).astype(q.dtype)
    attn = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    out = jnp.einsum("nqk,nkf->nqf", attn, vp, precision="highest")
    return Fn.linear(p["out_proj"], out)


def _tokens(x):
    n, h, w, c = x.shape
    return x.reshape(n, h * w, c)


# ---------------------------------------------------------------- local family


def _init_local(rng, c, k, with_value=True, groups=None):
    g = c if groups is None else groups
    cin_pg = c // g
    mk = lambda: Init.conv_kaiming_normal_a1(rng, 3, 3, cin_pg, c, bias=True)
    p = {"lr_query_conv": mk(), "hr_key_conv": mk()}
    if with_value:
        p["hr_value_conv"] = mk()
    return p


def _local_qkv(p, hr, lr_up, c, groups, with_value):
    g = c if groups is None else groups
    q = Fn.conv2d(p["lr_query_conv"], lr_up, padding=1, groups=g)
    k = Fn.conv2d(p["hr_key_conv"], hr, padding=1, groups=g)
    v = Fn.conv2d(p["hr_value_conv"], hr, padding=1, groups=g) if with_value else hr
    return q, k, v


# dispatch switch for the fused MyAttention kernel (A/B benchmarking)
USE_FUSED_MODULE = True
# route the lr->hr upsample through creff_local_module_resize, which on TPU
# emits lr_up directly in the kernel's padded geometry (one HBM write instead
# of resize-write + pad round trip). Measured on v5e (tools_probe_r3n.py):
# -0.31 ms/GOP at B=1 (15.79 -> 15.48 ms) and -1.15 ms/call at B=8. f32 is
# bit-identical to the composed path; bf16 interiors differ by 1 ulp
# (argmax tie flips only).
USE_FUSED_RESIZE = True


def _make_local(kk, with_value=True, groups=None, residual=True):
    def init(rng, c):
        return _init_local(rng, c, kk, with_value, groups)

    def apply(p, hr, lr):
        c = hr.shape[-1]
        if with_value and residual and groups is None and USE_FUSED_MODULE:
            # production MyAttention shape: on TPU one kernel fuses the
            # three 3x3 depthwise convs + windowed attention + residual,
            # saving three depthwise-conv HBM round trips (~15 ms/frame at
            # 720x960x64); differentiable via the composed-ops VJP
            qkv = (p["lr_query_conv"], p["hr_key_conv"], p["hr_value_conv"])
            if USE_FUSED_RESIZE:
                return creff_local_module_resize(lr, hr, *qkv, kk, kk)
            lr_up = resize_bilinear(lr, hr.shape[1:3], align_corners=True)
            return creff_local_module(lr_up, hr, *qkv, kk, kk)
        lr_up = resize_bilinear(lr, hr.shape[1:3], align_corners=True)
        q, k, v = _local_qkv(p, hr, lr_up, c, groups, with_value)
        attn = creff_attention(q, k, v, kk, kk)
        return lr_up + attn if residual else attn

    return init, apply


def _make_local_strided(kk, scale):
    """MyAttentionV4/V5/V6 (`model/attention.py:509-738`): K/V downsampled by
    `scale`, queries processed on a strided sub-grid and re-interleaved."""

    def init(rng, c):
        return _init_local(rng, c, kk, with_value=True, groups=None)

    def apply(p, hr, lr):
        c = hr.shape[-1]
        h, w = hr.shape[1:3]
        lr_up = resize_bilinear(lr, (h, w), align_corners=True)
        q, k, v = _local_qkv(p, hr, lr_up, c, None, True)
        k = resize_bilinear(k, (h // scale, w // scale), align_corners=True)
        v = resize_bilinear(v, (h // scale, w // scale), align_corners=True)
        attn = jnp.zeros_like(lr_up)
        for i in range(scale):
            for j in range(scale):
                sub = creff_attention(q[:, i::scale, j::scale], k, v, kk, kk)
                attn = attn.at[:, i::scale, j::scale].set(sub)
        return lr_up + attn

    return init, apply


def _make_local_new(kk):
    """MyAttentionLocalNew (`model/attention.py:743-799`): attention computed
    at LR resolution, weights upsampled (1-D nearest over the window dim via
    F.upsample default, then spatial bilinear AC=True), weighting at HR with
    a scaled window."""

    def init(rng, c):
        return {"lr_query_conv": _dwconv(rng, c), "hr_key_conv": _dwconv(rng, c)}

    def apply(p, hr, lr):
        c = hr.shape[-1]
        n, h_hr, w_hr, _ = hr.shape
        h, w = lr.shape[1:3]
        skh = int(kk * (h_hr / h))
        skw = int(kk * (w_hr / w))
        hr_ds = resize_bilinear(hr, (h, w), align_corners=True)
        k = _apply_dw(p["hr_key_conv"], hr_ds, c)
        q = _apply_dw(p["lr_query_conv"], lr, c)
        wgt = local_similar(q, k, kk, kk)  # [N, h, w, kk*kk]
        idx = jnp.asarray(_nearest_index(kk * kk, skh * skw))
        wgt = jnp.take(wgt, idx, axis=-1)  # 1-D nearest over window dim
        wgt = resize_bilinear(wgt, (h_hr, w_hr), align_corners=True)
        wgt = jnp.exp(wgt - jnp.max(wgt, axis=-1, keepdims=True))
        wgt = wgt / jnp.sum(wgt, axis=-1, keepdims=True)
        attn = local_weighting(hr, wgt, skh, skw)
        lr_up = resize_bilinear(lr, (h_hr, w_hr), align_corners=True)
        return lr_up + attn

    return init, apply


# --------------------------------------------------------------- global family


def _make_global(kscale):
    """MyAttentionGlobal (`model/attention.py:819-868`). Note the reference
    rebinds hr_feat to the value-conv output before the key conv."""

    def init(rng, c):
        return {
            "lr_query_conv": _dwconv(rng, c),
            "hr_key_conv": _dwconv(rng, c),
            "hr_value_conv": _dwconv(rng, c),
            "attention": Init.mha_default(rng, c),
        }

    def apply(p, hr, lr):
        c = hr.shape[-1]
        h, w = hr.shape[1:3]
        lr_up = resize_bilinear(lr, (h, w), align_corners=True)
        hr2 = _apply_dw(p["hr_value_conv"], hr, c)  # rebinds, as in reference
        v = _tokens(resize_bilinear(hr2, (h // kscale, w // kscale), align_corners=True))
        k = _apply_dw(p["hr_key_conv"], hr2, c)
        k = _tokens(resize_bilinear(k, (h // kscale, w // kscale), align_corners=True))
        q = _tokens(_apply_dw(p["lr_query_conv"], lr_up, c))
        attn = _mha(p["attention"], q, k, v).reshape(lr_up.shape)
        return lr_up + attn

    return init, apply


def _global_only_init(rng, c):
    return {
        "lr_query_conv": _dwconv(rng, c),
        "hr_key_conv": _dwconv(rng, c),
        "attention": Init.mha_default(rng, c),
    }


def _global_only_apply(p, hr, lr):
    c = hr.shape[-1]
    h, w = hr.shape[1:3]
    lr_up = resize_bilinear(lr, (h, w), align_corners=True)
    v = _tokens(resize_bilinear(hr, (h // 16, w // 16), align_corners=True))
    k = _apply_dw(p["hr_key_conv"], hr, c)
    k = _tokens(resize_bilinear(k, (h // 16, w // 16), align_corners=True))
    q = _tokens(_apply_dw(p["lr_query_conv"], lr_up, c))
    return _mha(p["attention"], q, k, v).reshape(lr_up.shape)


def _global_nogroup_init(rng, c):
    return {
        "lr_query_conv": _conv(rng, c, c // 4),
        "hr_key_conv": _conv(rng, c, c // 4),
        "hr_value_conv": _conv(rng, c, c // 4),
        "value_trans_conv": Init.conv_kaiming_normal_a1(rng, 1, 1, c // 4, c, bias=True),
        "attention": Init.mha_default(rng, c // 4),
    }


def _global_nogroup_apply(p, hr, lr):
    h, w = hr.shape[1:3]
    n = hr.shape[0]
    lr_up = resize_bilinear(lr, (h, w), align_corners=True)
    v = Fn.conv2d(p["hr_value_conv"], hr, padding=1)
    v = _tokens(resize_bilinear(v, (h // 16, w // 16), align_corners=True))
    k = Fn.conv2d(p["hr_key_conv"], hr, padding=1)
    k = _tokens(resize_bilinear(k, (h // 16, w // 16), align_corners=True))
    q = _tokens(Fn.conv2d(p["lr_query_conv"], lr_up, padding=1))
    attn = _mha(p["attention"], q, k, v).reshape(n, h, w, -1)
    return lr_up + Fn.conv2d(p["value_trans_conv"], attn)


def _self_apply(p, hr, lr):
    c = hr.shape[-1]
    h, w = hr.shape[1:3]
    lr_up = resize_bilinear(lr, (h, w), align_corners=True)
    v = _tokens(resize_bilinear(lr_up, (h // 16, w // 16), align_corners=True))
    k = _apply_dw(p["hr_key_conv"], lr_up, c)
    k = _tokens(resize_bilinear(k, (h // 16, w // 16), align_corners=True))
    q = _tokens(_apply_dw(p["lr_query_conv"], lr_up, c))
    attn = _mha(p["attention"], q, k, v).reshape(lr_up.shape)
    return lr_up + attn


# ------------------------------------------------------------- trivial family


def _identity_init(rng, c):
    # the reference's MyAttentionNo/Upsample still own (unused) conv+MHA params
    return {
        "lr_query_conv": _dwconv(rng, c),
        "hr_key_conv": _dwconv(rng, c),
        "attention": Init.mha_default(rng, c),
    }


def _conv_fusion_init(rng, c):
    return {"fusion_conv": Init.conv_kaiming_normal_a1(rng, 3, 3, 2 * c, c, bias=True)}


def _conv_fusion_apply(p, hr, lr):
    lr_up = resize_bilinear(lr, hr.shape[1:3], align_corners=True)
    return Fn.conv2d(p["fusion_conv"], jnp.concatenate([lr_up, hr], axis=-1), padding=1)


def _unimplemented(*_a, **_k):
    raise NotImplementedError(
        "'local1' maps to MyAttentionV1, which does not exist in the reference "
        "snapshot either (NameError at model/pspnet.py:140)"
    )


def get_fusion(attention_type: str, atten_k: int = 7):
    """Return (init_fn(rng, feat_dim) -> params, apply_fn(p, hr, lr) -> out).

    Names follow the reference registry (`model/pspnet.py:133-162`)."""
    table = {
        "local": lambda: _make_local(atten_k, with_value=True),
        "localDup": lambda: _make_local(atten_k, with_value=False),
        "localNoGroup": lambda: _make_local(atten_k, with_value=True, groups=1),
        "localOnly": lambda: _make_local(atten_k, with_value=True, residual=False),
        "local1": lambda: (_unimplemented, _unimplemented),
        "local2": lambda: _make_local(atten_k, with_value=False, groups=8),
        "local3": lambda: _make_local(atten_k, with_value=True, groups=8),
        "local4": lambda: _make_local_strided(atten_k, 4),
        "local5": lambda: _make_local_strided(atten_k, 2),
        "local6": lambda: _make_local_strided(atten_k, 1),
        "localNew": lambda: _make_local_new(atten_k),
        "global": lambda: _make_global(atten_k),
        "globalOnly": lambda: (_global_only_init, _global_only_apply),
        "globalNoGroup": lambda: (_global_nogroup_init, _global_nogroup_apply),
        "self": lambda: (_identity_init, _self_apply),
        "no": lambda: (_identity_init, lambda p, hr, lr: lr),
        "upsample": lambda: (
            _identity_init,
            lambda p, hr, lr: resize_bilinear(lr, hr.shape[1:3], align_corners=True),
        ),
        "conv": lambda: (_conv_fusion_init, _conv_fusion_apply),
    }
    if attention_type not in table:
        raise KeyError(f"unknown attention_type: {attention_type}")
    return table[attention_type]()
