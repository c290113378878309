"""CReFF local cross-attention ops, NHWC layout.

TPU-native equivalent of the reference's CUDA `localAttention` extension
(`f_similar` / `f_weighting`, /root/reference `model/attention.py:7-53`, CPU
semantics documented by the unfold versions at `model/attention.py:55-85`):

  similar:   w[n,y,x,o]  = sum_c q[n,y,x,c] * k[n, y+dy-kh//2, x+dx-kw//2, c]
  weighting: out[n,y,x,c] = sum_o w[n,y,x,o] * v[n, y+dy-kh//2, x+dx-kw//2, c]

with o = dy*kw + dx enumerated row-major and zero padding outside the image —
note zero padding means out-of-bounds window positions contribute logit 0 (not
-inf) to the softmax, exactly like nn.Unfold.

Two implementations:
  * `local_similar` / `local_weighting`: pure-jnp shifted-slice formulation
    (the oracle; XLA fuses it reasonably well, used for autodiff backward).
  * `creff_attention`: the fused similar->softmax->weighting composite. On TPU
    it dispatches to the Pallas kernel (ops/pallas_creff.py) which never
    materializes the [N,H,W,kh*kw] weight tensor in HBM; elsewhere it uses the
    jnp path. Wrapped in custom_vjp: backward re-derives gradients from the
    jnp composition (rematerialized, FLOPs are cheap relative to HBM traffic).
"""

import functools

import jax
import jax.numpy as jnp


def _offsets(kh, kw):
    return [(dy, dx) for dy in range(kh) for dx in range(kw)]


def _pad_hw(x, kh, kw):
    ph, pw = kh // 2, kw // 2
    return jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))


def local_similar(q, k, kh: int, kw: int):
    """q, k: [N,H,W,C] -> [N,H,W,kh*kw] neighborhood dot products."""
    n, h, w, c = q.shape
    kp = _pad_hw(k, kh, kw)
    sims = [
        jnp.sum(q * jax.lax.dynamic_slice(kp, (0, dy, dx, 0), (n, h, w, c)), axis=-1)
        for dy, dx in _offsets(kh, kw)
    ]
    return jnp.stack(sims, axis=-1)


def local_weighting(v, wgt, kh: int, kw: int):
    """v: [N,H,W,C], wgt: [N,H,W,kh*kw] -> [N,H,W,C] weighted neighborhood sum."""
    n, h, w, c = v.shape
    vp = _pad_hw(v, kh, kw)
    out = jnp.zeros_like(v)
    for o, (dy, dx) in enumerate(_offsets(kh, kw)):
        out = out + wgt[..., o : o + 1] * jax.lax.dynamic_slice(
            vp, (0, dy, dx, 0), (n, h, w, c)
        )
    return out


def _creff_reference(q, k, v, kh: int, kw: int):
    wgt = jax.nn.softmax(local_similar(q, k, kh, kw), axis=-1)
    return local_weighting(v, wgt, kh, kw)


def _use_pallas():
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def creff_attention(q, k, v, kh: int, kw: int):
    """Fused local cross-attention: softmax(similar(q,k)) weighted sum of v."""
    if _use_pallas():
        from arseg_tpu.ops.pallas_creff import creff_fused_pallas

        return creff_fused_pallas(q, k, v, kh, kw)
    return _creff_reference(q, k, v, kh, kw)


def _creff_fwd(q, k, v, kh, kw):
    return creff_attention(q, k, v, kh, kw), (q, k, v)


def _creff_bwd(kh, kw, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _creff_reference(q_, k_, v_, kh, kw), q, k, v)
    return vjp(g)


creff_attention.defvjp(_creff_fwd, _creff_bwd)


def _dwconv3(p, x, c):
    from arseg_tpu.nn import functional as Fn

    return Fn.conv2d(p, x, padding=1, groups=c)


def _module_composed(lr_up, hr, wq, wk, wv, kh, kw):
    c = hr.shape[-1]
    q = _dwconv3(wq, lr_up, c)
    k = _dwconv3(wk, hr, c)
    v = _dwconv3(wv, hr, c)
    return lr_up + _creff_reference(q, k, v, kh, kw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def creff_local_module(lr_up, hr, wq, wk, wv, kh: int, kw: int):
    """Whole MyAttention forward (3x3 depthwise Q/K/V + local attention +
    residual, reference `model/attention.py:157-213`). On TPU dispatches to
    the fully-fused kernel; backward always re-derives through the composed
    ops (pallas_call is not differentiable)."""
    if _use_pallas():
        from arseg_tpu.ops.pallas_creff import creff_qkv_fused

        return creff_qkv_fused(lr_up, hr, wq, wk, wv, kh, kw)
    return _module_composed(lr_up, hr, wq, wk, wv, kh, kw)


def _module_fwd(lr_up, hr, wq, wk, wv, kh, kw):
    return creff_local_module(lr_up, hr, wq, wk, wv, kh, kw), (lr_up, hr, wq, wk, wv)


def _module_bwd(kh, kw, res, g):
    lr_up, hr, wq, wk, wv = res
    _, vjp = jax.vjp(
        lambda a, b, c_, d, e: _module_composed(a, b, c_, d, e, kh, kw),
        lr_up, hr, wq, wk, wv,
    )
    return vjp(g)


creff_local_module.defvjp(_module_fwd, _module_bwd)


def _module_resize_composed(lr, hr, wq, wk, wv, kh, kw):
    from arseg_tpu.ops.resize import resize_bilinear

    lr_up = resize_bilinear(lr, hr.shape[1:3], align_corners=True)
    return _module_composed(lr_up, hr, wq, wk, wv, kh, kw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def creff_local_module_resize(lr, hr, wq, wk, wv, kh: int, kw: int):
    """MyAttention forward taking lr at its NATIVE (pre-upsample) resolution:
    bilinear-resize-to-hr + module in one go (reference `model/attention.py:
    157-213` upsamples lr first, then runs the module).

    On TPU with lane-aligned channels the resize runs as zero-padded
    constant-matrix matmuls that emit lr_up directly in the fused kernel's
    padded input geometry (resize_bilinear_padded + qkv_fused_lr_pads) — the
    resized map is written to HBM once instead of resize-write, pad-read,
    pad-write. Elsewhere (and for backward) it is the composed resize +
    module. bf16 interiors may differ from the composed form by 1 ulp (see
    resize_bilinear_padded)."""
    from arseg_tpu.ops.resize import resize_bilinear, resize_bilinear_padded

    h, w, c = hr.shape[1], hr.shape[2], hr.shape[3]
    if _use_pallas() and c % 128 == 0 and lr.shape[1:3] != (h, w):
        from arseg_tpu.ops.pallas_creff import creff_qkv_fused, qkv_fused_lr_pads

        pads = qkv_fused_lr_pads(h, w, kh, kw)
        lrp = resize_bilinear_padded(lr, (h, w), True, pads)
        return creff_qkv_fused(lrp, hr, wq, wk, wv, kh, kw, lr_prepadded=True)
    lr_up = resize_bilinear(lr, (h, w), align_corners=True)
    return creff_local_module(lr_up, hr, wq, wk, wv, kh, kw)


def _module_resize_fwd(lr, hr, wq, wk, wv, kh, kw):
    return (
        creff_local_module_resize(lr, hr, wq, wk, wv, kh, kw),
        (lr, hr, wq, wk, wv),
    )


def _module_resize_bwd(kh, kw, res, g):
    lr, hr, wq, wk, wv = res
    _, vjp = jax.vjp(
        lambda a, b, c_, d, e: _module_resize_composed(a, b, c_, d, e, kh, kw),
        lr, hr, wq, wk, wv,
    )
    return vjp(g)


creff_local_module_resize.defvjp(_module_resize_fwd, _module_resize_bwd)
