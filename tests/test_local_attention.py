"""Parity of the CReFF local-attention ops vs an nn.Unfold torch oracle
(semantics documented at reference model/attention.py:55-85)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from arseg_tpu.ops import local_similar, local_weighting, creff_attention
from arseg_tpu.ops.pallas_creff import creff_fused_pallas


def _torch_similar(query, key, kh, kw):
    """out[n,h,w,o] = sum_c q[n,c,h,w] * unfold(k)[n,c,o,h,w]."""
    n, c, h, w = query.shape
    unfold = nn.Unfold(kernel_size=(kh, kw), padding=(kh // 2, kw // 2))
    key_uf = unfold(key).view(n, c, kh * kw, h, w)
    return torch.einsum("nchw,ncohw->nhwo", query, key_uf)


def _torch_weighting(value, weight, kh, kw):
    """out[n,c,h,w] = sum_o unfold(v)[n,c,o,h,w] * w[n,h,w,o]."""
    n, c, h, w = value.shape
    unfold = nn.Unfold(kernel_size=(kh, kw), padding=(kh // 2, kw // 2))
    value_uf = unfold(value).view(n, c, kh * kw, h, w)
    return torch.einsum("ncohw,nhwo->nchw", value_uf, weight)


def _nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)


@pytest.mark.parametrize("kh,kw", [(7, 7), (3, 3), (5, 3)])
def test_local_similar(kh, kw):
    rng = np.random.RandomState(0)
    q = rng.randn(2, 10, 13, 6).astype(np.float32)
    k = rng.randn(2, 10, 13, 6).astype(np.float32)
    ref = _torch_similar(_nchw(q), _nchw(k), kh, kw).numpy()
    got = local_similar(jnp.asarray(q), jnp.asarray(k), kh, kw)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kh,kw", [(7, 7), (3, 3)])
def test_local_weighting(kh, kw):
    rng = np.random.RandomState(1)
    v = rng.randn(2, 10, 13, 6).astype(np.float32)
    w = rng.rand(2, 10, 13, kh * kw).astype(np.float32)
    ref = _torch_weighting(_nchw(v), torch.from_numpy(w), kh, kw)
    got = local_weighting(jnp.asarray(v), jnp.asarray(w), kh, kw)
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5
    )


def _torch_creff(q, k, v, kh, kw):
    w = torch.softmax(_torch_similar(q, k, kh, kw), dim=3)
    return _torch_weighting(v, w, kh, kw)


def test_creff_attention_fused_reference_path():
    rng = np.random.RandomState(2)
    q = rng.randn(1, 12, 15, 8).astype(np.float32)
    k = rng.randn(1, 12, 15, 8).astype(np.float32)
    v = rng.randn(1, 12, 15, 8).astype(np.float32)
    ref = _torch_creff(_nchw(q), _nchw(k), _nchw(v), 7, 7)
    got = creff_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 7, 7)
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
    )


def test_creff_pallas_interpret_matches_oracle():
    rng = np.random.RandomState(3)
    # non-multiple-of-tile shapes to exercise the padding path
    q = rng.randn(2, 18, 21, 8).astype(np.float32)
    k = rng.randn(2, 18, 21, 8).astype(np.float32)
    v = rng.randn(2, 18, 21, 8).astype(np.float32)
    ref = _torch_creff(_nchw(q), _nchw(k), _nchw(v), 7, 7)
    got = creff_fused_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 7, 7, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
    )


def test_creff_pallas_interpret_pick_th30():
    """h % 30 == 0 triggers the th=30 auto-tile (_pick_th); verify the
    30-row tiling path is bit-equivalent to the oracle (the production
    bise18 fusion shape is h=90)."""
    rng = np.random.RandomState(5)
    q = rng.randn(1, 30, 17, 8).astype(np.float32)
    k = rng.randn(1, 30, 17, 8).astype(np.float32)
    v = rng.randn(1, 30, 17, 8).astype(np.float32)
    ref = _torch_creff(_nchw(q), _nchw(k), _nchw(v), 7, 7)
    got = creff_fused_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 7, 7, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
    )


def test_creff_gradients_match_torch():
    rng = np.random.RandomState(4)
    qn = rng.randn(1, 9, 10, 4).astype(np.float32)
    kn = rng.randn(1, 9, 10, 4).astype(np.float32)
    vn = rng.randn(1, 9, 10, 4).astype(np.float32)

    tq, tk, tv = (_nchw(a).requires_grad_(True) for a in (qn, kn, vn))
    _torch_creff(tq, tk, tv, 3, 3).sum().backward()

    def loss(q, k, v):
        return jnp.sum(creff_attention(q, k, v, 3, 3))

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(qn), jnp.asarray(kn), jnp.asarray(vn)
    )
    for got, ref in ((gq, tq.grad), (gk, tk.grad), (gv, tv.grad)):
        np.testing.assert_allclose(
            np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
        )


def test_creff_qkv_fused_matches_composed():
    """The fully-fused MyAttention kernel (dwconv QKV + attention + residual,
    ops/pallas_creff.creff_qkv_fused) vs the composed ops."""
    import jax
    from arseg_tpu.ops.pallas_creff import creff_qkv_fused
    from arseg_tpu.ops.local_attention import _creff_reference
    from arseg_tpu.nn import functional as Fn

    rng = np.random.RandomState(7)
    c = 8
    lr_up = jnp.asarray(rng.randn(1, 21, 27, c).astype(np.float32))
    ref = jnp.asarray(rng.randn(1, 21, 27, c).astype(np.float32))
    convs = {}
    for name in ("wq", "wk", "wv"):
        convs[name] = {
            "weight": jnp.asarray(rng.randn(3, 3, 1, c).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(c).astype(np.float32)),
        }

    q = Fn.conv2d(convs["wq"], lr_up, padding=1, groups=c)
    k = Fn.conv2d(convs["wk"], ref, padding=1, groups=c)
    v = Fn.conv2d(convs["wv"], ref, padding=1, groups=c)
    want = lr_up + _creff_reference(q, k, v, 7, 7)

    got = creff_qkv_fused(
        lr_up, ref, convs["wq"], convs["wk"], convs["wv"], 7, 7,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_creff_phase2_argmax_matches_composed():
    """Head-fused inference kernel vs the composed chain (dwconv QKV ->
    attention -> residual -> final_conv -> argmax)."""
    from arseg_tpu.ops.pallas_creff import creff_phase2_argmax
    from arseg_tpu.ops.local_attention import _module_composed
    from arseg_tpu.nn import functional as Fn

    rng = np.random.RandomState(11)
    c, ncls = 8, 5
    lr_up = jnp.asarray(rng.randn(1, 21, 27, c).astype(np.float32))
    ref = jnp.asarray(rng.randn(1, 21, 27, c).astype(np.float32))
    convs = [
        {
            "weight": jnp.asarray(rng.randn(3, 3, 1, c).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(c).astype(np.float32)),
        }
        for _ in range(3)
    ]
    fc = {
        "weight": jnp.asarray(rng.randn(1, 1, c, ncls).astype(np.float32)),
        "bias": jnp.asarray(rng.randn(ncls).astype(np.float32)),
    }
    fused = _module_composed(lr_up, ref, *convs, 7, 7)
    want = np.argmax(np.asarray(Fn.conv2d(fc, fused)), axis=-1)
    got = creff_phase2_argmax(lr_up, ref, *convs, fc, 7, 7, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_creff_phase2_upsample_argmax_matches_composed():
    """BiSeNet head-fused kernel (module + final_conv + x8 bilinear
    align_corners=False + argmax) vs the composed chain; multi-tile rows
    exercise the +-1 fused-row halo of the upsample epilogue."""
    from arseg_tpu.ops.pallas_creff import creff_phase2_upsample_argmax
    from arseg_tpu.ops.local_attention import _module_composed
    from arseg_tpu.ops import resize_bilinear
    from arseg_tpu.nn import functional as Fn

    rng = np.random.RandomState(13)
    c, ncls, h, w = 8, 5, 12, 17
    lr_up = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32))
    ref = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32))
    convs = [
        {
            "weight": jnp.asarray(rng.randn(3, 3, 1, c).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(c).astype(np.float32)),
        }
        for _ in range(3)
    ]
    fc = {
        "weight": jnp.asarray(rng.randn(1, 1, c, ncls).astype(np.float32)),
        "bias": jnp.asarray(rng.randn(ncls).astype(np.float32)),
    }
    fused = _module_composed(lr_up, ref, *convs, 7, 7)
    logits = Fn.conv2d(fc, fused)
    up = resize_bilinear(logits, (h * 8, w * 8), align_corners=False)
    want = np.argmax(np.asarray(up), axis=-1)
    got = creff_phase2_upsample_argmax(
        lr_up, ref, *convs, fc, 7, 7, 8, 30, interpret=True
    )
    assert got.shape == (1, h * 8, w * 8)
    agree = np.mean(np.asarray(got) == want)
    assert agree > 0.999, agree


def test_creff_qkv_fused_prepadded_matches_padded():
    """lr_prepadded=True with resize_bilinear_padded-produced input must
    equal the wrapper-padded path (interpret mode, c lane-aligned)."""
    from arseg_tpu.ops.pallas_creff import creff_qkv_fused, qkv_fused_lr_pads
    from arseg_tpu.ops.resize import resize_bilinear, resize_bilinear_padded

    rng = np.random.RandomState(31)
    c, h, w = 128, 18, 24
    lr = jnp.asarray(rng.randn(1, 9, 12, c).astype(np.float32))
    ref = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32))
    convs = [
        {
            "weight": jnp.asarray(rng.randn(3, 3, 1, c).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(c).astype(np.float32)),
        }
        for _ in range(3)
    ]
    pads = qkv_fused_lr_pads(h, w, 7, 7)
    lrp = resize_bilinear_padded(lr, (h, w), True, pads)
    # feed the wrapper path the SAME interior bits (the resize itself may
    # differ from resize_bilinear by 1 f32 ulp — covered by test_resize) so
    # this test isolates the prepadded plumbing
    lr_up = lrp[:, pads[0][0] : pads[0][0] + h, pads[1][0] : pads[1][0] + w, :]
    want = creff_qkv_fused(lr_up, ref, *convs, 7, 7, interpret=True)
    got = creff_qkv_fused(
        lrp, ref, *convs, 7, 7, interpret=True, lr_prepadded=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="lr_prepadded"):
        creff_qkv_fused(lr_up, ref, *convs, 7, 7, interpret=True, lr_prepadded=True)


def test_creff_local_module_resize_forward_and_grads():
    """creff_local_module_resize == resize + module, and its custom VJP
    matches autodiff through the composed ops."""
    from arseg_tpu.ops.local_attention import (
        creff_local_module_resize,
        _module_resize_composed,
    )
    from arseg_tpu.ops.resize import resize_bilinear
    from arseg_tpu.ops.local_attention import creff_local_module

    rng = np.random.RandomState(32)
    c = 6
    lr = jnp.asarray(rng.randn(1, 7, 9, c).astype(np.float32))
    hr = jnp.asarray(rng.randn(1, 14, 18, c).astype(np.float32))
    convs = [
        {
            "weight": jnp.asarray(rng.randn(3, 3, 1, c).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(c).astype(np.float32)),
        }
        for _ in range(3)
    ]
    lr_up = resize_bilinear(lr, (14, 18), align_corners=True)
    want = creff_local_module(lr_up, hr, *convs, 7, 7)
    got = creff_local_module_resize(lr, hr, *convs, 7, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

    def loss_fused(lr_, hr_, w0, w1, w2):
        return jnp.sum(creff_local_module_resize(lr_, hr_, w0, w1, w2, 7, 7) ** 2)

    def loss_composed(lr_, hr_, w0, w1, w2):
        return jnp.sum(_module_resize_composed(lr_, hr_, w0, w1, w2, 7, 7) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(lr, hr, *convs)
    g_comp = jax.grad(loss_composed, argnums=(0, 1, 2))(lr, hr, *convs)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused), jax.tree_util.tree_leaves(g_comp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_use_fused_resize_flag_cpu_equivalence(monkeypatch):
    """With USE_FUSED_RESIZE on, the local attention factory output is
    unchanged (CPU routes both flags through the composed ops — this guards
    the plumbing, the TPU numerics are guarded by the prepadded test)."""
    import arseg_tpu.nn.attention as attention

    init, apply = attention.get_fusion("local", atten_k=7)
    rng = np.random.RandomState(33)
    c = 6
    from arseg_tpu.nn.init import RngStream
    p = init(RngStream(jax.random.PRNGKey(0)), c)
    hr = jnp.asarray(rng.randn(1, 14, 18, c).astype(np.float32))
    lr = jnp.asarray(rng.randn(1, 7, 9, c).astype(np.float32))
    base = apply(p, hr, lr)
    monkeypatch.setattr(attention, "USE_FUSED_RESIZE", True)
    flipped = apply(p, hr, lr)
    np.testing.assert_allclose(np.asarray(flipped), np.asarray(base), rtol=1e-6, atol=1e-6)
