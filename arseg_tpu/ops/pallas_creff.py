"""Fused CReFF local-attention Pallas TPU kernel (banded-matmul MXU form).

Replaces the reference's three-pass CUDA pipeline (`similar_forward` ->
softmax -> `weighting_forward`, /root/reference `model/attention.py:13-53`)
with one fused kernel that never materializes the [N, H, W, kh*kw] weight
tensor in HBM.

Formulation. Per output row y and vertical offset dy, the window logits
  sims[x, dx] = sum_c q[y, x, c] * k[y+dy-ph, x+dx-pw, c]
are the 7-diagonal band of the [TW, TW+kw-1] matmul
  S_dy = Q_row . K_row(y+dy)^T        <- MXU
Rather than extracting diagonals (a VPU-hostile row-dependent shift), the
band stays in matrix form: the kh dy-blocks are concatenated into ONE wide
batched dot per pass (small separate dots measured 2.9 TF/s vs the chip's
55 — MXU per-instruction overhead dominates tiny matmuls), out-of-band
entries are masked to -inf, the softmax runs jointly across the blocks, and
the weighting dot sums over the band automatically. Out-of-image window
positions read zero-padded k/v, giving logit 0 and value 0 — bit-matching
the reference's unfold CPU oracle (`model/attention.py:55-85`).

Halo delivery: k/v stay UNEXPANDED in HBM; each grid step issues manual
double-buffered DMAs of its overlapping (th+kh-1, tw+kw-1) halo window.
Ablation at 720x960x64 bf16: in-kernel compute is ~1 ms, while the previous
XLA-side halo-tile expansion (overlapping jnp.stack slices) cost ~4.7 ms
PER TENSOR — the expansion was ~95%% of the old 10 ms kernel time.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _pick_th(h, th):
    """Tile-height auto-select: when the default th does not divide h but 30
    does, use 30 — measured best at the bise18 fusion shape [90,120,256]
    (0.334 vs 0.367 ms/frame at th=16, tools_probe_r3c) and removes the
    90->96 row-padding waste. Callers that pass a dividing th are left
    untouched (camvid-psp18 720 rows: 720%16==0, stays 16).

    ARSEG_CREFF_TH overrides (when it divides h) — a tuning knob for
    per-shape sweeps; production defaults are the measured winners.
    Caveats: read at TRACE time, so it only affects shapes that have not
    compiled yet in this process (set it before the first call; jit caches
    keep the old th afterwards), and creff_phase2_upsample_argmax consults
    _pick_th only when the caller's th does NOT divide h."""
    import os

    ov = int(os.environ.get("ARSEG_CREFF_TH", "0"))
    if ov and h % ov == 0:
        return ov
    if h % th and h % 18 == 0:
        # th=18 supersedes 30 for non-16-divisible heights (the bise18/
        # psp18-V2 fusion shapes, h=90): production A/B r5f measured
        # pool-half+th18 faster than pool-half+th30 in BOTH sessions
        # (12.19 vs 12.55 and 12.29 vs 12.46 ms/GOP, equal checksums;
        # bench_logs/r5queue_r5f*.log) and the isolated kernel sweep
        # ranked th18 first (r5e, max|d|=0 vs th30).
        return 18
    if h % th and h % 30 == 0:
        return 30
    return th


def _kernel(
    q_ref, kp_ref, vp_ref, out_ref, kbuf, vbuf, sems, *, kh, kw, th, tw, twd, nh, nw, c
):
    f32 = jnp.float32
    a = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    step = (a * nh + i) * nw + j
    total = pl.num_programs(0) * nh * nw
    slot = jax.lax.rem(step, 2)

    def dma(dst_slot, a2, i2, j2, which):
        src = kp_ref if which == 0 else vp_ref
        buf = kbuf if which == 0 else vbuf
        return pltpu.make_async_copy(
            src.at[a2, pl.ds(i2 * th, th + kh - 1), pl.ds(j2 * tw, twd), :],
            buf.at[dst_slot],
            sems.at[dst_slot, which],
        )

    @pl.when(step == 0)
    def _warmup():
        dma(slot, a, i, j, 0).start()
        dma(slot, a, i, j, 1).start()

    @pl.when(step + 1 < total)
    def _prefetch():
        nxt = step + 1
        j2 = jax.lax.rem(nxt, nw)
        i2 = jax.lax.rem(nxt // nw, nh)
        a2 = nxt // (nh * nw)
        nslot = jax.lax.rem(nxt, 2)
        dma(nslot, a2, i2, j2, 0).start()
        dma(nslot, a2, i2, j2, 1).start()

    dma(slot, a, i, j, 0).wait()
    dma(slot, a, i, j, 1).wait()

    q = q_ref[0]  # [TH, TW, C]
    kt = kbuf[slot]  # [TH+kh-1, TWD, C]
    vt = vbuf[slot]
    twh = tw + kw - 1
    twp = twd  # per-dy block width (DMA window, already lane/sublane aligned)
    neg_inf = jnp.float32(-jnp.inf)

    kcat = jnp.concatenate([kt[dy : dy + th] for dy in range(kh)], axis=1)
    vcat = jnp.concatenate([vt[dy : dy + th] for dy in range(kh)], axis=1)

    dn_qk = (((2,), (2,)), ((0,), (0,)))  # [TH,TW,C].[TH,kh*TWP,C] -> [TH,TW,kh*TWP]
    dn_pv = (((2,), (1,)), ((0,), (0,)))  # [TH,TW,kh*TWP].[TH,kh*TWP,C] -> [TH,TW,C]

    # precision=HIGHEST for f32 inputs: Mosaic's default lowers f32 matmuls
    # through single-pass bf16 (measured 1e-1 logit error vs the CPU oracle;
    # HIGHEST restores 1e-5 at ~1.6x kernel cost — the parity path). bf16
    # inputs reject an fp32 contract precision, so they keep the default.
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    logits = jax.lax.dot_general(
        q, kcat, dn_qk, preferred_element_type=f32, precision=prec
    )

    # in-window iff j_local - x in [0, kw) and j_local < twh, per dy block
    jj = jax.lax.broadcasted_iota(jnp.int32, (tw, kh * twp), 1) % twp
    xx = jax.lax.broadcasted_iota(jnp.int32, (tw, kh * twp), 0)
    # (twp == twd: DMA may haul a few columns past the logical window; the
    # jj < twh clause below masks them out of the softmax)
    band = (jj >= xx) & (jj < xx + kw) & (jj < twh)

    sall = jnp.where(band[None], logits, neg_inf)  # [TH, TW, kh*TWP]
    m = jnp.max(sall, axis=2)
    e = jnp.exp(sall - m[..., None])
    p = (e / jnp.sum(e, axis=2)[..., None]).astype(vt.dtype)
    acc = jax.lax.dot_general(
        p, vcat, dn_pv, preferred_element_type=f32, precision=prec
    )
    out_ref[0] = acc[..., :c].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def creff_fused_pallas(
    q, k, v, kh: int, kw: int, th: int = 16, tw: int = 120, interpret: bool = False
):
    """softmax(local_similar(q, k)) weighted sum of v, fused. NHWC in/out.

    Default tw=120 (divisible by 8, as TPU block specs require) makes the
    banded matmul width tw+kw-1 = 126, padded to one 128-lane MXU pass —
    tw=128 (width 134 -> 256) would halve MXU utilization.
    """
    n, h, w, c = q.shape
    tw = min(tw, _cdiv(w, 128) * 128)
    th = _pick_th(h, th)
    hp = _cdiv(h, th) * th
    wp = _cdiv(w, tw) * tw
    nh, nw = hp // th, wp // tw
    ph, pw = kh // 2, kw // 2
    # manual DMA constraints: lane dim 128-aligned, sublane (second-minor)
    # slice sizes 8-aligned. Padding C is physically free (the T(8,128)
    # tiled HBM layout pads the minor dim anyway); zero channels/columns
    # contribute nothing to the contractions, out-of-row columns are cut by
    # the band mask (jj < twh).
    cp = _cdiv(c, 128) * 128
    twd = _cdiv(tw + kw - 1, 8) * 8  # DMA window width

    qp = jnp.pad(q, ((0, 0), (0, hp - h), (0, wp - w), (0, cp - c)))
    wpad = wp - w + pw + (twd - (tw + kw - 1))
    kp = jnp.pad(k, ((0, 0), (ph, hp - h + ph), (pw, wpad), (0, cp - c)))
    vp = jnp.pad(v, ((0, 0), (ph, hp - h + ph), (pw, wpad), (0, cp - c)))

    out = pl.pallas_call(
        functools.partial(
            _kernel, kh=kh, kw=kw, th=th, tw=tw, twd=twd, nh=nh, nw=nw, c=c
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, c), q.dtype),
        grid=(n, nh, nw),
        in_specs=[
            pl.BlockSpec(
                (1, th, tw, cp), lambda a, b, d: (a, b, d, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, c), lambda a, b, d: (a, b, d, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + kh - 1, twd, cp), q.dtype),
            pltpu.VMEM((2, th + kh - 1, twd, cp), q.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * hp * wp * c * kh * (tw + kw - 1),
            bytes_accessed=4 * n * hp * wp * c * 4,
            transcendentals=n * hp * wp * kh * (tw + kw - 1),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :h, :w, :]


# --------------------------------------------------------------------------
# Fully-fused CReFF module kernel: 3x3 depthwise Q/K/V convs + windowed
# attention + residual in one pass (reference MyAttention,
# `model/attention.py:157-213`): saves three XLA depthwise-conv HBM round
# trips (~15 ms/frame at 720x960x64 bf16) plus the residual-add pass.
# Exact math — the dwconvs run on the same zero-padded neighborhoods XLA
# would use; attention semantics identical to creff_fused_pallas.


def _fused_module_body(
    lr_ref, ref_ref, wq_ref, wk_ref, wv_ref, lbuf, rbuf, sems,
    *, kh, kw, th, tw, twd, nh, nw, img_h, img_w, rh=0,
):
    """Shared body of the fused-MyAttention kernels: double-buffered halo
    DMA of the lr/ref windows, in-VMEM 3x3 depthwise Q/K/V convs, banded
    windowed attention, residual add. Returns the fused feature tile
    [TH + 2*rh, TW, CP] in f32 (caller applies its epilogue + writes out).

    rh: extra fused-output row halo per side (0 for the plain kernels; 1 for
    the upsampling epilogue, whose bilinear row interpolation at tile edges
    needs the neighbouring tile's boundary logits — callers must pad the
    lr/ref inputs by rh more rows top+bottom)."""
    f32 = jnp.float32
    a = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    step = (a * nh + i) * nw + j
    total = pl.num_programs(0) * nh * nw
    slot = jax.lax.rem(step, 2)
    ph = kh // 2
    trh = th + 2 * rh  # fused-output rows per tile
    hw = trh + kh + 1  # ref window rows: attention halo + dwconv halo

    def dma(dst_slot, a2, i2, j2, which):
        if which == 0:
            return pltpu.make_async_copy(
                lr_ref.at[a2, pl.ds(i2 * th, trh + 2), pl.ds(j2 * tw, twd), :],
                lbuf.at[dst_slot],
                sems.at[dst_slot, 0],
            )
        return pltpu.make_async_copy(
            ref_ref.at[a2, pl.ds(i2 * th, hw), pl.ds(j2 * tw, twd), :],
            rbuf.at[dst_slot],
            sems.at[dst_slot, 1],
        )

    @pl.when(step == 0)
    def _warmup():
        dma(slot, a, i, j, 0).start()
        dma(slot, a, i, j, 1).start()

    @pl.when(step + 1 < total)
    def _prefetch():
        nxt = step + 1
        j2 = jax.lax.rem(nxt, nw)
        i2 = jax.lax.rem(nxt // nw, nh)
        a2 = nxt // (nh * nw)
        nslot = jax.lax.rem(nxt, 2)
        dma(nslot, a2, i2, j2, 0).start()
        dma(nslot, a2, i2, j2, 1).start()

    dma(slot, a, i, j, 0).wait()
    dma(slot, a, i, j, 1).wait()

    lwin = lbuf[slot]  # [TH+2, TWD, C]: lr_up rows i*th-1.., cols j*tw-1..
    rwin = rbuf[slot]  # [TH+kh+1, TWD, C]: ref rows i*th-ph-1.., cols j*tw-pw-1..

    def dw(win, w_ref, rows, cols):
        """3x3 depthwise over `win` producing [rows, cols, C]; the b-shifted
        column views are hoisted so each tap is one FMA."""
        wgt = w_ref[0]  # [3, 3, C] (+ bias at w_ref[1, 0, :] broadcast)
        acc = None
        for b in range(3):
            col = win[:, b : b + cols, :]
            for a_ in range(3):
                term = col[a_ : a_ + rows].astype(f32) * wgt[a_, b][None, None, :].astype(f32)
                acc = term if acc is None else acc + term
        return acc + w_ref[1, 0, 0][None, None, :].astype(f32)

    q = dw(lwin, wq_ref, trh, tw).astype(lwin.dtype)  # [TRH, TW, C]
    k = dw(rwin, wk_ref, trh + kh - 1, twd - 2)
    v = dw(rwin, wv_ref, trh + kh - 1, twd - 2)
    # zero out-of-image positions (the unfold's zero padding, which the
    # dwconv bias would otherwise fill; reference model/attention.py:55-85)
    gr = jax.lax.broadcasted_iota(jnp.int32, (trh + kh - 1, twd - 2, 1), 0) + i * th - ph - rh
    gc = jax.lax.broadcasted_iota(jnp.int32, (trh + kh - 1, twd - 2, 1), 1) + j * tw - (kw // 2)
    valid = (gr >= 0) & (gr < img_h) & (gc >= 0) & (gc < img_w)
    k = jnp.where(valid, k, 0.0).astype(rwin.dtype)
    v = jnp.where(valid, v, 0.0).astype(rwin.dtype)

    twh = tw + kw - 1
    twp = _cdiv(twd - 2, 128) * 128
    pad_w = twp - (twd - 2)
    kcat = jnp.concatenate(
        [jnp.pad(k[dy : dy + trh], ((0, 0), (0, pad_w), (0, 0))) for dy in range(kh)],
        axis=1,
    )
    vcat = jnp.concatenate(
        [jnp.pad(v[dy : dy + trh], ((0, 0), (0, pad_w), (0, 0))) for dy in range(kh)],
        axis=1,
    )

    dn_qk = (((2,), (2,)), ((0,), (0,)))
    dn_pv = (((2,), (1,)), ((0,), (0,)))
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    logits = jax.lax.dot_general(q, kcat, dn_qk, preferred_element_type=f32, precision=prec)

    jj = jax.lax.broadcasted_iota(jnp.int32, (tw, kh * twp), 1) % twp
    xx = jax.lax.broadcasted_iota(jnp.int32, (tw, kh * twp), 0)
    band = (jj >= xx) & (jj < xx + kw) & (jj < twh)
    sall = jnp.where(band[None], logits, jnp.float32(-jnp.inf))
    m = jnp.max(sall, axis=2)
    e = jnp.exp(sall - m[..., None])
    p = (e / jnp.sum(e, axis=2)[..., None]).astype(v.dtype)
    acc = jax.lax.dot_general(p, vcat, dn_pv, preferred_element_type=f32, precision=prec)
    # residual: lr_up + attention (reference `model/attention.py:209-213`)
    resid = lwin[1 : 1 + trh, 1 : 1 + tw, :].astype(f32)
    return resid + acc  # [TRH, TW, CP] f32


def _qkv_kernel(
    lr_ref, ref_ref, wq_ref, wk_ref, wv_ref, out_ref, lbuf, rbuf, sems,
    *, kh, kw, th, tw, twd, nh, nw, c, img_h, img_w,
):
    fused = _fused_module_body(
        lr_ref, ref_ref, wq_ref, wk_ref, wv_ref, lbuf, rbuf, sems,
        kh=kh, kw=kw, th=th, tw=tw, twd=twd, nh=nh, nw=nw,
        img_h=img_h, img_w=img_w,
    )
    out_ref[0] = fused[..., :c].astype(out_ref.dtype)


def _qkv_geometry(h, w, c, kh, kw, th, tw):
    """Tile/pad geometry shared by creff_qkv_fused and its pad helpers."""
    tw = min(tw, _cdiv(w, 128) * 128)
    th = _pick_th(h, th)
    hp = _cdiv(h, th) * th
    wp = _cdiv(w, tw) * tw
    ph, pw = kh // 2, kw // 2
    cp = _cdiv(c, 128) * 128
    twd = _cdiv(tw + kw + 1, 8) * 8  # window cols: attn+conv halo, aligned
    return th, tw, twd, hp, wp, hp // th, wp // tw, ph, pw, cp


def qkv_fused_lr_pads(h, w, kh: int, kw: int, th: int = 16, tw: int = 120):
    """Spatial pads ((top, bottom), (left, right)) of creff_qkv_fused's lr
    input. Callers producing lr_up on the fly (resize_bilinear_padded) can
    emit it pre-padded and pass lr_prepadded=True, skipping the wrapper's
    pad round trip. Channels must already be lane-aligned (c % 128 == 0)."""
    th, tw, twd, hp, wp, *_ = _qkv_geometry(h, w, 128, kh, kw, th, tw)
    return (1, hp - h + 1), (1, wp - w + (twd - tw - 1))


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10))
def creff_qkv_fused(
    lr_up, ref, wq, wk, wv, kh: int, kw: int, th: int = 16, tw: int = 120,
    interpret: bool = False, lr_prepadded: bool = False,
):
    """Fused MyAttention forward: lr_up + weighting(softmax(similar(
    dwconv_q(lr_up), dwconv_k(ref))), dwconv_v(ref)). NHWC.

    wq/wk/wv: dicts {'weight': [3,3,1,C], 'bias': [C]} (torch depthwise
    layout from the checkpoint converter). TPU-only (manual DMA); callers
    fall back to the composed ops elsewhere.

    lr_prepadded=True: lr_up already carries the qkv_fused_lr_pads zero ring
    (e.g. straight out of resize_bilinear_padded) and c % 128 == 0 — the
    wrapper skips its lr pad pass.
    """
    n, h, w, c = ref.shape if lr_prepadded else lr_up.shape
    th, tw, twd, hp, wp, nh, nw, ph, pw, cp = _qkv_geometry(
        h, w, c, kh, kw, th, tw
    )

    # packed weights [2, 3, 3, C]: slot 0 = taps, slot [1,0,0] = bias
    def pack2(wd, dtype):
        wgt = jnp.pad(wd["weight"][:, :, 0, :], ((0, 0), (0, 0), (0, cp - c))).astype(dtype)
        bias = jnp.pad(wd["bias"], (0, cp - c)).astype(dtype)
        out = jnp.zeros((2, 3, 3, cp), dtype)
        out = out.at[0].set(wgt)
        return out.at[1, 0, 0].set(bias)

    wq_p = pack2(wq, lr_up.dtype)
    wk_p = pack2(wk, lr_up.dtype)
    wv_p = pack2(wv, lr_up.dtype)

    # lr window needs 1 halo (dwconv q + residual), ref needs ph+1
    if lr_prepadded:
        expect = (n, hp + 2, wp + (twd - tw), cp)
        if c != cp or lr_up.shape != expect:
            raise ValueError(
                f"lr_prepadded lr_up must be {expect} (c % 128 == 0), got "
                f"{lr_up.shape}; use qkv_fused_lr_pads(h={h}, w={w}, ...)"
            )
        lrp = lr_up
    else:
        lrp = jnp.pad(
            lr_up, ((0, 0), (1, hp - h + 1), (1, wp - w + (twd - tw - 1)), (0, cp - c))
        )
    refp = jnp.pad(
        ref,
        ((0, 0), (ph + 1, hp - h + ph + 1), (pw + 1, wp - w + (twd - tw - pw - 1)), (0, cp - c)),
    )

    wspec = pl.BlockSpec(
        (2, 3, 3, cp), lambda a, b, d: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _qkv_kernel, kh=kh, kw=kw, th=th, tw=tw, twd=twd, nh=nh, nw=nw,
            c=c, img_h=h, img_w=w,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, c), lr_up.dtype),
        grid=(n, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            wspec,
            wspec,
            wspec,
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, c), lambda a, b, d: (a, b, d, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, twd, cp), lr_up.dtype),
            pltpu.VMEM((2, th + kh + 1, twd, cp), lr_up.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lrp, refp, wq_p, wk_p, wv_p)
    return out[:, :h, :w, :]


# --------------------------------------------------------------------------
# Inference-only epilogue variant: fused module + 1x1 final_conv + argmax.
# The AR eval path upsamples logits to the reference HW — identity when the
# fusion already runs at full resolution — then argmaxes
# (`evaluation.py:193-207`); log_softmax is monotonic and final_conv is a
# [C, n_classes] GEMM, so the whole head collapses into the kernel and the
# [N,H,W,C] fused feature + [N,H,W,n_classes] logits never touch HBM.


def _qkv_head_kernel(
    lr_ref, ref_ref, wq_ref, wk_ref, wv_ref, fc_ref, out_ref, lbuf, rbuf, sems,
    *, kh, kw, th, tw, twd, nh, nw, c, img_h, img_w, n_classes,
):
    del n_classes
    f32 = jnp.float32
    fused = _fused_module_body(
        lr_ref, ref_ref, wq_ref, wk_ref, wv_ref, lbuf, rbuf, sems,
        kh=kh, kw=kw, th=th, tw=tw, twd=twd, nh=nh, nw=nw,
        img_h=img_h, img_w=img_w,
    )  # [TH, TW, CP]

    # head: 1x1 conv as GEMM + argmax (log_softmax is monotonic -> skipped)
    in_dtype = lr_ref.dtype if hasattr(lr_ref, "dtype") else fused.dtype
    prec = jax.lax.Precision.HIGHEST if in_dtype == jnp.float32 else None
    wfc = fc_ref[0]  # [CP, NCP]
    cls = jax.lax.dot_general(
        fused.astype(in_dtype), wfc,
        (((2,), (0,)), ((), ())), preferred_element_type=f32, precision=prec,
    ) + fc_ref[1, 0][None, None, :].astype(f32)
    pred = jnp.argmax(cls, axis=-1).astype(jnp.int32)  # [TH, TW]
    out_ref[0, 0, 0] = jnp.pad(pred, ((0, 0), (0, out_ref.shape[-1] - tw)))


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def creff_phase2_argmax(
    lr_up, ref, wq, wk, wv, fc, kh: int, kw: int, th: int = 16, tw: int = 120,
    interpret: bool = False,
):
    """Inference fast path: argmax(final_conv(MyAttention(lr_up, ref))).

    fc: {'weight': [1,1,C,n_classes], 'bias': [n_classes]}. Valid when the
    post-fusion logit upsample is the identity (AR eval at full feature
    resolution, `evaluation.py:193-207`). Returns int32 [N, H, W].
    """
    n, h, w, c = lr_up.shape
    n_classes = fc["weight"].shape[-1]
    tw = min(tw, _cdiv(w, 128) * 128)
    th = _pick_th(h, th)
    hp = _cdiv(h, th) * th
    wp = _cdiv(w, tw) * tw
    nh, nw = hp // th, wp // tw
    ph, pw = kh // 2, kw // 2
    cp = _cdiv(c, 128) * 128
    ncp = _cdiv(n_classes, 128) * 128
    twd = _cdiv(tw + kw + 1, 8) * 8

    def pack2(wd, dtype):
        wgt = jnp.pad(wd["weight"][:, :, 0, :], ((0, 0), (0, 0), (0, cp - c))).astype(dtype)
        bias = jnp.pad(wd["bias"], (0, cp - c)).astype(dtype)
        out = jnp.zeros((2, 3, 3, cp), dtype)
        out = out.at[0].set(wgt)
        return out.at[1, 0, 0].set(bias)

    wq_p = pack2(wq, lr_up.dtype)
    wk_p = pack2(wk, lr_up.dtype)
    wv_p = pack2(wv, lr_up.dtype)
    # fc packed [2, CP, NCP]: slot 0 weight, slot (1, 0) bias row; the bias
    # for padded classes is -inf so argmax never selects them
    fcw = jnp.pad(fc["weight"][0, 0], ((0, cp - c), (0, ncp - n_classes))).astype(lr_up.dtype)
    fcb = jnp.pad(
        fc["bias"].astype(jnp.float32), (0, ncp - n_classes),
        constant_values=-jnp.inf,
    )
    fc_p = jnp.zeros((2, cp, ncp), jnp.float32)
    fc_p = fc_p.at[0].set(fcw.astype(jnp.float32)).at[1, 0].set(fcb)
    fc_p = fc_p.astype(lr_up.dtype) if lr_up.dtype != jnp.float32 else fc_p

    lrp = jnp.pad(
        lr_up, ((0, 0), (1, hp - h + 1), (1, wp - w + (twd - tw - 1)), (0, cp - c))
    )
    refp = jnp.pad(
        ref,
        ((0, 0), (ph + 1, hp - h + ph + 1), (pw + 1, wp - w + (twd - tw - pw - 1)), (0, cp - c)),
    )

    wspec = pl.BlockSpec(
        (2, 3, 3, cp), lambda a, b, d: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _qkv_head_kernel, kh=kh, kw=kw, th=th, tw=tw, twd=twd, nh=nh,
            nw=nw, c=c, img_h=h, img_w=w, n_classes=n_classes,
        ),
        # int32 class-map blocks must keep a 128-lane minor dim; assemble
        # [n, nh, nw, th, 128] tiles and re-stitch below
        out_shape=jax.ShapeDtypeStruct((n, nh, nw, th, 128), jnp.int32),
        grid=(n, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            wspec,
            wspec,
            wspec,
            pl.BlockSpec(
                (2, cp, ncp), lambda a, b, d: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, th, 128), lambda a, b, d: (a, b, d, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, twd, cp), lr_up.dtype),
            pltpu.VMEM((2, th + kh + 1, twd, cp), lr_up.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lrp, refp, wq_p, wk_p, wv_p, fc_p)
    out = out[..., :tw].transpose(0, 1, 3, 2, 4).reshape(n, hp, wp)
    return out[:, :h, :w]


# --------------------------------------------------------------------------
# BiSeNet inference epilogue: fused module + 1x1 final_conv + x`up` bilinear
# (align_corners=False) upsample + argmax in ONE kernel. The BiSeNetOutput
# head (`model/bisenet.py:546-575`) upsamples 12-class logits x8 before the
# argmax; done through XLA that drags an [N, 8h, 8w, n_cls->128-lane] tensor
# through HBM every frame. Here the whole head runs in VMEM on the fused
# tile: logits go channel-major via one transposed GEMM, both upsample axes
# are row-stochastic constant-matrix matmuls (exactly (1-w)*x0 + w*x1 per
# output), bias is added post-upsample (legal: the matrices are
# row-stochastic, so upsample(x + b) == upsample(x) + b per class), and only
# the int32 class map leaves the kernel. Tile rows carry a +-1 fused-row
# halo (rh=1) so row interpolation at tile edges sees the neighbour's
# boundary logits.


def _qkv_upsample_head_kernel(
    lr_ref, ref_ref, wq_ref, wk_ref, wv_ref, fct_ref, fcb_ref, mh_ref, mw_ref,
    out_ref, lbuf, rbuf, sems,
    *, kh, kw, th, tw, twd, nh, nw, img_h, img_w, up, ncp, wop, n_classes,
):
    f32 = jnp.float32
    fused = _fused_module_body(
        lr_ref, ref_ref, wq_ref, wk_ref, wv_ref, lbuf, rbuf, sems,
        kh=kh, kw=kw, th=th, tw=tw, twd=twd, nh=nh, nw=nw,
        img_h=img_h, img_w=img_w, rh=1,
    )  # [TH+2, TW, CP] f32
    in_dtype = lr_ref.dtype
    prec = jax.lax.Precision.HIGHEST if in_dtype == jnp.float32 else None

    # Per-class epilogue, fully 2-D: Mosaic 0.9's infer-vector-layout
    # rejects every rank-3 form of this head (both the channel-major
    # final-conv dot's result unflatten and the batched upsample dots are
    # lane-crossing reshapes — "tpu.reshape vector<16x3840> ->
    # vector<16x32x120>"). So: the 1x1 final conv runs per class as an
    # elementwise multiply + lane reduction (axis=-1 reductions lower fine
    # — the attention body's softmax max uses one), and the x`up` bilinear
    # upsample as plain 2-D matmuls — column upsample first (at TH+2 rows,
    # before the x`up` row expansion: 2.6x fewer matmul FLOPs than
    # W-after-H), then the per-tile row matrix (image-border clamping baked
    # into its rows). The argmax is an unrolled compare chain over the true
    # n_classes (> keeps the earlier class, matching jnp.argmax's
    # lowest-index tie rule), so padded classes are never touched and need
    # no -inf bias.
    mw = mw_ref[...]
    mh0 = mh_ref[0]
    best = None
    idx = None
    for cls in range(n_classes):
        wc = fct_ref[cls].astype(f32)  # [CP]
        lgc = jnp.sum(fused * wc[None, None, :], axis=-1)  # [TH+2, TW] f32
        lgc = lgc.astype(mw.dtype)
        col = jax.lax.dot_general(
            lgc, mw, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )  # [TH+2, WOP]
        row = jax.lax.dot_general(
            mh0, col.astype(mh0.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )  # [TH*up, WOP]
        # bias post-upsample (exact: both matrices are row-stochastic)
        val = row + fcb_ref[cls, 0].astype(f32)
        if best is None:
            best = val
            idx = jnp.zeros(val.shape, jnp.int32)
        else:
            take = val > best
            best = jnp.where(take, val, best)
            idx = jnp.where(take, jnp.int32(cls), idx)
    out_ref[0] = idx  # [TH*up, WOP]


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def creff_phase2_upsample_argmax(
    lr_up, ref, wq, wk, wv, fc, kh: int, kw: int, up: int = 8, th: int = 30,
    interpret: bool = False,
):
    """argmax(x`up`-bilinear(final_conv(MyAttention(lr_up, ref)))), fused.

    The BiSeNetV1WithFuse inference head (semantics:
    `model/bisenet.py:546-575` BiSeNetOutput with up_factor=8,
    align_corners=False): int32 [N, H*up, W*up] class maps, with neither the
    fused feature nor any logit tensor ever reaching HBM. Requires the
    feature width to fit one lane tile (w <= 128: full-width rows are needed
    by the in-kernel column-upsample matmul); callers fall back to the
    composed head otherwise.
    """
    n, h, w, c = lr_up.shape
    n_classes = fc["weight"].shape[-1]
    if w > 128:
        raise ValueError("fused upsample head needs full-width tiles (w<=128)")
    tw = w
    th = _pick_th(h, th) if h % th else th
    while h % th:
        th //= 2
    hp = h
    nh = hp // th
    nw = 1
    ph, pw = kh // 2, kw // 2
    cp = _cdiv(c, 128) * 128
    ncp = _cdiv(n_classes, 8) * 8
    twd = _cdiv(tw + kw + 1, 8) * 8
    wop = _cdiv(w * up, 128) * 128

    def pack2(wd, dtype):
        wgt = jnp.pad(wd["weight"][:, :, 0, :], ((0, 0), (0, 0), (0, cp - c))).astype(dtype)
        bias = jnp.pad(wd["bias"], (0, cp - c)).astype(dtype)
        out = jnp.zeros((2, 3, 3, cp), dtype)
        out = out.at[0].set(wgt)
        return out.at[1, 0, 0].set(bias)

    wq_p = pack2(wq, lr_up.dtype)
    wk_p = pack2(wk, lr_up.dtype)
    wv_p = pack2(wv, lr_up.dtype)
    # transposed final-conv weight [NCP, CP]; bias replicated across lanes
    # [NCP, WOP] with -inf rows for padded classes
    fct = jnp.pad(
        fc["weight"][0, 0].T, ((0, ncp - n_classes), (0, cp - c))
    ).astype(lr_up.dtype)
    fcb = jnp.broadcast_to(
        jnp.pad(
            fc["bias"].astype(jnp.float32), (0, ncp - n_classes),
            constant_values=-jnp.inf,
        )[:, None],
        (ncp, wop),
    )

    # per-tile row-upsample matrices [nh, th*up, th+2]: rows of the global
    # [h*up, h] align_corners=False matrix sliced to each tile's halo window
    from arseg_tpu.ops.resize import _linear_matrix

    gmh = _linear_matrix(h, h * up, False)  # numpy [h*up, h]
    mh_tiles = np.zeros((nh, th * up, th + 2), np.float32)
    for i in range(nh):
        rows = gmh[i * th * up : (i + 1) * th * up]  # [th*up, h]
        lo = i * th - 1
        for dj in range(th + 2):
            src = min(max(lo + dj, 0), h - 1)
            if lo + dj == src:
                mh_tiles[i, :, dj] += rows[:, src]
        # border clamp: contributions of rows outside [0, h) fold onto the
        # clamped row inside the halo window
        for srcj in range(h):
            if srcj < lo or srcj >= lo + th + 2:
                if np.any(rows[:, srcj]):
                    dj = min(max(srcj, lo), lo + th + 1) - lo
                    mh_tiles[i, :, dj] += rows[:, srcj]
    mh = jnp.asarray(mh_tiles)
    # [w, wop]: transposed column-upsample matrix, zero-padded columns so the
    # kernel's minor dim stays 128-aligned (padded outputs sliced off below)
    mw = jnp.asarray(
        np.pad(_linear_matrix(w, w * up, False).T, ((0, 0), (0, wop - w * up)))
    )
    if lr_up.dtype != jnp.float32:
        mh = mh.astype(lr_up.dtype)
        mw = mw.astype(lr_up.dtype)

    # rh=1: one extra fused row per side beyond the dwconv halo
    lrp = jnp.pad(lr_up, ((0, 0), (2, 2), (1, (twd - tw - 1)), (0, cp - c)))
    refp = jnp.pad(
        ref, ((0, 0), (ph + 2, ph + 2), (pw + 1, (twd - tw - pw - 1)), (0, cp - c))
    )

    wspec = pl.BlockSpec(
        (2, 3, 3, cp), lambda a, b, d: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _qkv_upsample_head_kernel, kh=kh, kw=kw, th=th, tw=tw, twd=twd,
            nh=nh, nw=nw, img_h=h, img_w=w, up=up, ncp=ncp, wop=wop,
            n_classes=n_classes,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp * up, wop), jnp.int32),
        grid=(n, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            wspec,
            wspec,
            wspec,
            pl.BlockSpec((ncp, cp), lambda a, b, d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ncp, wop), lambda a, b, d: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, th * up, th + 2), lambda a, b, d: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((tw, wop), lambda a, b, d: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th * up, wop), lambda a, b, d: (a, b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, twd, cp), lr_up.dtype),
            pltpu.VMEM((2, th + kh + 3, twd, cp), lr_up.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lrp, refp, wq_p, wk_p, wv_p, fct, fcb, mh, mw)
    return out[:, :, : w * up]
