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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


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
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
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
