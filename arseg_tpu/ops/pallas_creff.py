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
band is kept in matrix form: out-of-band entries are masked to -inf, the
softmax runs jointly across the kh banded matrices, and the weighting pass
  out[y] += P_dy . V_row(y+dy)        <- MXU
sums over the band automatically. Out-of-image window positions read
zero-padded k/v, giving logit 0 and value 0 — bit-matching the reference's
unfold CPU oracle (`model/attention.py:55-85`).

The band waste factor is (TW+kw-1)/kw per matmul, so a *small* TW keeps
total FLOPs ~(TW+6)/7 * 4*H*W*C ~ 166 GF at 720x960x64. Measured lineage at
720x960x64 on one v5e chip: per-offset VPU form 26-35 ms (no contraction to
give the MXU); per-row banded dots 15.3/11.2 ms f32/bf16; this wide-concat
form 15.0/10.2 ms. Remaining gap to the ~3 ms roofline is kernel-internal
(the chip sustains 55 TF/s on large dots but ~3 TF/s on these shapes).

k/v arrive as overlapping halo tiles pre-expanded by XLA (~2x one-time HBM
traffic); layout stays NHWC end-to-end — matmul contractions are over C, so
no NCHW transposes are needed anywhere.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _kernel(q_ref, kt_ref, vt_ref, out_ref, *, kh, kw, th, tw):
    f32 = jnp.float32
    # matmul operands stay in the input dtype (bf16 inputs -> 4x MXU rate);
    # logits/softmax/accumulation are always f32 (preferred_element_type)
    q = q_ref[0]  # [TH, TW, C]
    kt = kt_ref[0, 0, 0]  # [TH+kh-1, TW+kw-1, C]
    vt = vt_ref[0, 0, 0]
    twh = tw + kw - 1
    neg_inf = jnp.float32(-jnp.inf)

    # ONE wide batched matmul per pass: the kh dy-blocks are concatenated
    # along N (QK) / the contraction dim (PV), each padded to a 128-lane
    # boundary. Small separate dots measured 2.9 TF/s vs the chip's 55 —
    # the MXU's per-instruction pipeline overhead dominates tiny matmuls,
    # so amortize it: 2 dot instructions per tile instead of 2*kh*th.
    twp = _cdiv(twh, 128) * 128  # per-dy padded block width
    c = q.shape[-1]

    # K_cat [TH, kh*TWP, C]: dy-th row-window slices of the halo, padded
    kcat = jnp.concatenate(
        [
            jnp.pad(kt[dy : dy + th], ((0, 0), (0, twp - twh), (0, 0)))
            for dy in range(kh)
        ],
        axis=1,
    )
    vcat = jnp.concatenate(
        [
            jnp.pad(vt[dy : dy + th], ((0, 0), (0, twp - twh), (0, 0)))
            for dy in range(kh)
        ],
        axis=1,
    )

    dn_qk = (((2,), (2,)), ((0,), (0,)))  # [TH,TW,C].[TH,kh*TWP,C] -> [TH,TW,kh*TWP]
    dn_pv = (((2,), (1,)), ((0,), (0,)))  # [TH,TW,kh*TWP].[TH,kh*TWP,C] -> [TH,TW,C]

    logits = jax.lax.dot_general(q, kcat, dn_qk, preferred_element_type=f32)

    # in-window iff j_local - x in [0, kw) and j_local < twh, per dy block
    jj = jax.lax.broadcasted_iota(jnp.int32, (tw, kh * twp), 1) % twp
    xx = jax.lax.broadcasted_iota(jnp.int32, (tw, kh * twp), 0)
    band = (jj >= xx) & (jj < xx + kw) & (jj < twh)

    sall = jnp.where(band[None], logits, neg_inf)  # [TH, TW, kh*TWP]
    m = jnp.max(sall, axis=2)
    e = jnp.exp(sall - m[..., None])
    p = (e / jnp.sum(e, axis=2)[..., None]).astype(vt.dtype)
    acc = jax.lax.dot_general(p, vcat, dn_pv, preferred_element_type=f32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _halo_tiles(x, th, tw, kh, kw, nh, nw):
    """x: zero-padded [N, hp+kh-1, wp+kw-1, C] ->
    [N, nh, nw, th+kh-1, tw+kw-1, C] overlapping tiles (static slices)."""
    rows = jnp.stack(
        [x[:, i * th : i * th + th + kh - 1] for i in range(nh)], axis=1
    )
    return jnp.stack(
        [rows[:, :, :, j * tw : j * tw + tw + kw - 1] for j in range(nw)], axis=2
    )


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def creff_fused_pallas(
    q, k, v, kh: int, kw: int, th: int = 16, tw: int = 120, interpret: bool = False
):
    """softmax(local_similar(q, k)) weighted sum of v, fused. NHWC in/out.

    Default tw=120 (divisible by 8, as TPU block specs require) makes the
    banded matmul width tw+kw-1 = 126, padded to one 128-lane MXU pass — the
    MXU pads N to 128 multiples, so tw=128 (width 134 -> 256) would halve MXU utilization.
    """
    n, h, w, c = q.shape
    tw = min(tw, _cdiv(w, 128) * 128)
    hp = _cdiv(h, th) * th
    wp = _cdiv(w, tw) * tw
    nh, nw = hp // th, wp // tw
    ph, pw = kh // 2, kw // 2

    qp = jnp.pad(q, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (ph, hp - h + ph), (pw, wp - w + pw), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (ph, hp - h + ph), (pw, wp - w + pw), (0, 0)))
    kt = _halo_tiles(kp, th, tw, kh, kw, nh, nw)
    vt = _halo_tiles(vp, th, tw, kh, kw, nh, nw)

    halo_block = (1, 1, 1, th + kh - 1, tw + kw - 1, c)
    out = pl.pallas_call(
        functools.partial(_kernel, kh=kh, kw=kw, th=th, tw=tw),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, c), q.dtype),
        grid=(n, nh, nw),
        in_specs=[
            pl.BlockSpec(
                (1, th, tw, c), lambda a, b, d: (a, b, d, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                halo_block, lambda a, b, d: (a, b, d, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                halo_block, lambda a, b, d: (a, b, d, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, c), lambda a, b, d: (a, b, d, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * hp * wp * c * kh * (tw + kw - 1),
            bytes_accessed=4 * n * hp * wp * c * 4,
            transcendentals=n * hp * wp * kh * (tw + kw - 1),
        ),
        interpret=interpret,
    )(qp, kt, vt)
    return out[:, :h, :w, :]
