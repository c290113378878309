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
total FLOPs ~(TW+6)/7 * 4*H*W*C ~ 166 GF at 720x960x64 — about 3 ms of MXU
time, vs ~26 ms measured for the best per-offset VPU variant of this kernel
(windowed dot products share no contraction, so the VPU form can't use the
MXU at all; v1 of this kernel was 25x off roofline in NHWC 16x16 tiles).

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
    q = q_ref[0].astype(f32)  # [TH, TW, C]
    kt = kt_ref[0, 0, 0].astype(f32)  # [TH+kh-1, TW+kw-1, C]
    vt = vt_ref[0, 0, 0].astype(f32)
    twh = tw + kw - 1

    # static band mask: position (x, j) is in-window iff j - x in [0, kw)
    jj = jax.lax.broadcasted_iota(jnp.int32, (tw, twh), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (tw, twh), 0)
    band = (jj >= xx) & (jj < xx + kw)
    neg_inf = jnp.float32(-jnp.inf)

    dn_qk = (((1,), (1,)), ((), ()))  # contract C with C -> [TW, TWH]
    dn_pv = (((1,), (0,)), ((), ()))  # [TW, TWH] . [TWH, C] -> [TW, C]

    for r in range(th):
        qr = q[r]  # [TW, C]
        s = []
        for dy in range(kh):
            logits = jax.lax.dot_general(
                qr, kt[r + dy], dn_qk, preferred_element_type=f32
            )
            s.append(jnp.where(band, logits, neg_inf))
        sall = jnp.stack(s)  # [kh, TW, TWH]
        m = jnp.max(sall, axis=(0, 2))  # [TW]
        e = jnp.exp(sall - m[None, :, None])
        denom = jnp.sum(e, axis=(0, 2))  # [TW]
        p = e / denom[None, :, None]
        acc = jnp.zeros((tw, q.shape[-1]), dtype=f32)
        for dy in range(kh):
            acc = acc + jax.lax.dot_general(
                p[dy], vt[r + dy], dn_pv, preferred_element_type=f32
            )
        out_ref[0, r] = acc.astype(out_ref.dtype)


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
    q, k, v, kh: int, kw: int, th: int = 8, tw: int = 128, interpret: bool = False
):
    """softmax(local_similar(q, k)) weighted sum of v, fused. NHWC in/out."""
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
