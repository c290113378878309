"""Fused CReFF local-attention Pallas TPU kernel.

Replaces the reference's three-pass CUDA pipeline (`similar_forward` ->
softmax -> `weighting_forward`, /root/reference `model/attention.py:13-53`)
with a single fused kernel: for each (kh x kw) spatial window it computes the
neighborhood q.k logits, the softmax over the window, and the weighted sum of
v — without materializing the [N, H, W, kh*kw] weight tensor in HBM.

Memory plan (grid = N x H-tiles x W-tiles): q arrives as [TH, TW, C] blocks
via BlockSpec; k and v are pre-expanded on device into overlapping halo tiles
[N, nH, nW, TH+kh-1, TW+kw-1, C] (overlapping halo blocks are not expressible
as BlockSpecs, and tile expansion costs only ~(TH+6)(TW+6)/(TH*TW) ~= 1.9x
one-time HBM traffic — far less than the 3-pass weight materialization).
Compute is VPU-bound: per-pixel windowed dot products share no contraction
across pixels, so there is nothing for the MXU here — the same reason the
reference needed a custom CUDA op instead of a matmul.

Zero padding of k yields out-of-window logits of exactly 0 (not -inf) and
zero padding of v zeroes their value contribution — bit-matching nn.Unfold
semantics of the reference CPU oracle (`model/attention.py:55-85`).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _kernel(q_ref, kt_ref, vt_ref, out_ref, sims_scr, *, kh, kw, th, tw, c):
    q = q_ref[0].astype(jnp.float32)  # [TH, TW, C]
    kt = kt_ref[0, 0, 0]  # [TH+kh-1, TW+kw-1, C]
    offsets = [(a, b) for a in range(kh) for b in range(kw)]

    for o, (dy, dx) in enumerate(offsets):
        kwin = kt[dy : dy + th, dx : dx + tw, :].astype(jnp.float32)
        sims_scr[o] = jnp.sum(q * kwin, axis=-1)

    sims = sims_scr[:]  # [kh*kw, TH, TW]
    m = jnp.max(sims, axis=0)
    e = jnp.exp(sims - m[None])
    p = e / jnp.sum(e, axis=0)[None]

    vt = vt_ref[0, 0, 0]
    acc = jnp.zeros((th, tw, c), dtype=jnp.float32)
    for o, (dy, dx) in enumerate(offsets):
        vwin = vt[dy : dy + th, dx : dx + tw, :].astype(jnp.float32)
        acc = acc + p[o][..., None] * vwin
    out_ref[0] = acc.astype(out_ref.dtype)


def _halo_tiles(x, th, tw, kh, kw, nh, nw):
    """x: zero-padded [N, hp+kh-1, wp+kw-1, C] ->
    [N, nh, nw, th+kh-1, tw+kw-1, C] overlapping tiles (static slices)."""
    rows = jnp.stack([x[:, i * th : i * th + th + kh - 1] for i in range(nh)], axis=1)
    return jnp.stack(
        [rows[:, :, :, j * tw : j * tw + tw + kw - 1] for j in range(nw)], axis=2
    )


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def creff_fused_pallas(q, k, v, kh: int, kw: int, interpret: bool = False):
    """softmax(local_similar(q,k)) weighted sum of v, fused. NHWC in/out."""
    n, h, w, c = q.shape
    th, tw = 16, 16
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
        functools.partial(_kernel, kh=kh, kw=kw, th=th, tw=tw, c=c),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, c), q.dtype),
        grid=(n, nh, nw),
        in_specs=[
            pl.BlockSpec(
                (1, th, tw, c), lambda a, b, d: (a, b, d, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                halo_block,
                lambda a, b, d: (a, b, d, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                halo_block,
                lambda a, b, d: (a, b, d, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, c), lambda a, b, d: (a, b, d, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((kh * kw, th, tw), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * hp * wp * c * kh * kw,
            bytes_accessed=4 * n * hp * wp * c * 4,
            transcendentals=n * hp * wp * kh * kw,
        ),
        interpret=interpret,
    )(qp, kt, vt)
    return out[:, :h, :w, :]
