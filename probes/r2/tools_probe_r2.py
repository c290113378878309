"""Round-2 TPU probes (run alone — single-client TPU).

Answers, with measurements, the design questions for the round-2 kernels:
  P1  XLA gather descriptor-rate curve vs slice size (is the 2.1us/descriptor
      [6,6,C] cliff about slice size or descriptor count?)
  P2  Pallas dynamic-offset DMA issue rate (per-block window delivery for the
      blocked warp: 21.6K windows/frame — what does that cost?)
  P3  CReFF fused-kernel cost decomposition (ablations: no-exp / no-qk / no-pv)
  P4  LR phase1 + phase2 batching across the GOP (does batch=11 amortize the
      small-spatial layers?)
  P5  flow resize at identity shapes + feature upsample (current glue costs)
"""
import sys, time, functools

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arseg_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

H, W, C = 720, 960, 64
BF = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=10, rounds=3):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    try:
        _sync(f(*args))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    ms = sorted(ts)[len(ts) // 2] * 1000
    print(f"{name}: {ms:.2f} ms  (compile {compile_s:.1f}s)", flush=True)
    return ms


rng = np.random.RandomState(0)
feat = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32)).astype(BF)
fp = jnp.pad(feat, ((0, 0), (1, 5), (1, 5), (0, 0)))  # padded source for gathers

# ---------------------------------------------------------------- P1: gather rate
print("=== P1: XLA gather rate vs slice size ===", flush=True)


def gather_rate(slice_hw, n_desc):
    sh, sw = slice_hw
    ys = jnp.asarray(rng.randint(0, H - sh, (1, n_desc)).astype(np.int32))
    xs = jnp.asarray(rng.randint(0, W - sw, (1, n_desc)).astype(np.int32))
    idx = jnp.stack([ys, xs], axis=-1)

    def run(fp, idx):
        def g1(fp1, idx1):
            dn = lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
            )
            return lax.gather(
                fp1, idx1, dn, slice_sizes=(sh, sw, C), mode=lax.GatherScatterMode.CLIP
            )

        out = jax.vmap(g1)(fp, idx)
        return jnp.sum(out.astype(jnp.float32))

    ms = bench(f"gather [{sh},{sw},{C}] x {n_desc}", run, fp, idx)
    if ms:
        print(f"   -> {ms * 1e6 / n_desc:.0f} ns/descriptor", flush=True)


gather_rate((2, 2), 691200)   # round-1 exact warp
gather_rate((4, 4), 172800)   # 2x2 blocks
gather_rate((6, 6), 43200)    # 4x4 blocks (round-1 blocked, measured 2.1us)
gather_rate((6, 8), 43200)
gather_rate((8, 16), 21600)   # 4x8 blocks, aligned-slack window
gather_rate((2, 2), 43200)    # descriptor-count control at the fast slice size

# ---------------------------------------------------------------- P2: Pallas DMA rate
print("=== P2: Pallas dynamic-DMA window rate ===", flush=True)


def dma_probe(th, nb, wr, wc, n_sem=8):
    """Per tile: nb dynamic [wr, wc, C] window DMAs from HBM. Grid = H//th."""
    nt = H // th
    srcp = jnp.pad(feat[0], ((0, wr), (0, wc + 8), (0, 0)))  # [H+wr, W+wc+8, C]
    by = jnp.asarray(rng.randint(0, H, (nt, nb)).astype(np.int32))
    bx = jnp.asarray((rng.randint(0, W // 8, (nt, nb)) * 8).astype(np.int32))

    def kernel(by_ref, bx_ref, src_ref, out_ref, wbuf, sems):
        def dma(b, slot):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(by_ref[0, b], wr), pl.ds(bx_ref[0, b], wc), :],
                wbuf.at[slot],
                sems.at[slot],
            )

        def body(b, _):
            @pl.when(b >= n_sem)
            def _w():
                dma(b - n_sem, lax.rem(b - n_sem, n_sem)).wait()

            dma(b, lax.rem(b, n_sem)).start()
            return 0

        lax.fori_loop(0, nb, body, 0)

        def tail(s, _):
            b = nb - n_sem + s

            @pl.when(b >= 0)
            def _w():
                dma(b, lax.rem(b, n_sem)).wait()

            return 0

        lax.fori_loop(0, n_sem, tail, 0)
        out_ref[0] = jnp.sum(wbuf[n_sem - 1].astype(jnp.float32), axis=(0,))

    def run(by, bx, srcp):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nt, wc, C), jnp.float32),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, nb), lambda t: (t, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nb), lambda t: (t, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, wc, C), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((n_sem, wr, wc, C), feat.dtype),
                pltpu.SemaphoreType.DMA((n_sem,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024, has_side_effects=True
            ),
        )(by, bx, srcp)

    ms = bench(f"pallas dma [{wr},{wc},{C}] x {nt}t*{nb}", run, by, bx, srcp)
    if ms:
        print(f"   -> {ms * 1e6 / (nt * nb):.0f} ns/window", flush=True)


dma_probe(8, 240, 8, 16)    # 4x8 blocks, 2 block-rows/tile
dma_probe(4, 120, 8, 16)    # 1 block-row/tile
dma_probe(8, 240, 6, 8)     # smaller windows (4x4-block shape, 8-col aligned)
dma_probe(8, 240, 8, 16, n_sem=16)

# ---------------------------------------------------------------- P3: creff ablations
print("=== P3: CReFF fused kernel ablations ===", flush=True)


def _cdiv(a, b):
    return -(-a // b)


def creff_ablate(q, k, v, kh, kw, th, tw, ablate):
    n, h, w, c = q.shape
    hp = _cdiv(h, th) * th
    wp = _cdiv(w, tw) * tw
    nh, nw = hp // th, wp // tw
    ph, pw = kh // 2, kw // 2
    cp = _cdiv(c, 128) * 128
    twd = _cdiv(tw + kw - 1, 8) * 8

    qp = jnp.pad(q, ((0, 0), (0, hp - h), (0, wp - w), (0, cp - c)))
    wpad = wp - w + pw + (twd - (tw + kw - 1))
    kp = jnp.pad(k, ((0, 0), (ph, hp - h + ph), (pw, wpad), (0, cp - c)))
    vp = jnp.pad(v, ((0, 0), (ph, hp - h + ph), (pw, wpad), (0, cp - c)))

    def kernel(q_ref, kp_ref, vp_ref, out_ref, kbuf, vbuf, sems):
        f32 = jnp.float32
        a = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        step = (a * nh + i) * nw + j
        total = pl.num_programs(0) * nh * nw
        slot = lax.rem(step, 2)

        def dma(dst_slot, a2, i2, j2, which):
            src = kp_ref if which == 0 else vp_ref
            buf = kbuf if which == 0 else vbuf
            return pltpu.make_async_copy(
                src.at[a2, pl.ds(i2 * th, th + kh - 1), pl.ds(j2 * tw, twd), :],
                buf.at[dst_slot],
                sems.at[dst_slot, which],
            )

        @pl.when(step == 0)
        def _():
            dma(slot, a, i, j, 0).start()
            dma(slot, a, i, j, 1).start()

        @pl.when(step + 1 < total)
        def _():
            nxt = step + 1
            j2 = lax.rem(nxt, nw)
            i2 = lax.rem(nxt // nw, nh)
            a2 = nxt // (nh * nw)
            nslot = lax.rem(nxt, 2)
            dma(nslot, a2, i2, j2, 0).start()
            dma(nslot, a2, i2, j2, 1).start()

        dma(slot, a, i, j, 0).wait()
        dma(slot, a, i, j, 1).wait()

        qq = q_ref[0]
        kt = kbuf[slot]
        vt = vbuf[slot]
        twh = tw + kw - 1
        twp = twd
        kcat = jnp.concatenate([kt[dy : dy + th] for dy in range(kh)], axis=1)
        vcat = jnp.concatenate([vt[dy : dy + th] for dy in range(kh)], axis=1)
        dn_qk = (((2,), (2,)), ((0,), (0,)))
        dn_pv = (((2,), (1,)), ((0,), (0,)))

        jj = lax.broadcasted_iota(jnp.int32, (tw, kh * twp), 1) % twp
        xx = lax.broadcasted_iota(jnp.int32, (tw, kh * twp), 0)
        band = (jj >= xx) & (jj < xx + kw) & (jj < twh)

        if ablate == "noqk":
            logits = jnp.broadcast_to(
                jnp.sum(qq[:, :1, :1], axis=-1, keepdims=True) * 0.001,
                (th, tw, kh * twp),
            ).astype(f32)
        else:
            logits = lax.dot_general(qq, kcat, dn_qk, preferred_element_type=f32)

        if ablate == "noexp":
            p = jnp.where(band[None], logits, 0.0).astype(vt.dtype)
        else:
            sall = jnp.where(band[None], logits, jnp.float32(-jnp.inf))
            m = jnp.max(sall, axis=2)
            e = jnp.exp(sall - m[..., None])
            p = (e / jnp.sum(e, axis=2)[..., None]).astype(vt.dtype)

        if ablate == "nopv":
            acc = p[:, :, : out_ref.shape[-1]].astype(f32) + vcat[
                :, : tw, : out_ref.shape[-1]
            ].astype(f32)
        else:
            acc = lax.dot_general(p, vcat, dn_pv, preferred_element_type=f32)
        out_ref[0] = acc[..., : out_ref.shape[-1]].astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(qp, kp, vp)[:, :h, :w, :]


qa = feat
ka = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32)).astype(BF)
va = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32)).astype(BF)
for ab in ["full", "noexp", "noqk", "nopv"]:
    bench(
        f"creff ablate={ab} th=16 tw=120",
        functools.partial(creff_ablate, kh=7, kw=7, th=16, tw=120, ablate=ab),
        qa, ka, va,
    )
for th, tw in [(8, 120), (32, 120), (16, 240)]:
    bench(
        f"creff full th={th} tw={tw}",
        functools.partial(creff_ablate, kh=7, kw=7, th=th, tw=tw, ablate="full"),
        qa, ka, va,
    )

# ---------------------------------------------------------------- P4: batching
print("=== P4: GOP batching ===", flush=True)
from arseg_tpu.models import build_model
from arseg_tpu.ops import resize_bilinear
from arseg_tpu.ops.pallas_creff import creff_qkv_fused, creff_phase2_argmax

lr = build_model("camvid-psp18", fuse=True)
hr = build_model("camvid-psp18", fuse=False)
lp = lr.init(jax.random.PRNGKey(1))
hp = hr.init(jax.random.PRNGKey(0))
lp16 = jax.tree_util.tree_map(
    lambda x: x.astype(BF) if x.dtype == jnp.float32 else x, lp
)
hp16 = jax.tree_util.tree_map(
    lambda x: x.astype(BF) if x.dtype == jnp.float32 else x, hp
)

for bs in [1, 4, 11]:
    x = jnp.asarray(rng.randn(bs, 360, 480, 3).astype(np.float32)).astype(BF)
    ms = bench(
        f"lr phase1 bf16 batch={bs}",
        lambda p, x: lr.forward_phase1(p, x)[-1] if isinstance(lr.forward_phase1(p, x), tuple) else lr.forward_phase1(p, x),
        lp16, x,
    )
    if ms:
        print(f"   -> {ms / bs:.2f} ms/frame", flush=True)

x1 = jnp.asarray(rng.randn(1, 720, 960, 3).astype(np.float32)).astype(BF)
ms = bench("hr forward bf16 batch=1", lambda p, x: hr.apply(p, x)[0], hp16, x1)
x4 = jnp.asarray(rng.randn(4, 720, 960, 3).astype(np.float32)).astype(BF)
ms = bench("hr forward bf16 batch=4", lambda p, x: hr.apply(p, x)[0], hp16, x4)
if ms:
    print(f"   -> {ms / 4:.2f} ms/frame", flush=True)

# fused phase-2 argmax kernel: batch 1 vs 4 (grid n)
wq = {"weight": jnp.asarray(rng.randn(3, 3, 1, C).astype(np.float32)).astype(BF),
      "bias": jnp.asarray(rng.randn(C).astype(np.float32)).astype(BF)}
wk = {"weight": jnp.asarray(rng.randn(3, 3, 1, C).astype(np.float32)).astype(BF),
      "bias": jnp.asarray(rng.randn(C).astype(np.float32)).astype(BF)}
wv = {"weight": jnp.asarray(rng.randn(3, 3, 1, C).astype(np.float32)).astype(BF),
      "bias": jnp.asarray(rng.randn(C).astype(np.float32)).astype(BF)}
fc = {"weight": jnp.asarray(rng.randn(1, 1, C, 12).astype(np.float32)).astype(BF),
      "bias": jnp.asarray(rng.randn(12).astype(np.float32)).astype(BF)}
for bs in [1, 4]:
    lu = jnp.asarray(rng.randn(bs, H, W, C).astype(np.float32)).astype(BF)
    rf = jnp.asarray(rng.randn(bs, H, W, C).astype(np.float32)).astype(BF)
    ms = bench(
        f"phase2_argmax kernel batch={bs}",
        lambda a, b: creff_phase2_argmax(a, b, wq, wk, wv, fc, 7, 7),
        lu, rf,
    )
    if ms:
        print(f"   -> {ms / bs:.2f} ms/frame", flush=True)

# ---------------------------------------------------------------- P5: glue
print("=== P5: glue ===", flush=True)
from arseg_tpu.ops.warp import warp_feature, _resize_plane_bilinear

fx = jnp.asarray(rng.uniform(-16, 16, (1, H, W)).astype(np.float32))
fy = jnp.asarray(rng.uniform(-16, 16, (1, H, W)).astype(np.float32))
bench("warp exact bf16 (round-1 prod)", lambda f, a, b: warp_feature(f, (a, b)), feat, fx, fy)
flr = jnp.asarray(rng.randn(1, 360, 480, C).astype(np.float32)).astype(BF)
bench("feature upsample x2 bf16", lambda x: resize_bilinear(x, (H, W), align_corners=True), flr)
bench("flow identity-resize scale", lambda a, b: (_resize_plane_bilinear(a * 1.0, (H, W), True),
                                                  _resize_plane_bilinear(b * 1.0, (H, W), True)), fx, fy)
print("DONE", flush=True)
