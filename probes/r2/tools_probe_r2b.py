"""Round-2 TPU probes, part B.

  B1  raw Pallas DMA bandwidth (HBM->VMEM, big contiguous tiles) — the real
      denominator for "is the creff kernel DMA-bound?"
  B2  dynamic-offset per-block window DMA rate via PrefetchScalarGridSpec
      (the blocked-warp delivery mechanism)
  B3  creff kernel fine ablations: dmaonly / concat-only / noqk retry /
      tw=128 (tile-aligned DMA starts)
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

# ---------------------------------------------------------------- B1: raw DMA BW
print("=== B1: raw DMA bandwidth ===", flush=True)


def copy_probe(rows, cols, cp, reps):
    """Grid over row-tiles; each step DMAs a [rows, cols, cp] slab HBM->VMEM
    and writes a reduction (so slab stays live)."""
    src = jnp.asarray(rng.randn(reps, rows, cols, cp).astype(np.float32)).astype(BF)

    def kernel(src_ref, out_ref, buf, sem):
        t = pl.program_id(0)
        cp_ = pltpu.make_async_copy(src_ref.at[t], buf, sem)
        cp_.start()
        cp_.wait()
        out_ref[0] = buf[0, :, :]

    def run(src):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((reps, cols, cp), BF),
            grid=(reps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, cols, cp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rows, cols, cp), BF),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(src)

    nbytes = reps * rows * cols * cp * 2
    ms = bench(f"dma copy [{rows},{cols},{cp}] x{reps}", run, src)
    if ms:
        print(f"   -> {nbytes / ms / 1e6:.0f} GB/s", flush=True)


copy_probe(16, 960, 128, 45)     # aligned big slabs, ~177 MB total
copy_probe(22, 128, 128, 360)    # the creff halo window shape, aligned starts

# creff-shaped: misaligned W starts (offset 120 pattern) via a padded source
def creff_dma_probe(th, tw, unaligned=True):
    kh = 7
    twd = -(-(tw + kh - 1) // 8) * 8
    hp, wp = 720, -(-960 // tw) * tw
    nh, nw = hp // th, wp // tw
    kp = jnp.asarray(
        rng.randn(1, hp + kh - 1, wp + twd, 128).astype(np.float32)
    ).astype(BF)

    def kernel(kp_ref, out_ref, buf, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        step = i * nw + j
        slot = lax.rem(step, 2)

        def dma(dst_slot, i2, j2):
            return pltpu.make_async_copy(
                kp_ref.at[0, pl.ds(i2 * th, th + kh - 1), pl.ds(j2 * tw, twd), :],
                buf.at[dst_slot],
                sems.at[dst_slot],
            )

        @pl.when(step == 0)
        def _():
            dma(slot, i, j).start()

        @pl.when(step + 1 < nh * nw)
        def _():
            nxt = step + 1
            dma(lax.rem(nxt, 2), nxt // nw, lax.rem(nxt, nw)).start()

        dma(slot, i, j).wait()
        out_ref[0] = buf[slot, :th, :tw, :]

    def run(kp):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nh * nw, th, tw, 128), BF),
            grid=(nh, nw),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, th, tw, 128), lambda i, j: (i * nw + j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, th + kh - 1, twd, 128), BF),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(kp)

    nbytes = nh * nw * (th + kh - 1) * twd * 128 * 2
    ms = bench(f"creff-halo dma th={th} tw={tw}", run, kp)
    if ms:
        print(f"   -> {nbytes / ms / 1e6:.0f} GB/s halo stream", flush=True)


creff_dma_probe(16, 120)   # production shape: W starts at 120k (misaligned)
creff_dma_probe(16, 128)   # aligned variant

# ---------------------------------------------------------------- B2: window DMA
print("=== B2: dynamic window DMA rate (scalar prefetch) ===", flush=True)


def dma_win_probe(th, nb, wr, wc):
    nt = H // th
    srcp = jnp.pad(
        jnp.asarray(rng.randn(H, W, C).astype(np.float32)).astype(BF),
        ((0, wr), (0, wc + 8), (0, 0)),
    )
    by = jnp.asarray(rng.randint(0, H, (nt * nb,)).astype(np.int32))
    bx = jnp.asarray((rng.randint(0, W // 8, (nt * nb,)) * 8).astype(np.int32))
    n_sem = 8

    def kernel(by_ref, bx_ref, src_ref, out_ref, wbuf, sems):
        t = pl.program_id(0)

        def dma(b, slot):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(by_ref[t * nb + b], wr), pl.ds(bx_ref[t * nb + b], wc), :],
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
        out_ref[0] = wbuf[n_sem - 1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, wr, wc, C), lambda t, by, bx: (t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((n_sem, wr, wc, C), BF),
            pltpu.SemaphoreType.DMA((n_sem,)),
        ],
    )

    def run(by, bx, srcp):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nt, wr, wc, C), BF),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024, has_side_effects=True
            ),
        )(by, bx, srcp)

    ms = bench(f"win dma [{wr},{wc},{C}] x {nt}t*{nb}", run, by, bx, srcp)
    if ms:
        print(f"   -> {ms * 1e6 / (nt * nb):.0f} ns/window", flush=True)


dma_win_probe(8, 240, 8, 16)   # 4x8 blocks
dma_win_probe(8, 240, 8, 8)    # narrower window
dma_win_probe(4, 120, 8, 16)
dma_win_probe(8, 240, 4, 16)

# ---------------------------------------------------------------- B3: creff fine
print("=== B3: creff fine ablations ===", flush=True)


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
        if ablate == "dmaonly":
            out_ref[0] = (kt[:th, :tw, :c] + vt[:th, :tw, :c]).astype(out_ref.dtype)
            return

        twh = tw + kw - 1
        twp = twd
        kcat = jnp.concatenate([kt[dy : dy + th] for dy in range(kh)], axis=1)
        vcat = jnp.concatenate([vt[dy : dy + th] for dy in range(kh)], axis=1)
        if ablate == "concatonly":
            out_ref[0] = (
                kcat[:, :tw, :c] + vcat[:, :tw, :c] + qq[:, :, :c]
            ).astype(out_ref.dtype)
            return

        dn_qk = (((2,), (2,)), ((0,), (0,)))
        dn_pv = (((2,), (1,)), ((0,), (0,)))
        jj = lax.broadcasted_iota(jnp.int32, (tw, kh * twp), 1) % twp
        xx = lax.broadcasted_iota(jnp.int32, (tw, kh * twp), 0)
        band = (jj >= xx) & (jj < xx + kw) & (jj < twh)

        if ablate == "noqk":
            logits = (
                jnp.zeros((th, tw, kh * twp), f32)
                + jnp.sum(qq[:, :1, :1]).astype(f32) * 0.001
            )
        else:
            logits = lax.dot_general(qq, kcat, dn_qk, preferred_element_type=f32)

        sall = jnp.where(band[None], logits, jnp.float32(-jnp.inf))
        m = jnp.max(sall, axis=2)
        e = jnp.exp(sall - m[..., None])
        p = (e / jnp.sum(e, axis=2)[..., None]).astype(vt.dtype)
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(qp, kp, vp)[:, :h, :w, :]


qa = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32)).astype(BF)
ka = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32)).astype(BF)
va = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32)).astype(BF)
for ab in ["dmaonly", "concatonly", "noqk", "full"]:
    bench(
        f"creff ablate={ab} th=16 tw=120",
        functools.partial(creff_ablate, kh=7, kw=7, th=16, tw=120, ablate=ab),
        qa, ka, va,
    )
bench(
    "creff full th=16 tw=128 (aligned)",
    functools.partial(creff_ablate, kh=7, kw=7, th=16, tw=128, ablate="full"),
    qa, ka, va,
)
bench(
    "creff dmaonly th=16 tw=128 (aligned)",
    functools.partial(creff_ablate, kh=7, kw=7, th=16, tw=128, ablate="dmaonly"),
    qa, ka, va,
)
print("DONE", flush=True)
