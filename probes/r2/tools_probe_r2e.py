"""Round-2 TPU probes, part E — bisect the window-DMA Mosaic crash and fix
the select stage.

  E1  DMA construct ladder:
      a) one DMA per tile, offset from scalar-prefetch SMEM
      b) fori_loop of DMAs, offsets derived from program_id (no SMEM)
      c) fori_loop of DMAs, offsets from SMEM scalars, serial (n_sem=1)
      d) python-unrolled 16-DMA wave, SMEM scalars
      e) full 240-DMA fori_loop wave (the part-D shape that crashed)
  E2  select stage, scatter-free block-diagonal (concat + iota mask),
      incl. output reassembly transpose
Run with --interpret for CPU semantics check.
"""
import sys, time, functools

sys.path.insert(0, "/root/repo")
INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arseg_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
BF = jnp.bfloat16
rng = np.random.RandomState(0)
H, W, CP = 720, 960, 128


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=8, rounds=3, check=None):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    try:
        out0 = f(*args)
        _sync(out0)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None
    compile_s = time.perf_counter() - t0
    if check is not None:
        err = check(np.asarray(out0))
        print(f"{name}: check={err}", flush=True)
    if INTERPRET:
        print(f"{name}: interpret OK", flush=True)
        return 0.0
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


print("=== E1: DMA construct ladder ===", flush=True)
WR, WC = 8, 16
nt = H // 8
srcp = jnp.pad(
    jnp.asarray(rng.randn(H, W, CP).astype(np.float32)).astype(BF),
    ((0, WR), (0, WC + 8), (0, 0)),
)


def ladder(variant, nb=240, n_sem=8):
    by = jnp.asarray(rng.randint(0, H, (nt * nb,)).astype(np.int32))
    bx = jnp.asarray((rng.randint(0, W // 8, (nt * nb,)) * 8).astype(np.int32))

    def kernel(by_ref, bx_ref, src_ref, out_ref, wbuf, sems):
        t = pl.program_id(0)

        def dma_smem(b, slot):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(by_ref[t * nb + b], WR), pl.ds(bx_ref[t * nb + b], WC), :],
                wbuf.at[slot],
                sems.at[slot],
            )

        def dma_grid(b, slot):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(lax.rem(t * 7 + b * 3, H), WR),
                           pl.ds(lax.rem(b, W // 8 - 2) * 8, WC), :],
                wbuf.at[slot],
                sems.at[slot],
            )

        if variant == "a":  # one smem-offset DMA
            d = dma_smem(0, 0)
            d.start()
            d.wait()
        elif variant == "b":  # fori_loop, grid-derived offsets, serial
            def body(b, _):
                d = dma_grid(b, 0)
                d.start()
                d.wait()
                return 0

            lax.fori_loop(0, nb, body, 0)
        elif variant == "c":  # fori_loop, smem offsets, serial
            def body(b, _):
                d = dma_smem(b, 0)
                d.start()
                d.wait()
                return 0

            lax.fori_loop(0, nb, body, 0)
        elif variant == "d":  # unrolled 16-wave, smem offsets
            for b in range(16):
                dma_smem(b, b % n_sem).start() if b < n_sem else None
            for b in range(16):
                if b >= n_sem:
                    dma_smem(b - n_sem, (b - n_sem) % n_sem).wait()
                    dma_smem(b, b % n_sem).start()
            for b in range(16 - n_sem, 16):
                dma_smem(b, b % n_sem).wait()
        elif variant == "e":  # fori_loop wave, smem offsets
            def body(b, _):
                @pl.when(b >= n_sem)
                def _w():
                    dma_smem(b - n_sem, lax.rem(b - n_sem, n_sem)).wait()

                dma_smem(b, lax.rem(b, n_sem)).start()
                return 0

            lax.fori_loop(0, nb, body, 0)

            def tail(s, _):
                b = nb - n_sem + s
                dma_smem(b, lax.rem(b, n_sem)).wait()
                return 0

            lax.fori_loop(0, n_sem, tail, 0)
        out_ref[0] = wbuf[n_sem - 1 if variant in ("d", "e") else 0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, WR, WC, CP), lambda t, by, bx: (t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((n_sem, WR, WC, CP), BF),
            pltpu.SemaphoreType.DMA((n_sem,)),
        ],
    )

    def run(by, bx, srcp):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nt, WR, WC, CP), BF),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024, has_side_effects=True
            ),
            interpret=INTERPRET,
        )(by, bx, srcp)

    nwin = {"a": nt, "b": nt * nb, "c": nt * nb, "d": nt * 16, "e": nt * nb}[variant]
    ms = bench(f"ladder {variant} (nb={nb})", run, by, bx, srcp)
    if ms:
        print(f"   -> {ms * 1e6 / nwin:.0f} ns/window", flush=True)


for v in ["a", "b", "c", "d", "e"]:
    ladder(v)

# ---------------------------------------------------------------- E2: select
print("=== E2: select stage (scatter-free) ===", flush=True)


def select_v2(th=8, nb=240, wr=8, wc=16, cp=64):
    nt = H // th
    ng = nb // 4
    rw = jnp.asarray(rng.rand(nt, nb, 32, wr).astype(np.float32)).astype(BF)
    cw = jnp.asarray(rng.rand(nt, nb, 32, wc).astype(np.float32)).astype(BF)
    win = jnp.asarray(rng.randn(nt, nb, wr, wc, cp).astype(np.float32)).astype(BF)

    def kernel(rw_ref, cw_ref, win_ref, out_ref):
        f32 = jnp.float32
        r = rw_ref[0]  # [nb, 32, wr]
        c = cw_ref[0]  # [nb, 32, wc]
        m = (r[:, :, :, None] * c[:, :, None, :]).reshape(nb, 32, wr * wc)
        m_rs = m.reshape(ng, 4 * 32, wr * wc)  # [ng, 128, 128]
        m_t = jnp.concatenate([m_rs] * 4, axis=-1)  # [ng, 128, 512]
        pp = lax.broadcasted_iota(jnp.int32, (4 * 32, 4 * wr * wc), 0)
        uu = lax.broadcasted_iota(jnp.int32, (4 * 32, 4 * wr * wc), 1)
        bd = (pp // 32) == (uu // (wr * wc))
        m_big = jnp.where(bd[None], m_t, jnp.zeros_like(m_t))
        w_all = win_ref[0].reshape(ng, 4 * wr * wc, cp)
        o = lax.dot_general(
            m_big, w_all, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
        )  # [ng, 128, cp]
        # reassemble [th, W, cp]: g = brow*30 + gcol; p = blk*32 + py*8 + px
        o = o.reshape(2, ng // 2, 4, 4, 8, cp)
        o = jnp.transpose(o, (0, 3, 1, 2, 4, 5))
        out_ref[0] = o.reshape(th, (ng // 2) * 4 * 8, cp).astype(out_ref.dtype)

    def run(rw, cw, win):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nt, th, nb // 2 * 8, cp), BF),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, nb, 32, wr), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb, 32, wc), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb, wr, wc, cp), lambda t: (t, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, th, nb // 2 * 8, cp), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=INTERPRET,
        )(rw, cw, win)

    def check(out):
        # numpy oracle for tile 0
        r = np.asarray(rw[0], np.float32)
        c = np.asarray(cw[0], np.float32)
        w = np.asarray(win[0], np.float32)
        m = np.einsum("bpr,bpe->bpre", r, c).reshape(nb, 32, wr * wc)
        o = np.einsum("bpu,buc->bpc", m, w.reshape(nb, wr * wc, cp))
        o = o.reshape(2, 30, 4, 4, 8, cp).transpose(0, 3, 1, 2, 4, 5).reshape(
            8, 960, cp
        )
        return float(np.abs(out[0].astype(np.float32) - o).max() / (np.abs(o).max() + 1e-9))

    bench(f"select v2 cp={cp}", run, rw, cw, win, check=check)


select_v2()
print("DONE", flush=True)
