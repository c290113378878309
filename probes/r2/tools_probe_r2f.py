"""Round-2 TPU probes, part F.

  F1  window-DMA offsets from a regular SMEM BlockSpec input
      (shape [nt, 8, 256] block (1,8,256) — divisibility-compliant),
      serial + wave variants — the scalar-prefetch crash workaround
  F2  select-stage bisection (s1 dot only / s2 +transpose / s3 full)
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
WR, WC = 8, 16
nt = H // 8


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=8, rounds=3):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    try:
        _sync(f(*args))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None
    compile_s = time.perf_counter() - t0
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


print("=== F1: SMEM-BlockSpec offset DMA ===", flush=True)
srcp = jnp.pad(
    jnp.asarray(rng.randn(H, W, CP).astype(np.float32)).astype(BF),
    ((0, WR), (0, WC + 8), (0, 0)),
)


def smem_ladder(variant, nb=240, n_sem=8):
    # bases [nt, 8, 256]: row 0 = by, row 1 = bx (padded to 256 lanes)
    bases = np.zeros((nt, 8, 256), np.int32)
    bases[:, 0, :nb] = rng.randint(0, H, (nt, nb))
    bases[:, 1, :nb] = rng.randint(0, W // 8, (nt, nb)) * 8
    bases = jnp.asarray(bases)

    def kernel(b_ref, src_ref, out_ref, wbuf, sems):
        def dma(b, slot):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(b_ref[0, 0, b], WR), pl.ds(b_ref[0, 1, b], WC), :],
                wbuf.at[slot],
                sems.at[slot],
            )

        if variant == "serial":
            def body(b, _):
                d = dma(b, 0)
                d.start()
                d.wait()
                return 0

            lax.fori_loop(0, nb, body, 0)
        else:  # wave
            def body(b, _):
                @pl.when(b >= n_sem)
                def _w():
                    dma(b - n_sem, lax.rem(b - n_sem, n_sem)).wait()

                dma(b, lax.rem(b, n_sem)).start()
                return 0

            lax.fori_loop(0, nb, body, 0)

            def tail(s, _):
                dma(nb - n_sem + s, lax.rem(nb - n_sem + s, n_sem)).wait()
                return 0

            lax.fori_loop(0, n_sem, tail, 0)
        out_ref[0] = wbuf[n_sem - 1 if variant == "wave" else 0]

    def run(bases, srcp):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nt, WR, WC, CP), BF),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, 8, 256), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, WR, WC, CP), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((n_sem, WR, WC, CP), BF),
                pltpu.SemaphoreType.DMA((n_sem,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024, has_side_effects=True
            ),
            interpret=INTERPRET,
        )(bases, srcp)

    ms = bench(f"smem-dma {variant} n_sem={n_sem}", run, bases, srcp)
    if ms:
        print(f"   -> {ms * 1e6 / (nt * nb):.0f} ns/window", flush=True)


smem_ladder("serial")
smem_ladder("wave", n_sem=8)
smem_ladder("wave", n_sem=16)
smem_ladder("wave", n_sem=32)

# ---------------------------------------------------------------- F2: select
print("=== F2: select bisection ===", flush=True)


def select_bisect(stage, th=8, nb=240, wr=8, wc=16, cp=64):
    ntl = H // th
    ng = nb // 4
    rw = jnp.asarray(rng.rand(ntl, nb, 32, wr).astype(np.float32)).astype(BF)
    cw = jnp.asarray(rng.rand(ntl, nb, 32, wc).astype(np.float32)).astype(BF)
    win = jnp.asarray(rng.randn(ntl, nb, wr, wc, cp).astype(np.float32)).astype(BF)

    def kernel(rw_ref, cw_ref, win_ref, out_ref):
        f32 = jnp.float32
        w_all = win_ref[0].reshape(ng, 4 * wr * wc, cp)
        if stage == "s1":  # fixed mask, dot only, no transpose
            m_big = jnp.full((ng, 4 * 32, 4 * wr * wc), 0.01, BF)
            o = lax.dot_general(m_big, w_all, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=f32)
            out_ref[0] = o.reshape(th, nb // 2 * 8, cp).astype(out_ref.dtype)
            return
        if stage == "s2":  # + output transpose
            m_big = jnp.full((ng, 4 * 32, 4 * wr * wc), 0.01, BF)
            o = lax.dot_general(m_big, w_all, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=f32)
            o = o.reshape(2, ng // 2, 4, 4, 8, cp)
            o = jnp.transpose(o, (0, 3, 1, 2, 4, 5))
            out_ref[0] = o.reshape(th, nb // 2 * 8, cp).astype(out_ref.dtype)
            return
        # s3: full mask build + dot + transpose
        r = rw_ref[0]
        c = cw_ref[0]
        m = (r[:, :, :, None] * c[:, :, None, :]).reshape(nb, 32, wr * wc)
        m_rs = m.reshape(ng, 4 * 32, wr * wc)
        m_t = jnp.concatenate([m_rs] * 4, axis=-1)
        pp = lax.broadcasted_iota(jnp.int32, (4 * 32, 4 * wr * wc), 0)
        uu = lax.broadcasted_iota(jnp.int32, (4 * 32, 4 * wr * wc), 1)
        bd = (pp // 32) == (uu // (wr * wc))
        m_big = jnp.where(bd[None], m_t, jnp.zeros_like(m_t))
        o = lax.dot_general(m_big, w_all, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=f32)
        o = o.reshape(2, ng // 2, 4, 4, 8, cp)
        o = jnp.transpose(o, (0, 3, 1, 2, 4, 5))
        out_ref[0] = o.reshape(th, nb // 2 * 8, cp).astype(out_ref.dtype)

    def run(rw, cw, win):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ntl, th, nb // 2 * 8, cp), BF),
            grid=(ntl,),
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

    bench(f"select {stage}", run, rw, cw, win)


for s in ["s1", "s2", "s3"]:
    select_bisect(s)
print("DONE", flush=True)
