"""Round-2 TPU probes, part D.

  D0  dispatch floor (tiny op) + fori-chained true device times
  D1  window DMA rate (unroll fix)
  D2  blocked-warp SELECT stage prototype (mask outer-product + grouped
      block-diagonal matmul) — compile viability + cost
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
BF = jnp.bfloat16
rng = np.random.RandomState(0)
H, W, C = 720, 960, 64


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=10, rounds=3, nbytes=None, per=1):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    try:
        _sync(f(*args))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:400]}", flush=True)
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
    msg = f"{name}: {ms:.2f} ms"
    if per > 1:
        msg += f"  ({ms / per:.3f} ms/op)"
    if nbytes:
        msg += f"  -> {nbytes * per / ms / 1e6:.0f} GB/s"
    print(msg + f"  (compile {compile_s:.1f}s)", flush=True)
    return ms


print("=== D0: dispatch floor + chained device times ===", flush=True)
tiny = jnp.ones((8, 128), BF)
bench("tiny x+1 (dispatch floor)", lambda x: x + 1, tiny)

REPS = 16
big16 = jnp.asarray(rng.randn(720, 960, 128).astype(np.float32)).astype(BF)


def chained(op, reps=REPS):
    def run(x, *rest):
        return lax.fori_loop(0, reps, lambda i, x: op(x, *rest), x)

    return run


bench(f"chained x+1 bf16 x{REPS}", chained(lambda x: x + 1), big16,
      per=REPS, nbytes=2 * big16.nbytes)
bench(f"chained x+1 f32 x{REPS}", chained(lambda x: x + 1),
      big16.astype(jnp.float32), per=REPS, nbytes=4 * big16.nbytes)

from arseg_tpu.ops.pallas_creff import creff_fused_pallas
from arseg_tpu.ops.warp import warp_feature

qa = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32)).astype(BF)
ka = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32)).astype(BF)
va = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32)).astype(BF)
bench(
    f"chained creff_fused x8",
    lambda q, k, v: lax.fori_loop(0, 8, lambda i, q: creff_fused_pallas(q, k, v, 7, 7), q),
    qa, ka, va, per=8,
)
fx = jnp.asarray(rng.uniform(-16, 16, (1, H, W)).astype(np.float32))
fy = jnp.asarray(rng.uniform(-16, 16, (1, H, W)).astype(np.float32))
bench(
    f"chained warp exact x8",
    lambda f, a, b: lax.fori_loop(0, 8, lambda i, f: warp_feature(f, (a, b)).astype(f.dtype), f),
    ka, fx, fy, per=8,
)

# ---------------------------------------------------------------- D1: window DMA
print("=== D1: window DMA rate ===", flush=True)


def dma_win_probe(th, nb, wr, wc, cp=128, n_sem=8, unroll=1):
    nt = H // th
    srcp = jnp.pad(
        jnp.asarray(rng.randn(H, W, cp).astype(np.float32)).astype(BF),
        ((0, wr), (0, wc + 8), (0, 0)),
    )
    by = jnp.asarray(rng.randint(0, H, (nt * nb,)).astype(np.int32))
    bx = jnp.asarray((rng.randint(0, W // 8, (nt * nb,)) * 8).astype(np.int32))

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

        lax.fori_loop(0, nb, body, 0, unroll=unroll)

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
            (1, wr, wc, cp), lambda t, by, bx: (t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((n_sem, wr, wc, cp), BF),
            pltpu.SemaphoreType.DMA((n_sem,)),
        ],
    )

    def run(by, bx, srcp):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nt, wr, wc, cp), BF),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024, has_side_effects=True
            ),
        )(by, bx, srcp)

    nwin = nt * nb
    ms = bench(f"win dma [{wr},{wc},{cp}] x {nwin} unroll={unroll}", run, by, bx,
               srcp, nbytes=nwin * wr * wc * cp * 2)
    if ms:
        print(f"   -> {ms * 1e6 / nwin:.0f} ns/window", flush=True)
    return ms


dma_win_probe(8, 240, 8, 16, cp=128, unroll=1)
dma_win_probe(8, 240, 8, 16, cp=64, unroll=1)   # unpadded C (lane=64=array dim)
dma_win_probe(8, 240, 8, 8, cp=128, unroll=1)
dma_win_probe(8, 240, 8, 16, cp=128, n_sem=16, unroll=1)

# ---------------------------------------------------------------- D2: select stage
print("=== D2: blocked-warp select prototype ===", flush=True)
# per tile: NB=240 blocks (2 block-rows x 120 block-cols of 4x8 px), window
# [8,16,C] flattened to 128 contract dim; groups of 4 blocks -> [128, 512]
# block-diag mask x [512, C] stacked windows.


def select_proto(th=8, nb=240, wr=8, wc=16, cp=128):
    nt = H // th
    ng = nb // 4
    rw = jnp.asarray(rng.rand(nt, nb, 32, wr).astype(np.float32)).astype(BF)
    cw = jnp.asarray(rng.rand(nt, nb, 32, wc).astype(np.float32)).astype(BF)

    def kernel(rw_ref, cw_ref, out_ref, wbuf):
        f32 = jnp.float32
        acc = []
        for g in range(ng):
            # mask outer product for 4 blocks: [4, 32, wr] x [4, 32, wc]
            r4 = rw_ref[0, 4 * g : 4 * g + 4].astype(f32)  # [4, 32, wr]
            c4 = cw_ref[0, 4 * g : 4 * g + 4].astype(f32)  # [4, 32, wc]
            m = (r4[:, :, :, None] * c4[:, :, None, :]).reshape(4, 32, wr * wc)
            # block-diagonal [128, 4*128]
            mbd = jnp.zeros((4, 32, 4, wr * wc), f32)
            for b in range(4):
                mbd = mbd.at[b, :, b, :].set(m[b])
            mbd = mbd.reshape(128, 4 * wr * wc).astype(BF)
            w4 = wbuf[4 * g : 4 * g + 4].reshape(4 * wr * wc, cp)
            acc.append(
                lax.dot_general(mbd, w4, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
            )
        out = jnp.stack(acc)  # [ng, 128, cp]
        out_ref[0] = out.astype(out_ref.dtype)

    def run(rw, cw):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nt, ng, 128, cp), BF),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, nb, 32, wr), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb, 32, wc), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, ng, 128, cp), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((nb, wr, wc, cp), BF)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(rw, cw)

    bench(f"select proto th={th} nb={nb}", run, rw, cw, per=1)


select_proto()
print("DONE", flush=True)
