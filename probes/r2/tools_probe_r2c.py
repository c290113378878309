"""Round-2 TPU probes, part C — the bandwidth hierarchy.

  C1  XLA elementwise / copy bandwidth (the non-Pallas reference point)
  C2  Pallas BlockSpec-pipelined copy bandwidth (no manual DMA)
  C3  manual-DMA copy with deeper double buffering (2/4/8 slots)
  C4  dynamic window DMA retry (cp=128 scratch — lane-dim legality)
  C5  VMEM ceiling probe (how big can scratch get?)
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


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=10, rounds=3, nbytes=None):
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
    extra = f"  -> {nbytes / ms / 1e6:.0f} GB/s" if nbytes else ""
    print(f"{name}: {ms:.2f} ms  (compile {compile_s:.1f}s){extra}", flush=True)
    return ms


# ---------------------------------------------------------------- C1: XLA BW
print("=== C1: XLA bandwidth reference ===", flush=True)
big16 = jnp.asarray(rng.randn(720, 960, 128).astype(np.float32)).astype(BF)  # 177 MB
bench("xla x+1 [720,960,128] bf16", lambda x: x + 1, big16, nbytes=2 * big16.nbytes)
big32 = jnp.asarray(rng.randn(720, 960, 128).astype(np.float32))  # 354 MB
bench("xla x+1 [720,960,128] f32", lambda x: x + 1, big32, nbytes=2 * big32.nbytes)
bench(
    "xla 9-tap shifted add bf16",
    lambda x: sum(
        x[i : i + 714, j : j + 954, :] * (0.1 * (i * 3 + j + 1))
        for i in range(3)
        for j in range(3)
    ),
    big16,
    nbytes=2 * big16.nbytes,
)

# ---------------------------------------------------------------- C2: pipelined
print("=== C2: BlockSpec-pipelined copy ===", flush=True)


def pipelined_copy(x, th):
    h, w, c = x.shape
    nt = h // th

    def kernel(in_ref, out_ref):
        out_ref[:] = in_ref[:] * 2

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(nt,),
        in_specs=[pl.BlockSpec((th, w, c), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((th, w, c), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


for th in [8, 16, 48]:
    bench(f"pipelined copy th={th} bf16", functools.partial(pipelined_copy, th=th),
          big16, nbytes=2 * big16.nbytes)

# three-view overlapping row-halo delivery (the BlockSpec halo alternative)
def halo_views(x, th):
    h, w, c = x.shape
    nt = h // th

    def kernel(a_ref, b_ref, c_ref, out_ref):
        out_ref[:] = (
            a_ref[:].astype(jnp.float32)
            + b_ref[:].astype(jnp.float32)
            + c_ref[:].astype(jnp.float32)
        ).astype(out_ref.dtype)

    spec = lambda d: pl.BlockSpec(
        (th, w, c),
        lambda t: (jnp.clip(t + d, 0, nt - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(nt,),
        in_specs=[spec(-1), spec(0), spec(1)],
        out_specs=pl.BlockSpec((th, w, c), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


bench("3-view row-halo th=16 bf16", functools.partial(halo_views, th=16),
      big16, nbytes=4 * big16.nbytes)

# ---------------------------------------------------------------- C3: manual DMA depth
print("=== C3: manual DMA buffering depth ===", flush=True)


def manual_copy(x, th, depth):
    h, w, c = x.shape
    nt = h // th

    def kernel(in_ref, out_ref, buf, sems):
        t = pl.program_id(0)
        slot = lax.rem(t, depth)

        def dma(s, t2):
            return pltpu.make_async_copy(
                in_ref.at[pl.ds(t2 * th, th), :, :], buf.at[s], sems.at[s]
            )

        @pl.when(t == 0)
        def _():
            for d in range(depth - 1):
                if d + 0 < nt:
                    dma(d, d).start()

        @pl.when(t + depth - 1 < nt)
        def _():
            dma(lax.rem(t + depth - 1, depth), t + depth - 1).start()

        dma(slot, t).wait()
        out_ref[:] = buf[slot] * 2

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((th, w, c), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, th, w, c), x.dtype),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


for depth in [2, 4]:
    for th in [16, 48]:
        bench(f"manual copy th={th} depth={depth} bf16",
              functools.partial(manual_copy, th=th, depth=depth),
              big16, nbytes=2 * big16.nbytes)

# ---------------------------------------------------------------- C4: window DMA
print("=== C4: dynamic window DMA (cp=128) ===", flush=True)
H, W = 720, 960


def dma_win_probe(th, nb, wr, wc, cp=128, n_sem=8):
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
            y0 = by_ref[t * nb + b]
            x0 = bx_ref[t * nb + b]
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(y0, wr), pl.ds(x0, wc), :],
                wbuf.at[slot],
                sems.at[slot],
            )

        def body(b, _):
            @pl.when(b >= n_sem)
            def _w():
                dma(b - n_sem, lax.rem(b - n_sem, n_sem)).wait()

            dma(b, lax.rem(b, n_sem)).start()
            return 0

        lax.fori_loop(0, nb, body, 0, unroll=4)

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
    ms = bench(f"win dma [{wr},{wc},{cp}] x {nwin}", run, by, bx, srcp,
               nbytes=nwin * wr * wc * cp * 2)
    if ms:
        print(f"   -> {ms * 1e6 / nwin:.0f} ns/window", flush=True)


dma_win_probe(8, 240, 8, 16)
dma_win_probe(8, 240, 8, 8)
dma_win_probe(8, 240, 16, 8)

# ---------------------------------------------------------------- C5: VMEM ceiling
print("=== C5: VMEM ceiling ===", flush=True)


def vmem_probe(mb):
    n = mb * 1024 * 1024 // (2 * 960 * 128)  # rows of bf16 [960,128]
    x = jnp.asarray(rng.randn(8, 960, 128).astype(np.float32)).astype(BF)

    def kernel(in_ref, out_ref, big):
        big[: in_ref.shape[0]] = in_ref[:]
        out_ref[:] = big[: in_ref.shape[0]]

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n, 960, 128), BF)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(mb + 8) * 1024 * 1024
            ),
        )(x)

    r = bench(f"vmem scratch {mb} MB", run, x, iters=2, rounds=1)
    return r is not None


for mb in [16, 32, 64, 96, 120]:
    if not vmem_probe(mb):
        break
print("DONE", flush=True)
