"""Round-2 TPU probes, part G — primitive mechanisms for data-dependent
spatial permutation (the MV-warp problem), after part E/F found that
(a) SMEM-offset window DMAs crash Mosaic 0.9.0 (remote-compile 500) and
(b) the block-diagonal matmul select alone costs 8 ms (FLOP-inflated 16x).

Ladder (each probe is tiny; compile-or-crash is the signal):
  P1  DMA offset from scalar-prefetch SMEM, STATIC smem index, 1 dynamic dim
  P2  ... smem index = program_id
  P3  ... smem index = fori_loop var
  P4  ... two dynamic dims (outer + 8-aligned sublane)
  P5  in-kernel VMEM dynamic_slice from SMEM scalar (no DMA)
  P6  take_along_axis along sublane axis (row permute of [128,128])
  P7  take_along_axis along lane axis
  P8  VPU masked shift-sum rate: 25-term residual select on [8,W,C]
  P9  jnp.take rows from a VMEM table (gather axis 0)
"""
import sys, time

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
rng = np.random.RandomState(0)
F32 = jnp.float32


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=16, rounds=3, check=None):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    try:
        out0 = f(*args)
        _sync(out0)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    compile_s = time.perf_counter() - t0
    msg = ""
    if check is not None:
        msg = f" check={check(np.asarray(out0)):.2e}"
    if INTERPRET:
        print(f"{name}: interpret OK{msg}", flush=True)
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
    print(f"{name}: {ms:.3f} ms  (compile {compile_s:.1f}s){msg}", flush=True)
    return ms


# ---------------------------------------------------------- P1-P4: DMA ladder
H, W, C = 256, 256, 128
src = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
NT = 8
bases = jnp.asarray(rng.randint(0, H - 16, (NT,)).astype(np.int32))
bases8 = (bases // 8) * 8


def dma_probe(name, idx_mode, ndyn):
    def kernel(b_ref, src_ref, out_ref, buf, sem):
        t = pl.program_id(0)
        if idx_mode == "static":
            off = b_ref[0]
        elif idx_mode == "pid":
            off = b_ref[t]
        else:
            off = None  # loop mode below
        if idx_mode == "loop":
            def body(i, _):
                o = b_ref[i]
                cp = pltpu.make_async_copy(
                    src_ref.at[pl.ds(o, 8), :, :], buf, sem
                )
                cp.start()
                cp.wait()
                return 0

            lax.fori_loop(0, NT, body, 0)
        else:
            if ndyn == 1:
                cp = pltpu.make_async_copy(src_ref.at[pl.ds(off, 8), :, :], buf, sem)
            else:
                cp = pltpu.make_async_copy(
                    src_ref.at[pl.ds(off, 8), pl.ds((off // 8) * 8, 16), :],
                    buf.at[:, :16, :],
                    sem,
                )
            cp.start()
            cp.wait()
        out_ref[0] = buf[...]

    def run(bases, src):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NT, 8, W, C), F32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(NT,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (1, 8, W, C), lambda t, b: (t, 0, 0, 0), memory_space=pltpu.VMEM
                ),
                scratch_shapes=[
                    pltpu.VMEM((8, W, C), F32),
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            interpret=INTERPRET,
        )(bases, src)

    bench(name, run, bases8, src)


print("=== P1-P4: dynamic-offset DMA ladder ===", flush=True)
dma_probe("P1 dma static-smem-idx 1dyn", "static", 1)
dma_probe("P2 dma pid-smem-idx 1dyn", "pid", 1)
dma_probe("P3 dma loop-smem-idx 1dyn", "loop", 1)
dma_probe("P4 dma pid-smem-idx 2dyn", "pid", 2)


# ------------------------------------------------- P5: VMEM dynamic_slice
print("=== P5: VMEM dynamic_slice from SMEM scalar ===", flush=True)


def p5():
    blk = jnp.asarray(rng.randn(NT, 64, 128, C).astype(np.float32))

    def kernel(b_ref, x_ref, out_ref):
        off = (b_ref[pl.program_id(0)] // 8) * 8 % 48
        out_ref[0] = x_ref[0, pl.ds(off, 8), :, :]

    def run(bases, blk):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NT, 8, 128, C), F32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(NT,),
                in_specs=[
                    pl.BlockSpec(
                        (1, 64, 128, C), lambda t, b: (t, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                ],
                out_specs=pl.BlockSpec(
                    (1, 8, 128, C), lambda t, b: (t, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            interpret=INTERPRET,
        )(bases, blk)

    bench("P5 vmem dyn-slice sublane(8-aligned)", run, bases, blk)

    def kernel2(b_ref, x_ref, out_ref):
        off = b_ref[pl.program_id(0)] % 56
        out_ref[0] = x_ref[0, pl.ds(off, 8), :, :]

    def run2(bases, blk):
        return pl.pallas_call(
            kernel2,
            out_shape=jax.ShapeDtypeStruct((NT, 8, 128, C), F32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(NT,),
                in_specs=[
                    pl.BlockSpec(
                        (1, 64, 128, C), lambda t, b: (t, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                ],
                out_specs=pl.BlockSpec(
                    (1, 8, 128, C), lambda t, b: (t, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            interpret=INTERPRET,
        )(bases, blk)

    bench("P5b vmem dyn-slice sublane(unaligned)", run2, bases, blk)

    # outer-dim dynamic index
    def kernel3(b_ref, x_ref, out_ref):
        off = b_ref[pl.program_id(0)] % 56
        out_ref[0] = x_ref[0, pl.ds(off, 8), :, :].astype(F32)

    blk4 = jnp.asarray(rng.randn(NT, 64, 128, C).astype(np.float32))
    del kernel3, blk4


p5()


# ------------------------------------ P6/P7: take_along_axis inside a kernel
print("=== P6/P7: in-kernel dynamic gather ===", flush=True)


def p67():
    x = jnp.asarray(rng.randn(128, 128).astype(np.float32))
    idx_rows = jnp.asarray(rng.randint(0, 128, (128,)).astype(np.int32))
    idx_full = jnp.asarray(rng.randint(0, 128, (128, 128)).astype(np.int32))

    def k_rowperm(x_ref, i_ref, out_ref):
        out_ref[...] = jnp.take(x_ref[...], i_ref[...], axis=0)

    def run_rowperm(x, i):
        return pl.pallas_call(
            k_rowperm,
            out_shape=jax.ShapeDtypeStruct((128, 128), F32),
            interpret=INTERPRET,
        )(x, i)

    ref = np.asarray(x)[np.asarray(idx_rows)]
    bench("P6 take(rows) [128,128]", run_rowperm, x, idx_rows,
          check=lambda o: float(np.abs(o - ref).max()))

    def k_taa_sub(x_ref, i_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    def run_taa_sub(x, i):
        return pl.pallas_call(
            k_taa_sub,
            out_shape=jax.ShapeDtypeStruct((128, 128), F32),
            interpret=INTERPRET,
        )(x, i)

    ref2 = np.take_along_axis(np.asarray(x), np.asarray(idx_full), axis=0)
    bench("P6b take_along_axis(sublane) [128,128]", run_taa_sub, x, idx_full,
          check=lambda o: float(np.abs(o - ref2).max()))

    def k_taa_lane(x_ref, i_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    def run_taa_lane(x, i):
        return pl.pallas_call(
            k_taa_lane,
            out_shape=jax.ShapeDtypeStruct((128, 128), F32),
            interpret=INTERPRET,
        )(x, i)

    ref3 = np.take_along_axis(np.asarray(x), np.asarray(idx_full), axis=1)
    bench("P7 take_along_axis(lane) [128,128]", run_taa_lane, x, idx_full,
          check=lambda o: float(np.abs(o - ref3).max()))

    # bigger row-permute: [512, 512] f32
    xb = jnp.asarray(rng.randn(512, 512).astype(np.float32))
    ib = jnp.asarray(rng.randint(0, 512, (512,)).astype(np.int32))

    def run_rowperm_big(x, i):
        return pl.pallas_call(
            k_rowperm,
            out_shape=jax.ShapeDtypeStruct((512, 512), F32),
            interpret=INTERPRET,
        )(x, i)

    refb = np.asarray(xb)[np.asarray(ib)]
    bench("P6c take(rows) [512,512]", run_rowperm_big, xb, ib,
          check=lambda o: float(np.abs(o - refb).max()))


p67()


# --------------------------------------------- P8: VPU masked shift-sum rate
print("=== P8: masked shift-sum rate ===", flush=True)


def p8(terms_r=2):
    # residual select out[y,x,c] = sum_{|dy|<=r,|dx|<=r} m_dydx[y,x]*src[y+dy,x+dx,c]
    h, w, c = 64, 960, 64
    r = terms_r
    src = jnp.asarray(rng.randn(h + 2 * r, w + 2 * r, c).astype(np.float32)).astype(jnp.bfloat16)
    sel = jnp.asarray(rng.randint(0, (2 * r + 1) ** 2, (h, w)).astype(np.int32))

    def kernel(sel_ref, src_ref, out_ref):
        s = sel_ref[...]
        acc = jnp.zeros((h, w, c), F32)
        t = 0
        for dy in range(2 * r + 1):
            for dx in range(2 * r + 1):
                m = (s == t)[..., None]
                acc = acc + jnp.where(m, src_ref[pl.ds(dy, h), pl.ds(dx, w), :].astype(F32), 0.0)
                t += 1
        out_ref[...] = acc.astype(out_ref.dtype)

    def run(sel, src):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((h, w, c), jnp.bfloat16),
            interpret=INTERPRET,
        )(sel, src)

    ms = bench(f"P8 shift-sum r={r} ({(2*r+1)**2} terms) [{h},{w},{c}]bf16", run, sel, src)
    if ms:
        # scale estimate to full frame 720x960
        print(f"   -> est full-frame: {ms * 720 / h:.2f} ms", flush=True)


p8(1)
p8(2)
p8(4)

print("DONE", flush=True)
