"""Round-3 probe C: creff_qkv_fused tiling sweep at the bise18 fusion shape
[11, 90, 120, 256] bf16 (one GOP of non-key frames in one launch).

Levers: th (sublane tile rows; 16 is the production default) and tw (120 =
one 126-wide band pass; 64 = two tiles/stripe but per-dy block width 72
instead of 128 -> ~0.6x the banded-matmul FLOPs)."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.ops.pallas_creff import creff_qkv_fused, creff_fused_pallas

enable_compile_cache()

N, FH, FW, C = 11, 90, 120, 256
DT = jnp.bfloat16

rng = np.random.RandomState(0)
lr_model = build_model("camvid-bise18", fuse=True)
p = lr_model.init(jax.random.PRNGKey(1))
fa = jax.tree_util.tree_map(lambda x: x.astype(DT), p["fuse_attention"])
a = jnp.asarray(rng.randn(N, FH, FW, C).astype(np.float32)).astype(DT)
b = jnp.asarray(rng.randn(N, FH, FW, C).astype(np.float32)).astype(DT)


def _sync(out):
    return np.asarray(out[(0,) * out.ndim])


def bench(name, fn, *args, iters=12, rounds=5):
    try:
        for _ in range(2):
            _sync(fn(*args))
    except Exception as e:
        print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None, None
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name:28s} {t*1e3:8.3f} ms ({t/N*1e3:6.3f} ms/frame)", flush=True)
    return t, out


if len(sys.argv) > 1 and sys.argv[1] == "n1":
    # production launches the kernel at n=1 (batching the composed program
    # crashes the worker): find the per-launch overhead vs the n=11 batch
    # and the best n=1 tile (smaller th = more grid steps = better DMA
    # double-buffer overlap within one launch)
    a1, b1 = a[:1], b[:1]
    for th in (30, 15, 10, 6):
        fn = jax.jit(lambda x, y, th=th: creff_qkv_fused(
            x, y, fa["lr_query_conv"], fa["hr_key_conv"], fa["hr_value_conv"],
            7, 7, th, 120))
        t, _ = bench(f"qkv n=1 th={th}", fn, a1, b1, iters=33)
    fn11 = jax.jit(lambda x, y: creff_qkv_fused(
        x, y, fa["lr_query_conv"], fa["hr_key_conv"], fa["hr_value_conv"],
        7, 7, 30, 120))
    bench("qkv n=11 th=30 (ref)", fn11, a, b)
    print("DONE", flush=True)
    sys.exit(0)

ref_out = None
results = {}
for th, tw in [(16, 120), (8, 120), (24, 120), (30, 120), (45, 120),
               (16, 64), (24, 64), (30, 64), (8, 64)]:
    fn = jax.jit(lambda a, b, th=th, tw=tw: creff_qkv_fused(
        a, b, fa["lr_query_conv"], fa["hr_key_conv"], fa["hr_value_conv"],
        7, 7, th, tw))
    t, out = bench(f"qkv_fused th={th} tw={tw}", fn, a, b)
    if out is not None:
        if ref_out is None:
            ref_out = np.asarray(out, np.float32)
        else:
            got = np.asarray(out, np.float32)
            md = np.abs(got - ref_out).max()
            if md > 2e-2:
                print(f"   ^ MISMATCH vs th16/tw120: max diff {md}", flush=True)
print("DONE", flush=True)
