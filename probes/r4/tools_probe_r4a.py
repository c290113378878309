"""Minimize the n=11 batched-warp TPU worker crash (VERDICT r3 next-#5).

Round-3 facts (PERF.md "GOP budget"): the full GOP program with EITHER
`batched-p1` or `batched-fuse` structure kills the TPU worker; both contain
the n=11 BATCHED `warp_feature` at [11,90,120,256]; every stage passes in
isolation (warp n=11 standalone, CReFF n=11 standalone, phase1 n=11). The
suspected minimal trigger: a batched warp gather feeding a lax.map over a
Pallas (CReFF) call inside one jitted program.

This probe bisects that composition WITHOUT the models, each variant in its
own subprocess (a worker crash must not take the driver down), serially
(single-client tunnel):

  warp+map-creff   batched n=11 warp -> lax.map(per-frame creff_qkv_fused + argmax)
  warp+map-id      batched warp -> lax.map(trivial VPU body)  [control]
  warp+one-creff   batched warp -> single n=1 creff on frame 0  [control]
  resize+warp+map  adds the flow-plane bilinear resample producer
  full-shape       same as warp+map-creff with HR-keyframe producer conv

Whichever smallest variant still dies becomes CASE_BATCHED_WARP in
tools_retest_pathologies.py, stamped with the toolchain version.

Usage: python probes/r4/tools_probe_r4a.py [variant ...]  (default: all)
"""
import subprocess
import sys
import time

TIMEOUT = 900

PRELUDE = """
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.ops import warp_feature
from arseg_tpu.ops.pallas_creff import creff_qkv_fused
enable_compile_cache()
N, FH, FW, C = 11, 90, 120, 256
rng = np.random.RandomState(0)
ref = jnp.asarray(rng.randn(1, FH, FW, C).astype(np.float32)).astype(jnp.bfloat16)
feat = jnp.asarray(rng.randn(N, FH, FW, C).astype(np.float32)).astype(jnp.bfloat16)
fx = jnp.asarray(rng.uniform(-16, 16, (N, FH, FW)).astype(np.float32))
fy = jnp.asarray(rng.uniform(-16, 16, (N, FH, FW)).astype(np.float32))
mk = lambda: {"weight": jnp.asarray(rng.randn(3, 3, 1, C).astype(np.float32)).astype(jnp.bfloat16),
              "bias": jnp.asarray(rng.randn(C).astype(np.float32)).astype(jnp.bfloat16)}
wq, wk, wv = mk(), mk(), mk()
def creff_one(f, wp):
    out = creff_qkv_fused(f[None], wp[None], wq, wk, wv, 7, 7)
    return jnp.argmax(out[0, ..., :12], axis=-1).astype(jnp.int32)
"""

VARIANTS = {
    "warp+map-creff": PRELUDE + """
@jax.jit
def prog(ref, feat, fx, fy):
    ref_rep = jnp.broadcast_to(ref, (N,) + ref.shape[1:])
    warped = warp_feature(ref_rep, (fx, fy))          # the n=11 batched warp
    return jax.lax.map(lambda a: creff_one(a[0], a[1]), (feat, warped))
print("OK", np.asarray(prog(ref, feat, fx, fy)[(0, 0, 0)]))
""",
    "warp+map-id": PRELUDE + """
@jax.jit
def prog(ref, feat, fx, fy):
    ref_rep = jnp.broadcast_to(ref, (N,) + ref.shape[1:])
    warped = warp_feature(ref_rep, (fx, fy))
    body = lambda a: jnp.argmax((a[0] + a[1])[..., :12], axis=-1).astype(jnp.int32)
    return jax.lax.map(body, (feat, warped))
print("OK", np.asarray(prog(ref, feat, fx, fy)[(0, 0, 0)]))
""",
    "warp+one-creff": PRELUDE + """
@jax.jit
def prog(ref, feat, fx, fy):
    ref_rep = jnp.broadcast_to(ref, (N,) + ref.shape[1:])
    warped = warp_feature(ref_rep, (fx, fy))
    return creff_one(feat[0], warped[0])
print("OK", np.asarray(prog(ref, feat, fx, fy)[(0, 0)]))
""",
    "resize+warp+map": PRELUDE + """
from arseg_tpu.ops.warp import _resize_plane_bilinear
H, W = 720, 960
fxa = jnp.asarray(rng.uniform(-16, 16, (N, H, W)).astype(np.float32))
fya = jnp.asarray(rng.uniform(-16, 16, (N, H, W)).astype(np.float32))
@jax.jit
def prog(ref, feat, fxa, fya):
    s = jnp.float32(FH / H)
    fxr = _resize_plane_bilinear(fxa * s, (FH, FW), True)
    fyr = _resize_plane_bilinear(fya * s, (FH, FW), True)
    ref_rep = jnp.broadcast_to(ref, (N,) + ref.shape[1:])
    warped = warp_feature(ref_rep, (fxr, fyr))
    return jax.lax.map(lambda a: creff_one(a[0], a[1]), (feat, warped))
print("OK", np.asarray(prog(ref, feat, fxa, fya)[(0, 0, 0)]))
""",
    "full-shape": PRELUDE + """
# adds an HR-keyframe-like producer for ref (conv from a [1,720,960,3] input)
key = jnp.asarray(rng.randn(1, 720, 960, 3).astype(np.float32)).astype(jnp.bfloat16)
wconv = jnp.asarray(rng.randn(8, 8, 3, C).astype(np.float32)).astype(jnp.bfloat16) * 0.01
@jax.jit
def prog(key, feat, fx, fy):
    r = jax.lax.conv_general_dilated(key, wconv, (8, 8), "SAME",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    r = r[:, :FH, :FW, :]
    ref_rep = jnp.broadcast_to(r, (N,) + r.shape[1:])
    warped = warp_feature(ref_rep, (fx, fy))
    return jax.lax.map(lambda a: creff_one(a[0], a[1]), (feat, warped))
print("OK", np.asarray(prog(key, feat, fx, fy)[(0, 0, 0)]))
""",
}


def run(tag, code):
    t0 = time.perf_counter()
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=TIMEOUT)
    except subprocess.TimeoutExpired:
        print(f"{tag}: HANG > {TIMEOUT}s", flush=True)
        return "hang"
    wall = time.perf_counter() - t0
    if r.returncode == 0 and "OK" in r.stdout:
        print(f"{tag}: PASS in {wall:.0f}s", flush=True)
        return "pass"
    tail = (r.stderr or r.stdout).strip().splitlines()[-4:]
    print(f"{tag}: CRASH rc={r.returncode} in {wall:.0f}s", flush=True)
    for line in tail:
        print(f"    {line}", flush=True)
    return "crash"


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    results = {}
    for name in names:
        results[name] = run(name, VARIANTS[name])
    print("SUMMARY", results, flush=True)
