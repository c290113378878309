"""Durable retest recipes for the two known v5e/Mosaic-0.9 compiler
pathologies (PERF.md "lr_chunk>1 / batch-8+"; symptoms documented at
gop/pipeline.py:69-75). Run on each toolchain bump:

  1. lr_chunk=2 on camvid-bise18, the FULL composed GOP program — known to
     crash the TPU worker / hang the compile, while every stage passes in
     isolation.
  2. phase-1 training step at batch 8, camvid-psp18 720x960 f32 — known to
     fail in the remote compiler ("Batch 8+ fails", PERF.md); production
     uses --accum_steps microbatch scans instead.

Each repro runs in its own subprocess with a hard timeout so a worker
crash / compile hang cannot take the parent down, and serially — the axon
tunnel is single-client. Exit prints PASS (pathology gone: re-measure
chunked serving / big-batch training) or STILL-BROKEN per case.

Usage: python tools_retest_pathologies.py [timeout_s=900]
"""
import subprocess
import sys
import time

TIMEOUT = int(sys.argv[1]) if len(sys.argv) > 1 else 900

CASE_LR_CHUNK = """
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline
enable_compile_cache()
H, W, G = 720, 960, 12
hr = build_model("camvid-bise18", fuse=False)
lr = build_model("camvid-bise18", fuse=True)
hrp = hr.init(jax.random.PRNGKey(0)); lrp = lr.init(jax.random.PRNGKey(1))
pipe = ARPipeline(hr, lr, scale=0.5, dtype=jnp.bfloat16, lr_chunk=2)
rng = np.random.RandomState(0)
kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
out = pipe(hrp, lrp, kf, fr, (fx, fy))
print("OK", np.asarray(out[(0, 0, 0)]))
"""

CASE_BATCH8_TRAIN = """
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax
from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.train.objectives import build_phase1_loss
from arseg_tpu.train.optim import make_optimizer, cosine_schedule
from arseg_tpu.train.step import make_train_step
enable_compile_cache()
B, H, W = 8, 720, 960
model = build_model("camvid-psp18", fuse=False)
params = model.init(jax.random.PRNGKey(0))
loss_fn = build_phase1_loss(model, "pspnet", "camvid", (W, H), scale=1.0)
opt = make_optimizer("adam", cosine_schedule(1e-3, 100))
step = make_train_step(loss_fn, opt)
rng = np.random.RandomState(0)
batch = {
    "image": rng.randn(B, H, W, 3).astype(np.float32),
    "label": rng.randint(0, 12, (B, H, W)).astype(np.int32),
    "existence": np.ones((B, 12), np.float32),
}
import jax.numpy as jnp
batch = {k: jnp.asarray(v) for k, v in batch.items()}
out = step(params, opt.init(params), None, batch, jax.random.PRNGKey(1))
print("OK loss", float(out[2]["loss"]))
"""


CASE_FUSED_HEAD = """
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.ops.pallas_creff import creff_phase2_upsample_argmax
enable_compile_cache()
# production bise18 head shape: [1,90,120,128-lane] fusion, 12 classes, x8 up
c, ncls = 128, 12
rng = np.random.RandomState(0)
lr_up = jnp.asarray(rng.randn(1, 90, 120, c).astype(np.float32))
ref = jnp.asarray(rng.randn(1, 90, 120, c).astype(np.float32))
convs = [{"weight": jnp.asarray(rng.randn(3, 3, 1, c).astype(np.float32)),
          "bias": jnp.asarray(rng.randn(c).astype(np.float32))} for _ in range(3)]
fc = {"weight": jnp.asarray(rng.randn(1, 1, c, ncls).astype(np.float32)),
      "bias": jnp.asarray(rng.randn(ncls).astype(np.float32))}
out = creff_phase2_upsample_argmax(lr_up, ref, *convs, fc, 7, 7, 8)
print("OK", np.asarray(out[(0, 0, 0)]))
"""


CASE_BATCHED_WARP = """
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.ops import warp_feature
from arseg_tpu.ops.warp import _resize_plane_bilinear
from arseg_tpu.ops.pallas_creff import creff_qkv_fused
enable_compile_cache()
N, FH, FW, C = 11, 90, 120, 256
H, W = 720, 960
rng = np.random.RandomState(0)
ref = jnp.asarray(rng.randn(1, FH, FW, C).astype(np.float32)).astype(jnp.bfloat16)
feat = jnp.asarray(rng.randn(N, FH, FW, C).astype(np.float32)).astype(jnp.bfloat16)
fxa = jnp.asarray(rng.uniform(-16, 16, (N, H, W)).astype(np.float32))
fya = jnp.asarray(rng.uniform(-16, 16, (N, H, W)).astype(np.float32))
mk = lambda: {"weight": jnp.asarray(rng.randn(3, 3, 1, C).astype(np.float32)).astype(jnp.bfloat16),
              "bias": jnp.asarray(rng.randn(C).astype(np.float32)).astype(jnp.bfloat16)}
wq, wk, wv = mk(), mk(), mk()
def creff_one(f, wp):
    out = creff_qkv_fused(f[None], wp[None], wq, wk, wv, 7, 7)
    return jnp.argmax(out[0, ..., :12], axis=-1).astype(jnp.int32)
@jax.jit
def prog(ref, feat, fxa, fya):
    s = jnp.float32(FH / H)
    fxr = _resize_plane_bilinear(fxa * s, (FH, FW), True)
    fyr = _resize_plane_bilinear(fya * s, (FH, FW), True)
    ref_rep = jnp.broadcast_to(ref, (N,) + ref.shape[1:])
    warped = warp_feature(ref_rep, (fxr, fyr))
    return jax.lax.map(lambda a: creff_one(a[0], a[1]), (feat, warped))
print("OK", np.asarray(prog(ref, feat, fxa, fya)[(0, 0, 0)]))
"""


def run(tag, code):
    t0 = time.perf_counter()
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=TIMEOUT)
    except subprocess.TimeoutExpired:
        print(f"{tag}: STILL-BROKEN (hang > {TIMEOUT}s)", flush=True)
        return
    wall = time.perf_counter() - t0
    if r.returncode == 0 and "OK" in r.stdout:
        print(f"{tag}: PASS in {wall:.0f}s — pathology gone, re-measure "
              f"({r.stdout.strip().splitlines()[-1]})", flush=True)
    else:
        tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
        print(f"{tag}: STILL-BROKEN rc={r.returncode} in {wall:.0f}s", flush=True)
        for line in tail:
            print(f"    {line}", flush=True)


if __name__ == "__main__":
    # Status on jax/Mosaic 0.9, v5e, 2026-08-19 (bench_logs/r4queue_pathology.log
    # + r4queue_r4a.log):
    #   lr_chunk2-bise18      PASS (pathology GONE this toolchain; the legacy
    #                         chunked path stays non-default — p1_batched
    #                         subsumed its memory-bounding role and is faster)
    #   batch8-phase1-psp18   STILL-BROKEN (production uses --accum_steps)
    #   fused-bise18-head     PASS since round 5 (the per-class 2-D rewrite
    #                         lowers; the rank-3 form was the pathology) — but
    #                         measured SLOWER than the XLA planes head
    #                         (probes/r5/tools_probe_r5b.py: 14.27 vs 13.94
    #                         ms/GOP), so USE_FUSED_UPSAMPLE_HEAD stays False
    #   batched-warp-n11      STILL-BROKEN — minimized by probes/r4/
    #                         tools_probe_r4a.py: flow-plane bilinear resize
    #                         producer + batched n=11 warp + lax.map(CReFF)
    #                         hangs the compile; drop ANY one ingredient
    #                         (resize producer / conv producer instead /
    #                         single CReFF) and it passes. Production routes
    #                         around it with the per-frame warp inside the map.
    run("lr_chunk2-bise18", CASE_LR_CHUNK)
    run("batch8-phase1-psp18", CASE_BATCH8_TRAIN)
    # Compiles since the round-5 per-class rewrite; kept in the retest so
    # a toolchain regression on the lane-reduction/2-D-dot epilogue is
    # caught. (Perf decision: XLA planes head stays default, see
    # nn/bisenet.py USE_FUSED_UPSAMPLE_HEAD.)
    run("fused-bise18-head", CASE_FUSED_HEAD)
    # PASS here => retry ARPipeline batched-warp variants (PERF.md r3 GOP
    # budget: probe B's batched-p1/batched-fuse were the blocked designs).
    run("batched-warp-n11", CASE_BATCHED_WARP)
    print("DONE", flush=True)
