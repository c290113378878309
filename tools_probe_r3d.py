"""Round-3 probe D: (1) retest the lr_chunk>1 composed-program pathology on
camvid-bise18 (round-2: TPU worker crash at chunk=4; every stage passed in
isolation — and this round creff n=11 and phase1 n=11 pass standalone too);
(2) resize-variant costs for the C=3 frame downsize and the flow planes;
(3) creff th=30 (even 90/30 tiling) at the GOP level."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline
from arseg_tpu.ops import resize_bilinear
from arseg_tpu.ops.resize import _linear_matrix, _lerp_axis
from arseg_tpu.ops.warp import _resize_plane_bilinear

enable_compile_cache()

H, W = 720, 960
G = 12
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=8, rounds=5):
    try:
        for _ in range(2):
            _sync(fn(*args))
    except Exception as e:
        print(f"{name:36s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name:36s} {t*1e3:8.2f} ms", flush=True)
    return t


rng = np.random.RandomState(0)
which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "chunk"):
    hr_model = build_model("camvid-bise18", fuse=False)
    lr_model = build_model("camvid-bise18", fuse=True)
    hr_params = hr_model.init(jax.random.PRNGKey(0))
    lr_params = lr_model.init(jax.random.PRNGKey(1))
    keyframe = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    frames = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
    flows = (
        jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32)),
        jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32)),
    )
    for chunk in [1, 11, 4]:
        pipe = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT, lr_chunk=chunk)
        t = bench(f"ARPipeline chunk={chunk}", pipe, hr_params, lr_params,
                  keyframe, frames, flows)
        if t:
            print(f"   -> {G/t:.1f} fps", flush=True)

if which in ("all", "resize"):
    frames = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32)).astype(DT)
    fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))

    bench("frame resize mixed (prod)",
          jax.jit(lambda x: resize_bilinear(x, (360, 480), align_corners=True)),
          frames)

    def rsz_lerp_both(x):
        y = _lerp_axis(x, H, 360, True, 1)
        return _lerp_axis(y, W, 480, True, 2)

    bench("frame resize lerp both", jax.jit(rsz_lerp_both), frames)

    # planes-layout resize: host would ship [n, 3, H, W]
    frp = jnp.asarray(
        np.ascontiguousarray(np.moveaxis(np.asarray(frames, np.float32), 3, 1))
    ).astype(DT)

    def rsz_planes(x):
        y = _lerp_axis(x, H, 360, True, 2)  # H on axis 2
        mw = jnp.asarray(_linear_matrix(W, 480, True)).astype(x.dtype)
        return jnp.einsum("qw,nchw->nchq", mw, y)

    bench("frame resize planes [n,3,H,W]", jax.jit(rsz_planes), frp)

    def flow_rsz_prod(f):
        return _resize_plane_bilinear(f * jnp.float32(90 / 720), (90, 120), True)

    bench("flow resize prod (lerp/lerp)", jax.jit(flow_rsz_prod), fx)

    def flow_rsz_mat(f):
        y = _lerp_axis(f * jnp.float32(90 / 720), H, 90, True, 1)
        mw = jnp.asarray(_linear_matrix(W, 120, True))
        return jnp.einsum("qw,nhw->nhq", mw, y)

    bench("flow resize W-matmul", jax.jit(flow_rsz_mat), fx)

print("DONE", flush=True)
