"""Per-frame serving latency (streaming mode) for both CamVid configs."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline
enable_compile_cache()
rng = np.random.RandomState(0)
def _sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    return np.asarray(leaf[(0,)*leaf.ndim])
H, W = 720, 960
for name in ["camvid-bise18", "camvid-psp18"]:
    hr = build_model(name, fuse=False)
    lr = build_model(name, fuse=True)
    hrp = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, hr.init(jax.random.PRNGKey(0)))
    lrp = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, lr.init(jax.random.PRNGKey(1)))
    pipe = ARPipeline(hr, lr, scale=0.5, dtype=jnp.bfloat16)
    key_step, frame_step = pipe.streaming_step()
    kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32)).astype(jnp.bfloat16)
    fr = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32)).astype(jnp.bfloat16)
    fl = jnp.asarray(rng.uniform(-8, 8, (1, H, W, 2)).astype(np.float32))
    pred0, feat = key_step(hrp, kf)
    _sync(pred0)
    _sync(frame_step(lrp, feat, fr, fl))
    def med(f, *a, iters=10, rounds=5):
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters): out = f(*a)
            _sync(out)
            ts.append((time.perf_counter()-t0)/iters)
        return sorted(ts)[2]*1000
    tk = med(lambda: key_step(hrp, kf))
    tf = med(lambda: frame_step(lrp, feat, fr, fl))
    print(f"{name}: keyframe {tk:.2f} ms, non-key frame {tf:.2f} ms "
          f"(streaming latency, bf16)", flush=True)
print("DONE", flush=True)
