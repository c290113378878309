"""AR vs HR-everywhere throughput for camvid-bise18 (fusion at 1/8 res) and
cityscapes configs — the reference headline configs where CReFF+warp live at
feature resolution h/8 x w/8 (warp+attention ~1/64 the pixels of the
camvid-psp18 full-res-fusion case)."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline
from arseg_tpu.ops import resize_bilinear

enable_compile_cache()


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def _time(fn, *args, iters=6, rounds=5, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[len(ts) // 2]


def run(name, H, W, gop=12, scale=0.5):
    rng = np.random.RandomState(0)
    hr_model = build_model(name, fuse=False)
    lr_model = build_model(name, fuse=True)
    hr_params = hr_model.init(jax.random.PRNGKey(0))
    lr_params = lr_model.init(jax.random.PRNGKey(1))
    keyframe = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    frames = jnp.asarray(rng.randn(gop - 1, H, W, 3).astype(np.float32))
    flows_np = rng.uniform(-16, 16, (gop - 1, H, W, 2)).astype(np.float32)
    flows = (
        jnp.asarray(np.ascontiguousarray(flows_np[..., 0])),
        jnp.asarray(np.ascontiguousarray(flows_np[..., 1])),
    )
    dtype = jnp.bfloat16
    pipe = ARPipeline(hr_model, lr_model, scale=scale, dtype=dtype, lr_chunk=1)
    t_ar = _time(pipe, hr_params, lr_params, keyframe, frames, flows)
    ar_fps = gop / t_ar

    hr_params_t = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, hr_params
    )

    @jax.jit
    def hr_all(params, batch):
        def chunk(xs):
            out = hr_model.apply(params, xs.astype(dtype))[0]
            out = resize_bilinear(out, (H, W), align_corners=True)
            return jnp.argmax(out, axis=-1)

        return jax.lax.map(chunk, batch.reshape(-1, 1, H, W, 3))

    all_frames = jnp.concatenate([keyframe, frames], axis=0)
    t_hr = _time(hr_all, hr_params_t, all_frames)
    hr_fps = gop / t_hr
    print(f"{name} {H}x{W}: AR {ar_fps:.1f} fps/chip, HR-every-frame "
          f"{hr_fps:.1f} fps/chip, vs_baseline {ar_fps / hr_fps:.3f}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "camvid-bise18"
    if which == "camvid-bise18":
        run("camvid-bise18", 720, 960)
    elif which == "cityscapes-bise18":
        run("cityscapes-bise18", 1024, 2048)
    elif which == "cityscapes-psp18":
        run("cityscapes-psp18", 1024, 2048)
    print("DONE", flush=True)
