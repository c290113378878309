"""r3p: kill the GOP-program downsize relayout (reshape.18, 0.74 ms/GOP).

The session-4 trace + r3o HLO map pins ~1 ms/GOP on the frames downsize
(resize_bilinear, [11,720,960,3] -> [360,480,3], align_corners=True): XLA
lays the merged [11,720,2880] H-gather operand out H-minor, paying a 45 MB
transpose copy (reshape.18 + copy.347) before a gather it then runs on the
lane dim.

Key structural fact: at 2:1 decimation the gather indices ARE a stride-2
slice.  align_corners=True 720->360 gives src(i) = i*719/359 in [2i, 2i+1]
for every i, so out[i] = x[2i]*(1-w') + x[2i+1]*w' with w' = src - 2i is
the reference lerp verbatim (bitwise: same two taps, same per-term
multiply-add; the tail row where floor(src)=2i+1 lands on w'=1.0 and
1.0*x + 0.0*y == x exactly).  Strided slices give XLA no license to
relayout.  Variants:

  A  resize_bilinear today (merged H-gather + W einsum)
  B  H strided-slice lerp (merged) + unmerged W einsum (bitwise == A)
  C  all-slice: H strided lerp (merged) + W lerp via [.,.,480,6] lane split
     (bitwise == A: identical per-element expression)
  D  block-matmul both axes on the merged dim (MXU; rounds once per output
     in bf16 -> 1-ulp interiors, tolerance-checked)

Then an in-situ GOP A/B with the winner patched into ops/resize.py
(USE_STRIDED_DOWNSIZE flag expected there before running stage 2).
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.ops.resize import resize_bilinear, _linear_gather, _linear_matrix

enable_compile_cache()

N, H, W, C = 11, 720, 960, 3
OH, OW = 360, 480
AC = True


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=20, rounds=5):
    for _ in range(2):
        _sync(fn(*args))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name:28s} {t*1e3:8.3f} ms", flush=True)
    return t


def _stride2_weights(in_size, out_size, align_corners, dtype):
    i0, i1, w = _linear_gather(in_size, out_size, align_corners)
    i = np.arange(out_size)
    src = i0 + w
    wp = src - 2 * i
    ok = (
        in_size >= 2 * out_size
        and np.all(wp >= 0.0)
        and np.all(wp <= 1.0)
        and np.all(i0 == np.clip(2 * i + np.floor(wp).astype(np.int64), 0, in_size - 1))
    )
    assert ok, "stride-2 pattern does not hold"
    return jnp.asarray(wp.astype(np.float32)).astype(dtype)


def variant_a(x):
    return resize_bilinear(x, (OH, OW), AC)


def variant_b(x):
    wh = _stride2_weights(H, OH, AC, x.dtype)[:, None]
    xm = x.reshape(N, H, W * C)
    a = jax.lax.slice_in_dim(xm, 0, 2 * OH, 2, axis=1)
    b = jax.lax.slice_in_dim(xm, 1, 2 * OH, 2, axis=1)
    y = a * (1 - wh) + b * wh
    y = y.reshape(N, OH, W, C)
    mw = jnp.asarray(_linear_matrix(W, OW, AC)).astype(x.dtype)
    return jnp.einsum("qw,nhwc->nhqc", mw, y)


def variant_c(x):
    wh = _stride2_weights(H, OH, AC, x.dtype)[:, None]
    xm = x.reshape(N, H, W * C)
    a = jax.lax.slice_in_dim(xm, 0, 2 * OH, 2, axis=1)
    b = jax.lax.slice_in_dim(xm, 1, 2 * OH, 2, axis=1)
    y = a * (1 - wh) + b * wh            # [N, OH, W*C]
    ww = _stride2_weights(W, OW, AC, x.dtype)[:, None]
    y4 = y.reshape(N, OH, OW, 2 * C)
    p = y4[..., :C]
    q = y4[..., C:]
    return p * (1 - ww) + q * ww


def variant_d(x):
    mh = jnp.asarray(_linear_matrix(H, OH, AC)).astype(x.dtype)
    mwc = np.zeros((OW * C, W * C), np.float32)
    mw = _linear_matrix(W, OW, AC)
    for cc in range(C):
        mwc[cc::C, cc::C] = mw
    mwc = jnp.asarray(mwc).astype(x.dtype)
    xm = x.reshape(N, H, W * C)
    y = jnp.einsum("ph,nhm->npm", mh, xm)
    z = jnp.einsum("qm,npm->npq", mwc, y)
    return z.reshape(N, OH, OW, C)


def main():
    rng = np.random.RandomState(0)
    x32 = rng.randn(N, H, W, C).astype(np.float32)

    for dt, tag in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        x = jnp.asarray(x32).astype(dt)
        fa = jax.jit(variant_a)
        fb = jax.jit(variant_b)
        fc = jax.jit(variant_c)
        fd = jax.jit(variant_d)
        oa = np.asarray(fa(x), np.float32)
        ob = np.asarray(fb(x), np.float32)
        oc = np.asarray(fc(x), np.float32)
        od = np.asarray(fd(x), np.float32)
        print(f"[{tag}] B bitwise=={np.array_equal(oa, ob)} "
              f"C bitwise=={np.array_equal(oa, oc)} "
              f"D maxdiff={np.abs(oa - od).max():.2e}", flush=True)
        bench(f"A resize_bilinear {tag}", fa, x)
        bench(f"B strideH+einsumW {tag}", fb, x)
        bench(f"C all-slice       {tag}", fc, x)
        bench(f"D block-matmul    {tag}", fd, x)

    # in-situ stage: only if ops/resize.py grew the flag
    import arseg_tpu.ops.resize as rsz
    if not hasattr(rsz, "USE_STRIDED_DOWNSIZE"):
        print("no USE_STRIDED_DOWNSIZE flag in ops/resize.py — standalone only")
        return
    from arseg_tpu.models import build_model
    from arseg_tpu.gop import ARPipeline
    from arseg_tpu.utils.tree import cast_f32

    G = 12
    hr_model = build_model("camvid-bise18", fuse=False)
    lr_model = build_model("camvid-bise18", fuse=True)
    hrp = cast_f32(hr_model.init(jax.random.PRNGKey(0)), jnp.bfloat16)
    lrp = cast_f32(lr_model.init(jax.random.PRNGKey(1)), jnp.bfloat16)
    kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))

    rsz.USE_STRIDED_DOWNSIZE = False
    pipe_off = ARPipeline(hr_model, lr_model, scale=0.5, dtype=jnp.bfloat16)
    t_off = bench_gop("strided=0", G, pipe_off, hrp, lrp, kf, fr, (fx, fy))
    out_off = np.asarray(pipe_off(hrp, lrp, kf, fr, (fx, fy)))

    rsz.USE_STRIDED_DOWNSIZE = True
    pipe_on = ARPipeline(hr_model, lr_model, scale=0.5, dtype=jnp.bfloat16)
    print("compiling flag-on GOP program (cold)...", flush=True)
    t_on = bench_gop("strided=1", G, pipe_on, hrp, lrp, kf, fr, (fx, fy))
    out_on = np.asarray(pipe_on(hrp, lrp, kf, fr, (fx, fy)))
    print(f"delta {1e3*(t_off-t_on):+.2f} ms/GOP; agreement "
          f"{(out_off == out_on).mean():.6f}", flush=True)


def bench_gop(name, G, fn, *args, iters=8, rounds=5):
    for _ in range(2):
        _sync(fn(*args))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name:14s} {t*1e3:8.2f} ms/GOP  ({G/t:7.1f} fps)", flush=True)
    return t


if __name__ == "__main__":
    main()
