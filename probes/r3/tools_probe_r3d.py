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
    todo = sys.argv[2].split(",") if len(sys.argv) > 2 else ["1", "unroll", "11", "4"]
    for chunk in todo:
        if chunk == "unroll":
            # python-unrolled frame loop: XLA can overlap the gather-bound
            # warp of frame i+1 with the MXU-bound convs of frame i (lax.map
            # serializes iterations); costs an 11x-body compile
            from arseg_tpu.ops.warp import _resize_plane_bilinear as _rpb
            from arseg_tpu.ops import warp_feature
            import jax.numpy as jnp

            lr_cast = jax.tree_util.tree_map(
                lambda x: x.astype(DT) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                lr_params)
            hr_cast = jax.tree_util.tree_map(
                lambda x: x.astype(DT) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                hr_params)

            @jax.jit
            def gop_unroll(hp, lp, key, frs, fxa, fya):
                hr_out = hr_model.apply(hp, key.astype(DT))
                key_logits, ref_feat = hr_out[0], hr_out[-1]
                fh, fw = ref_feat.shape[1:3]
                s = jnp.float32(fh / fxa.shape[-2])
                fxr = _rpb(fxa * s, (fh, fw), True)
                fyr = _rpb(fya * s, (fh, fw), True)
                x_lr = resize_bilinear(frs.astype(DT), (H // 2, W // 2),
                                       align_corners=True)
                preds = []
                for i in range(G - 1):
                    warped = warp_feature(ref_feat, (fxr[i:i+1], fyr[i:i+1]))
                    feat = lr_model.forward_phase1(lp, x_lr[i:i+1])[-1]
                    out, _ = lr_model.forward_phase2(lp, feat, warped)
                    preds.append(jnp.argmax(out, axis=-1).astype(jnp.int32))
                kp = jnp.argmax(resize_bilinear(key_logits, (H, W), align_corners=True),
                                axis=-1).astype(jnp.int32)
                return jnp.concatenate([kp] + preds, axis=0)

            t = bench("ARPipeline UNROLLED", gop_unroll, hr_cast, lr_cast,
                      keyframe, frames, flows[0], flows[1])
            if t:
                print(f"   -> {G/t:.1f} fps", flush=True)
            continue
        chunk = int(chunk)
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

    # planes-layout resize: host would ship [n, 3, H, W] (built from fresh
    # host randoms — pulling the device array back through the axon tunnel
    # crawls at a few MB/s and is what a production loader would never do)
    frp = jnp.asarray(
        np.ascontiguousarray(
            np.moveaxis(rng.randn(G - 1, H, W, 3).astype(np.float32), 3, 1)
        )
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
