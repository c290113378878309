"""r4h: fresh omission-delta budget of the production GOP program (~13.4 ms
after r4g's CAST_IN_RESIZE), by monkeypatching stages of the REAL ARPipeline
(no reimplementation drift — each arm re-jits the production _gop_step with
one stage substituted).

Also benches the HR-everyframe baseline in the same session: round-3's
budget put the AR program's HR keyframe branch at 3.14 ms while the baseline
pays ~2.15 ms/frame for the same forward+upsample+argmax — if that ~1 ms gap
is real on today's program it is an AR-only inefficiency (ratio-clean win).

Arms:
  prod        production pipeline
  no-warp     warp -> identity on the (prepadded) ref      (delta = warp)
  no-fusion   CReFF module -> ref passthrough              (delta = resize+kernel+residual)
  lrup-only   CReFF module -> lr_up only                   (prod - this = kernel+residual; this - no-fusion = lr-up resize wrap)
  no-hr       keyframe branch -> zeros                     (delta = HR branch)
  flow-after  MV scale applied at feature res, not full    (serving candidate)
  hr-base     bench.py's HR-everyframe program             (denominator anchor)

Usage: python probes/r4/tools_probe_r4h.py [comma-separated arm list]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline, pipeline as plmod
from arseg_tpu.nn import attention as attmod
from arseg_tpu.ops import resize_bilinear
from arseg_tpu.ops.warp import _resize_plane_bilinear
from arseg_tpu.utils.tree import cast_f32

enable_compile_cache()

H, W, G = 720, 960, 12
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=8, rounds=5):
    try:
        for _ in range(2):
            _sync(fn(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
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
    print(f"{name:12s} {t*1e3:8.2f} ms/GOP  ({G/t:7.1f} fps)", flush=True)
    return t


hr_model = build_model("camvid-bise18", fuse=False)
lr_model = build_model("camvid-bise18", fuse=True)
hrp = cast_f32(hr_model.init(jax.random.PRNGKey(0)), DT)
lrp = cast_f32(lr_model.init(jax.random.PRNGKey(1)), DT)
rng = np.random.RandomState(0)
kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))

SAVED = dict(
    warp=plmod.warp_feature,
    mod=attmod.creff_local_module_resize,
    flow=plmod._resize_flow_planes,
)


class _FakeHR:
    """hr_model stand-in: zeros of the real output shapes (trace-time)."""

    def __init__(self, real):
        self._real = real

    def apply(self, p, x):
        shapes = jax.eval_shape(self._real.apply, p, x)
        return tuple(jnp.zeros(s.shape, s.dtype) for s in shapes)

    def __getattr__(self, k):
        return getattr(self._real, k)


def _restore():
    plmod.warp_feature = SAVED["warp"]
    attmod.creff_local_module_resize = SAVED["mod"]
    plmod._resize_flow_planes = SAVED["flow"]


def make(arm):
    _restore()
    hr = hr_model
    if arm == "no-warp":
        plmod.warp_feature = (
            lambda ref, planes, prepadded=False:
            ref[:, 1:-1, 1:-1, :] if prepadded else ref
        )
    elif arm == "no-fusion":
        attmod.creff_local_module_resize = lambda lr, hr_, *a, **k: hr_
    elif arm == "lrup-only":
        attmod.creff_local_module_resize = (
            lambda lr, hr_, *a, **k:
            resize_bilinear(lr, hr_.shape[1:3], align_corners=True)
        )
    elif arm == "no-hr":
        hr = _FakeHR(hr_model)
    elif arm == "flow-after":
        def scale_after(flow_planes, feat_hw):
            fx_, fy_ = flow_planes
            s = jnp.float32(feat_hw[0] / fx_.shape[-2])
            fx_ = _resize_plane_bilinear(fx_.astype(jnp.float32), feat_hw, True) * s
            fy_ = _resize_plane_bilinear(fy_.astype(jnp.float32), feat_hw, True) * s
            return fx_, fy_
        plmod._resize_flow_planes = scale_after
    return ARPipeline(hr, lr_model, scale=0.5, dtype=DT)


arms = ["prod", "no-warp", "no-fusion", "lrup-only", "no-hr", "flow-after",
        "hr-base"]
if len(sys.argv) > 1:
    arms = sys.argv[1].split(",")
ts, outs = {}, {}
for arm in arms:
    if arm == "hr-base":
        @jax.jit
        def hr_all(params, batch):
            def chunk(xs):
                out = hr_model.apply(params, xs.astype(DT))[0]
                out = resize_bilinear(out, (H, W), align_corners=True)
                return jnp.argmax(out, axis=-1)
            return jax.lax.map(chunk, batch.reshape(-1, 1, H, W, 3))
        allf = jnp.concatenate([kf, fr], axis=0)
        ts[arm] = bench(arm, hr_all, hrp, allf)
        continue
    pipe = make(arm)
    ts[arm] = bench(arm, pipe, hrp, lrp, kf, fr, (fx, fy))
    if arm in ("prod", "flow-after") and ts[arm] is not None:
        outs[arm] = np.asarray(pipe(hrp, lrp, kf, fr, (fx, fy)))
_restore()

if ts.get("prod"):
    for arm, t in ts.items():
        if arm not in ("prod", "hr-base") and t:
            d = (ts["prod"] - t) * 1e3
            print(f"delta prod - {arm:12s} = {d:+7.2f} ms/GOP", flush=True)
    if ts.get("hr-base"):
        per_frame = ts["hr-base"] / G * 1e3
        print(f"hr baseline per-frame = {per_frame:.2f} ms "
              f"(AR HR-branch delta above should match if branch is fair)",
              flush=True)
    if "flow-after" in outs:
        a = float((outs["flow-after"] == outs["prod"]).mean())
        print(f"flow-after agreement vs prod: {a:.6f}", flush=True)
print("DONE", flush=True)
