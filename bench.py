"""Benchmark: AR-Seg headline configs on one TPU chip.

Measures the batched GOP pipeline (GOP 12, LR 0.5x, 720x960 CamVid — the
BASELINE.json protocol) in frames/sec/chip. vs_baseline is the speedup over
running the HR model on every frame on the same chip at the same dtype —
the efficiency claim AR-Seg makes (reference README.md:1-8; the repo
publishes accuracy artifacts only, BASELINE.md).

Primary metric: **camvid-bise18 AR-0.5x** (reference golden file
`evaluation-result/camvid-bise18-AR-0.5x-...txt`, avg mIoU 0.7037). Both
CamVid headline backbones are reported; bise18 is primary because it is the
config a TPU deployment would choose:

  * bise18 (like both cityscapes configs) fuses CReFF at 1/8 feature
    resolution — warp + attention touch 1/64 the pixels, and AR beats
    HR-everywhere by ~1.8x on v5e.
  * psp18-CamVid is the one config whose decoder upsamples BEFORE the fused
    feature (full-res 64-ch fusion). On v5e the per-pixel warp has a ~15 ms
    practical floor (gather-descriptor bound) and the 7x7 windowed attention
    an ~8 ms MXU floor (banded-matmul form at 40 TF/s), which exceeds the
    10 ms HR forward — AR at that config cannot win on this chip at any
    kernel quality (full design-space measurement: PERF.md round-2 notes).
    It is reported in `extra` for transparency, not hidden.

vs_baseline keeps the round-consistent semantics — AR GOP program vs HR
processing frames sequentially (the reference's own serving style:
`evaluation.py` runs batch-1 frame-by-frame, and a live 30 fps stream
cannot batch without trading latency). Round 5 moves BOTH sides to clip
timing (CLIP_GOPS sequential GOPs per host dispatch, per-GOP/per-frame
programs unchanged and bitwise-identical): the round-5 profile showed the
single-dispatch numbers charged ~3.5 ms/GOP of dev-tunnel RPC — 26% of
the AR program's 10.1 ms device time vs 18% of HR's — to the chip; a
production host dispatches over PCIe at ~10s of us. The old per-dispatch
numbers stay in `extra.dispatch_mode`. Because an *offline* HR baseline
can batch, `extra.batch_matched` also reports the arms-race-honest
pairings at equal frames-in-flight (GOP-12 vs batched-HR-12; 96-frame
multi-GOP AR vs 96-frame HR) — full curve and analysis in PERF.md
"batching arms race".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

GOP = 12
H, W = 720, 960
SCALE = 0.5
WARMUP = 2
ITERS = 8
DTYPE = "bfloat16"  # deployment inference dtype (both AR and HR baseline)
LR_CHUNK = 1

# Session-to-session tunnel throughput drifts up to ~20% (PERF.md); per-run
# samples and an adaptive round count defend the headline against one bad
# session. SAMPLES collects every timing round of every measurement for
# bench_logs/ persistence.
MIN_ROUNDS = 5
MAX_ROUNDS = 15
TARGET_REL_HW = 0.03  # stop when the median's ~90% CI half-width < 3%
SAMPLES = {}


def _sync(out):
    # On the axon remote platform block_until_ready does not reliably block;
    # a host transfer of one element of the result does (TPU programs run
    # serially, so syncing the last output syncs the whole run). Fetch ONE
    # element, not the array: dragging the [12,720,960] int32 class maps
    # through the dev-tunnel (~33 MB) charges tunnel bandwidth to the chip —
    # production serving moves results over PCIe, not an SSH tunnel.
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def _median_ci_halfwidth(times):
    """Distribution-free ~90% CI half-width of the median via order
    statistics: the (n/2 ± 0.82*sqrt(n))-th order statistics bracket the
    median at ~90% confidence (binomial argument, z=1.64, p=1/2)."""
    s = sorted(times)
    n = len(s)
    z = int(np.ceil(0.82 * np.sqrt(n)))
    lo = s[max(0, n // 2 - z)]
    hi = s[min(n - 1, n // 2 + z)]
    return (hi - lo) / 2.0


def _time(fn, *args, label=None, rounds=MIN_ROUNDS):
    """Median of adaptively-many timing rounds — the remote-TPU tunnel shows
    ~20% run-to-run throughput variance, so single-round numbers are
    unreliable. Rounds extend past `rounds` (up to MAX_ROUNDS) until the
    median's ~90% CI half-width drops below TARGET_REL_HW of the median, so
    a noisy session buys more samples instead of printing a noisy number.
    All samples are recorded in SAMPLES[label] for bench_logs/ persistence."""
    for _ in range(WARMUP):
        _sync(fn(*args))
    times = []
    while True:
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / ITERS)
        if len(times) < rounds:
            continue
        med = sorted(times)[len(times) // 2]
        if _median_ci_halfwidth(times) <= TARGET_REL_HW * med:
            break
        if len(times) >= MAX_ROUNDS:
            break
    if label is not None:
        SAMPLES[label] = [round(t, 6) for t in times]
    return sorted(times)[len(times) // 2]


def _spread(label, per_call):
    """min/median/max fps + round count for a recorded measurement.
    `per_call` = frames per program call (converts seconds to fps)."""
    ts = SAMPLES.get(label)
    if not ts:
        return {}
    return {
        "fps_min": round(per_call / max(ts), 2),
        "fps_median": round(per_call / sorted(ts)[len(ts) // 2], 2),
        "fps_max": round(per_call / min(ts), 2),
        "rounds": len(ts),
    }


def _session_speed():
    """Fixed-program session-health anchor: a 4096^3 bf16 matmul's TF/s on
    this chip is code-independent, so cross-session drift in the headline
    can be separated from code changes by comparing this number (healthy
    v5e sessions measure ~55 TF/s; see PERF.md hardware envelope)."""
    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    f = jax.jit(lambda x, y: x @ y)
    t = _time(f, a, b, label="session_matmul")
    return round(2 * n**3 / t / 1e12, 1)


# Clip length for serving-mode timing: K GOPs (K*GOP frames) per host
# dispatch for BOTH sides, sequential per-GOP/per-frame programs unchanged
# (ARPipeline.scan_step lax.maps the exact single-GOP program; the HR side
# lax.maps its per-frame program over K*GOP frames). This amortizes the
# dev-tunnel harness's ~3.5 ms/dispatch host RPC (round-5 profile: 10.1 ms
# device vs 13.6 ms wall per single-GOP dispatch) that a production host
# (PCIe, ~10s of us/dispatch) does not pay. Exactness: scan rows ==
# single-GOP program bitwise (tests/test_gop_pipeline.py + probe r5c).
CLIP_GOPS = 8


def bench_config(name):
    from arseg_tpu.models import build_model
    from arseg_tpu.gop import ARPipeline
    from arseg_tpu.ops import resize_bilinear

    hr_model = build_model(name, fuse=False)
    lr_model = build_model(name, fuse=True)
    hr_params = hr_model.init(jax.random.PRNGKey(0))
    lr_params = lr_model.init(jax.random.PRNGKey(1))

    dtype = jnp.dtype(DTYPE)
    rng = np.random.RandomState(0)
    # frames staged in the serving dtype (bf16): identical values to the
    # f32-staged + CAST_IN_RESIZE path (the cast is the first elementwise
    # op either way — bitwise, probe r5d agreement 1.0) without the
    # in-program convert+relayout chain (~0.37 ms/GOP, round-5 profile).
    # Production feeds raw uint8 + on-device normalize; this is the
    # already-normalized serving contract. Flows stay f32 (index math).
    keyframe = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32)).astype(dtype)
    frames = jnp.asarray(
        rng.randn(GOP - 1, H, W, 3).astype(np.float32)
    ).astype(dtype)
    # flows as (fx, fy) host-split planes — the serving layout (a packed
    # [..., 2] array costs a ~3.7 ms/frame lane relayout on device)
    flows_np = rng.uniform(-16, 16, (GOP - 1, H, W, 2)).astype(np.float32)
    flows = (
        jnp.asarray(np.ascontiguousarray(flows_np[..., 0])),
        jnp.asarray(np.ascontiguousarray(flows_np[..., 1])),
    )

    # serving keeps params RESIDENT in bf16 — pre-cast once outside the
    # timed loop for both sides (previously the AR side re-cast its param
    # tree on device every GOP while the HR baseline got pre-cast params)
    from arseg_tpu.utils.tree import cast_f32

    hr_params_t = cast_f32(hr_params, dtype)
    lr_params_t = cast_f32(lr_params, dtype)

    pipe = ARPipeline(hr_model, lr_model, scale=SCALE, dtype=dtype, lr_chunk=LR_CHUNK)
    ar_time_1 = _time(
        pipe, hr_params_t, lr_params_t, keyframe, frames, flows, label=f"{name}_ar"
    )

    # clip (serving) mode: CLIP_GOPS sequential GOPs per dispatch
    K = CLIP_GOPS
    scan = pipe.scan_step()
    kfs = jnp.asarray(rng.randn(K, H, W, 3).astype(np.float32)).astype(dtype)
    frs = jnp.asarray(
        rng.randn(K, GOP - 1, H, W, 3).astype(np.float32)
    ).astype(dtype)
    fxs = jnp.asarray(rng.uniform(-16, 16, (K, GOP - 1, H, W)).astype(np.float32))
    fys = jnp.asarray(rng.uniform(-16, 16, (K, GOP - 1, H, W)).astype(np.float32))
    ar_time = _time(scan, hr_params_t, lr_params_t, kfs, frs, fxs, fys,
                    label=f"{name}_ar_clip") / K
    del kfs, frs, fxs, fys
    ar_fps = GOP / ar_time

    # HR-on-every-frame baseline on the same chip at the same dtype and the
    # same frames-per-dispatch (lax.map chunk=1 keeps the reference's
    # frame-sequential serving semantics and bounds the full-res decoder
    # activations the same way the AR pipeline does)

    @jax.jit
    def hr_all(params, batch):
        def chunk(xs):
            out = hr_model.apply(params, xs.astype(dtype))[0]
            out = resize_bilinear(out, (H, W), align_corners=True)
            return jnp.argmax(out, axis=-1)

        return jax.lax.map(chunk, batch.reshape(-1, 1, H, W, 3))

    all_frames = jnp.concatenate([keyframe, frames], axis=0)
    hr_time_1 = _time(hr_all, hr_params_t, all_frames, label=f"{name}_hr")
    clip_frames = jnp.asarray(
        rng.randn(K * GOP, H, W, 3).astype(np.float32)
    ).astype(dtype)
    hr_time = _time(hr_all, hr_params_t, clip_frames,
                    label=f"{name}_hr_clip") / K
    del clip_frames
    hr_fps = GOP / hr_time
    return ar_fps, hr_fps, {
        "ar_fps_per_dispatch": round(GOP / ar_time_1, 2),
        "hr_fps_per_dispatch": round(GOP / hr_time_1, 2),
        "vs_baseline_per_dispatch": round(hr_time_1 / ar_time_1, 3),
    }


def bench_psp18_v2(hr_fps):
    """AR throughput of camvid-psp18 with fuse_version=2 — the recommended
    TPU serving config for the psp18 backbone (see main()). `hr_fps` is the
    plain psp18 HR-everyframe baseline already measured by bench_config
    (the V2-fused model's own HR forward measures within 2% of it,
    bench_logs/r4queue_benchv2.log, so it is not re-measured here)."""
    from arseg_tpu.models import build_model
    from arseg_tpu.gop import ARPipeline
    from arseg_tpu.utils.tree import cast_f32

    dtype = jnp.dtype(DTYPE)
    hr_model = build_model("camvid-psp18", fuse=True, fuse_version=2)
    lr_model = build_model("camvid-psp18", fuse=True, fuse_version=2)
    hr_params = cast_f32(hr_model.init(jax.random.PRNGKey(0)), dtype)
    lr_params = cast_f32(lr_model.init(jax.random.PRNGKey(1)), dtype)
    rng = np.random.RandomState(0)
    kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    fr = jnp.asarray(rng.randn(GOP - 1, H, W, 3).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-16, 16, (GOP - 1, H, W)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-16, 16, (GOP - 1, H, W)).astype(np.float32))
    pipe = ARPipeline(hr_model, lr_model, scale=SCALE, dtype=dtype)
    ar_fps = GOP / _time(pipe, hr_params, lr_params, kf, fr, (fx, fy),
                         label="psp18v2_ar")
    return {
        "ar_fps": round(ar_fps, 2),
        "vs_baseline": round(ar_fps / hr_fps, 3),
    }


def bench_scale_dial(hr_fps):
    """AR clip throughput at the reference's other released LR scales
    (CamVid checkpoints ship for 0.3x-0.9x; the accuracy side of the dial
    is the paper's own scale ablation). Same clip protocol as the primary;
    the HR denominator is scale-independent. Measured r5h: 0.3x clears 2x
    against the fully-optimized HR baseline (2.29), 0.5x = the headline,
    0.7x ~ parity."""
    from arseg_tpu.models import build_model
    from arseg_tpu.gop import ARPipeline
    from arseg_tpu.utils.tree import cast_f32

    dtype = jnp.dtype(DTYPE)
    hr_model = build_model("camvid-bise18", fuse=False)
    lr_model = build_model("camvid-bise18", fuse=True)
    hr_params = cast_f32(hr_model.init(jax.random.PRNGKey(0)), dtype)
    lr_params = cast_f32(lr_model.init(jax.random.PRNGKey(1)), dtype)
    rng = np.random.RandomState(0)
    K = CLIP_GOPS
    kfs = jnp.asarray(rng.randn(K, H, W, 3).astype(np.float32)).astype(dtype)
    frs = jnp.asarray(
        rng.randn(K, GOP - 1, H, W, 3).astype(np.float32)
    ).astype(dtype)
    fxs = jnp.asarray(rng.uniform(-16, 16, (K, GOP - 1, H, W)).astype(np.float32))
    fys = jnp.asarray(rng.uniform(-16, 16, (K, GOP - 1, H, W)).astype(np.float32))
    out = {}
    for s in (0.3, 0.7):
        pipe = ARPipeline(hr_model, lr_model, scale=s, dtype=dtype)
        scan = pipe.scan_step()
        fps = (K * GOP) / _time(scan, hr_params, lr_params, kfs, frs, fxs, fys,
                                label=f"ar_scale{s}")
        out[f"{s}x"] = {"ar_fps": round(fps, 2),
                        "vs_baseline": round(fps / hr_fps, 3)}
    return out


def bench_batch_matched():
    """Equal-frames-in-flight pairings for the headline config (PERF.md
    "batching arms race"): AR and HR each at their best program for 12 and
    96 frames in flight. An offline HR baseline may batch; these numbers
    keep the headline vs_baseline honest about that."""
    from arseg_tpu.models import build_model
    from arseg_tpu.gop import ARPipeline
    from arseg_tpu.ops import resize_bilinear

    hr_model = build_model("camvid-bise18", fuse=False)
    lr_model = build_model("camvid-bise18", fuse=True)
    dtype = jnp.dtype(DTYPE)
    from arseg_tpu.utils.tree import cast_f32

    hr_params = cast_f32(hr_model.init(jax.random.PRNGKey(0)), dtype)
    lr_params = cast_f32(lr_model.init(jax.random.PRNGKey(1)), dtype)
    rng = np.random.RandomState(0)
    out = {}

    # HR, whole GOP in one batched forward (12 frames in flight)
    frames12 = jnp.asarray(rng.randn(GOP, H, W, 3).astype(np.float32))

    @jax.jit
    def hr_gop(params, batch):
        def one(xs):
            o = hr_model.apply(params, xs.astype(dtype))[0]
            o = resize_bilinear(o, (H, W), align_corners=True)
            return jnp.argmax(o, axis=-1)

        return jax.lax.map(one, batch.reshape(-1, GOP, H, W, 3))

    out["hr_gop_batched_fps"] = round(
        GOP / _time(hr_gop, hr_params, frames12, label="hr_gop_batched"), 2
    )
    del frames12

    # AR multi-GOP at its measured plateau (B=8 -> 96 frames in flight)
    B = 8
    pipe = ARPipeline(hr_model, lr_model, scale=SCALE, dtype=dtype)
    kf = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    fr = jnp.asarray(rng.randn(B, GOP - 1, H, W, 3).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-16, 16, (B, GOP - 1, H, W)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-16, 16, (B, GOP - 1, H, W)).astype(np.float32))
    out["ar_multigop96_fps"] = round(
        B * GOP
        / _time(pipe, hr_params, lr_params, kf, fr, (fx, fy), label="ar_multigop96"),
        2,
    )
    del kf, fr, fx, fy

    # HR at the same 96 frames in flight
    frames96 = jnp.asarray(rng.randn(B * GOP, H, W, 3).astype(np.float32))

    @jax.jit
    def hr_flat(params, batch):
        o = hr_model.apply(params, batch.astype(dtype))[0]
        o = resize_bilinear(o, (H, W), align_corners=True)
        return jnp.argmax(o, axis=-1)

    out["hr_batch96_fps"] = round(
        B * GOP / _time(hr_flat, hr_params, frames96, label="hr_batch96"), 2
    )
    del frames96
    out["vs_hr_batch96"] = round(out["ar_multigop96_fps"] / out["hr_batch96_fps"], 3)
    return out


def main():
    # session-health anchor first: a code-independent matmul TF/s number
    # that separates tunnel/session drift from code changes across rounds
    try:
        session_tflops = _session_speed()
    except Exception:  # noqa: BLE001
        session_tflops = None
    # primary config first; the transparency arms must not be able to cost
    # us the headline number if the tunnel flakes mid-run
    bise_ar, bise_hr, bise_disp = bench_config("camvid-bise18")
    extra = {"bise18_hr_everyframe_fps": round(bise_hr, 2),
             # single-GOP-per-dispatch numbers (the round<=4 definition;
             # includes ~3.5 ms/dispatch of dev-tunnel RPC on this harness
             # that production serving doesn't pay — round-5 profile)
             "dispatch_mode": bise_disp,
             "clip_gops_per_dispatch": CLIP_GOPS}
    # The denominator is THIS framework's own HR implementation and it keeps
    # improving: round-4 layout fixes (slice-form s2d stem, resize gather
    # defaults) sped the per-frame HR program ~45% (311 -> ~450 fps), and the
    # s2d4 block-form stem (which the HR program hits 12x per GOP vs AR's
    # once) took it to ~604 — while the AR program, already layout-tuned,
    # went 652 (r3) -> ~880. A vs_baseline drop across rounds therefore does
    # NOT mean AR regressed; compare `value` (absolute AR fps) across
    # rounds, and see extra.hr_baseline_history + the hardware-independent
    # analytic FLOP ratio (2.70x for this config — the ceiling ANY
    # implementation pair can reach; tools_flops_analytic.py / PERF.md
    # "Cross-hardware statement" + round-4 s2d4 section).
    extra["hr_baseline_history_fps"] = {"r3": 307.4, "r4_measure": 311.4,
                                        "r4_post_layout_fixes": 453.2,
                                        "r4_post_s2d4_stem": 604.1}
    extra["analytic_flop_ratio"] = 2.70
    if session_tflops is not None:
        extra["session_matmul_tflops"] = session_tflops
    extra["bise18_ar_spread"] = _spread("camvid-bise18_ar_clip", CLIP_GOPS * GOP)
    try:
        psp_ar, psp_hr, psp_disp = bench_config("camvid-psp18")
        extra.update(
            psp18_ar_fps=round(psp_ar, 2),
            psp18_vs_baseline=round(psp_ar / psp_hr, 3),
            psp18_hr_everyframe_fps=round(psp_hr, 2),
            psp18_dispatch_mode=psp_disp,
        )
    except Exception as e:  # noqa: BLE001 — report, don't die
        extra["psp18_error"] = f"{type(e).__name__}: {e}"[:200]
    else:
        # The RECOMMENDED TPU serving config for the psp18 backbone:
        # fuse_version=2 (the reference's own 1/8-resolution fusion ablation,
        # reference model/pspnet.py:234-340). V1's full-res 64-ch fusion is
        # gather-floor-bound on TPU (PERF.md "psp18 floor claim"); V2 fuses
        # at [90,120,512], serves 2.2x faster than V1 AND measured MORE
        # accurate end-to-end on the synthetic FST protocol (PARITY.md §6).
        # Ratio uses the same plain-HR-everyframe denominator as V1.
        try:
            extra["psp18_fusev2"] = bench_psp18_v2(psp_hr)
        except Exception as e:  # noqa: BLE001
            extra["psp18_fusev2_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        extra["scale_dial"] = bench_scale_dial(bise_hr)
    except Exception as e:  # noqa: BLE001
        extra["scale_dial_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        batch_matched = bench_batch_matched()
        batch_matched["vs_hr_gop_batched"] = round(
            bise_ar / batch_matched["hr_gop_batched_fps"], 3
        )
        extra["batch_matched"] = batch_matched
    except Exception as e:  # noqa: BLE001
        extra["batch_matched_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        os.makedirs("bench_logs", exist_ok=True)
        path = os.path.join(
            "bench_logs", time.strftime("bench_samples_%Y%m%d_%H%M%S.json")
        )
        with open(path, "w") as f:
            json.dump(
                {"per_round_seconds": SAMPLES, "iters_per_round": ITERS}, f, indent=1
            )
        extra["samples_file"] = path
    except OSError:
        pass  # read-only checkout: the spread stats above still ship
    print(
        json.dumps(
            {
                "metric": "camvid-bise18 AR0.5x GOP12 720x960 throughput",
                "value": round(bise_ar, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(bise_ar / bise_hr, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
