"""GOP AR pipeline tests: batched pipeline vs the streaming per-frame path,
dtype modes, and chunking (reference semantics: `evaluation.py:154-215`
frame loop, here batched per SURVEY.md §7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline

H, W, G = 48, 64, 4


@pytest.fixture(scope="module")
def setup():
    hr = build_model("camvid-psp18", fuse=False)
    lr = build_model("camvid-psp18", fuse=True)
    hp = hr.init(jax.random.PRNGKey(0))
    lp = lr.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
    fl = jnp.asarray(rng.uniform(-4, 4, (G - 1, H, W, 2)).astype(np.float32))
    return hr, lr, hp, lp, kf, fr, fl


def test_batched_matches_streaming(setup):
    hr, lr, hp, lp, kf, fr, fl = setup
    pipe = ARPipeline(hr, lr, scale=0.5, lr_chunk=2)
    batched = np.asarray(pipe(hp, lp, kf, fr, fl))

    key_step, frame_step = pipe.streaming_step()
    key_pred, ref_feat = key_step(hp, kf)
    preds = [np.asarray(key_pred)]
    for i in range(G - 1):
        preds.append(np.asarray(frame_step(lp, ref_feat, fr[i : i + 1], fl[i : i + 1])))
    streaming = np.concatenate(preds, axis=0)
    np.testing.assert_array_equal(batched, streaming)


def test_chunk_sizes_agree(setup):
    hr, lr, hp, lp, kf, fr, fl = setup
    outs = [
        np.asarray(
            ARPipeline(hr, lr, scale=0.5, lr_chunk=c, p1_batched=False)(
                hp, lp, kf, fr, fl
            )
        )
        for c in (1, 2, 3)
    ]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_cast_in_resize_flag_agrees():
    """CAST_IN_RESIZE (frames cast folded into resize_bilinear_s2d) must
    reproduce the standalone-cast program exactly — the cast is elementwise
    either side of the resize's merge reshape. Uses bise18 (s2d stems, the
    flag's production target) in bf16 (the only dtype where a cast exists)."""
    from arseg_tpu.gop import pipeline as plmod
    from arseg_tpu.utils.tree import cast_f32

    hr = build_model("camvid-bise18", fuse=False)
    lr = build_model("camvid-bise18", fuse=True)
    hp = cast_f32(hr.init(jax.random.PRNGKey(0)), jnp.bfloat16)
    lp = cast_f32(lr.init(jax.random.PRNGKey(1)), jnp.bfloat16)
    rng = np.random.RandomState(3)
    kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
    fl = jnp.asarray(rng.uniform(-4, 4, (G - 1, H, W, 2)).astype(np.float32))
    saved = plmod.CAST_IN_RESIZE
    try:
        plmod.CAST_IN_RESIZE = False
        base = np.asarray(
            ARPipeline(hr, lr, scale=0.5, dtype=jnp.bfloat16)(hp, lp, kf, fr, fl)
        )
        plmod.CAST_IN_RESIZE = True
        folded = np.asarray(
            ARPipeline(hr, lr, scale=0.5, dtype=jnp.bfloat16)(hp, lp, kf, fr, fl)
        )
    finally:
        plmod.CAST_IN_RESIZE = saved
    np.testing.assert_array_equal(base, folded)


def test_multi_gop_matches_single(setup):
    """Throughput mode (B GOPs per program, HR keyframes + phase 1 batched
    across GOPs) must reproduce the single-GOP program exactly."""
    hr, lr, hp, lp, kf, fr, fl = setup
    B = 2
    rng = np.random.RandomState(4)
    kfs = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    frs = jnp.asarray(rng.randn(B, G - 1, H, W, 3).astype(np.float32))
    fxs = jnp.asarray(rng.uniform(-4, 4, (B, G - 1, H, W)).astype(np.float32))
    fys = jnp.asarray(rng.uniform(-4, 4, (B, G - 1, H, W)).astype(np.float32))
    pipe = ARPipeline(hr, lr, scale=0.5)
    multi = np.asarray(pipe(hp, lp, kfs, frs, (fxs, fys)))
    assert multi.shape == (B, G, H, W)
    for b in range(B):
        one = np.asarray(pipe(hp, lp, kfs[b : b + 1], frs[b], (fxs[b], fys[b])))
        np.testing.assert_array_equal(multi[b], one)
    # packed [B,G-1,Hf,Wf,2] flow compat splits to the same planes
    packed = np.asarray(pipe(hp, lp, kfs, frs, jnp.stack([fxs, fys], axis=-1)))
    np.testing.assert_array_equal(packed, multi)


def test_batched_fused_head_matches_per_frame(setup):
    """forward_phase2_argmax batched over n frames must equal n per-frame
    calls — the correctness precondition for ever flipping the multi-GOP
    fuse stage from lax.map to one batched call (tools_probe_r3m variant b;
    r3g measured batch-fuse safe to compile, only the batched WARP crashes)."""
    hr, lr, hp, lp, kf, fr, fl = setup
    from arseg_tpu.models import phase2_argmax_head

    n = 3
    # derive feat/warped shapes by running phase 1 once
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(n, H // 2, W // 2, 3).astype(np.float32))
    feat = lr.forward_phase1(lp, x)
    feat = feat[-1] if isinstance(feat, tuple) else feat
    warped = jnp.asarray(rng.randn(*feat.shape).astype(np.float32))
    head = phase2_argmax_head(lr, feat.shape[1:3],
                              (feat.shape[1] * getattr(lr, "phase2_argmax_upscale", 1),
                               feat.shape[2] * getattr(lr, "phase2_argmax_upscale", 1)))
    if head is None:
        import pytest

        pytest.skip("model has no fused argmax head at this geometry")
    batched = np.asarray(head(lp, feat, warped))
    for i in range(n):
        one = np.asarray(head(lp, feat[i : i + 1], warped[i : i + 1]))[0]
        np.testing.assert_array_equal(batched[i], one)


def test_sharded_streams_match_per_stream(setup):
    """Multi-stream serving: 4 streams sharded over a 4-device mesh produce
    exactly the per-stream pipeline outputs (streams are independent; the
    mesh is the deployment scale-out axis)."""
    from arseg_tpu.parallel import data_mesh, shard_batch, replicate

    hr, lr, hp, lp, kf, fr, fl = setup
    S = 4
    rng = np.random.RandomState(3)
    kfs = jnp.asarray(rng.randn(S, H, W, 3).astype(np.float32))
    frs = jnp.asarray(rng.randn(S, G - 1, H, W, 3).astype(np.float32))
    fxs = jnp.asarray(rng.uniform(-4, 4, (S, G - 1, H, W)).astype(np.float32))
    fys = jnp.asarray(rng.uniform(-4, 4, (S, G - 1, H, W)).astype(np.float32))

    pipe = ARPipeline(hr, lr, scale=0.5)
    mesh = data_mesh(4)
    step = pipe.sharded_step(mesh)
    hp_r, lp_r = replicate(hp, mesh), replicate(lp, mesh)
    batch = shard_batch({"kf": kfs, "fr": frs, "fx": fxs, "fy": fys}, mesh)
    out = np.asarray(step(hp_r, lp_r, batch["kf"], batch["fr"], batch["fx"], batch["fy"]))
    assert out.shape == (S, G, H, W)

    for s in range(S):
        ref = np.asarray(pipe(hp, lp, kfs[s : s + 1], frs[s], (fxs[s], fys[s])))
        np.testing.assert_array_equal(out[s], ref)


def test_streaming_matches_batched_bise18():
    """Latency mode serves through the same fused-argmax head as the batched
    pipeline (bise18 dispatches forward_phase2_argmax) — predictions must
    match the batched program exactly."""
    hr = build_model("camvid-bise18", fuse=False)
    lr = build_model("camvid-bise18", fuse=True)
    hp = hr.init(jax.random.PRNGKey(0))
    lp = lr.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(2)
    kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
    fl = jnp.asarray(rng.uniform(-4, 4, (G - 1, H, W, 2)).astype(np.float32))
    pipe = ARPipeline(hr, lr, scale=0.5)
    batched = np.asarray(pipe(hp, lp, kf, fr, fl))
    key_step, frame_step = pipe.streaming_step()
    key_pred, ref_feat = key_step(hp, kf)
    preds = [np.asarray(key_pred)]
    for i in range(G - 1):
        preds.append(np.asarray(frame_step(lp, ref_feat, fr[i : i + 1], fl[i : i + 1])))
    np.testing.assert_array_equal(batched, np.concatenate(preds, axis=0))


@pytest.mark.parametrize("name", ["camvid-psp18", "camvid-bise18"])
def test_p1_batched_matches_per_frame(name):
    """The GOP-batched phase-1 path (LR backbone over all frames at once,
    warp/CReFF mapped per frame) is the same math as the per-frame path —
    inference BN is batch-independent, so predictions must agree exactly."""
    hr = build_model(name, fuse=False)
    lr = build_model(name, fuse=True)
    hp = hr.init(jax.random.PRNGKey(0))
    lp = lr.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
    fl = jnp.asarray(rng.uniform(-4, 4, (G - 1, H, W, 2)).astype(np.float32))
    a = np.asarray(ARPipeline(hr, lr, scale=0.5, p1_batched=True)(hp, lp, kf, fr, fl))
    b = np.asarray(ARPipeline(hr, lr, scale=0.5, p1_batched=False)(hp, lp, kf, fr, fl))
    np.testing.assert_array_equal(a, b)


def test_bf16_mode_runs_and_mostly_agrees(setup):
    hr, lr, hp, lp, kf, fr, fl = setup
    f32 = np.asarray(ARPipeline(hr, lr, scale=0.5)(hp, lp, kf, fr, fl))
    b16 = np.asarray(
        ARPipeline(hr, lr, scale=0.5, dtype=jnp.bfloat16)(hp, lp, kf, fr, fl)
    )
    assert b16.shape == f32.shape and b16.dtype == np.int32
    # bf16 flips only a small fraction of argmax decisions on random weights
    assert np.mean(b16 == f32) > 0.9


def test_gop_parallel_matches_single_device():
    """gop_parallel_step (non-key frames sharded over the mesh, keyframe
    branch replicated) must reproduce the single-device GOP program's class
    maps exactly, including the non-divisible G-1 zero-pad path."""
    from arseg_tpu.parallel import data_mesh

    hr = build_model("camvid-psp18", fuse=False)
    lr = build_model("camvid-psp18", fuse=True)
    hrp = hr.init(jax.random.PRNGKey(0))
    lrp = lr.init(jax.random.PRNGKey(1))
    pipe = ARPipeline(hr, lr, scale=0.5)

    h, w, g1 = 48, 64, 6  # 6 frames over 4 devices -> pad to 8
    rng = np.random.RandomState(5)
    kf = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    fr = jnp.asarray(rng.randn(g1, h, w, 3).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-4, 4, (g1, h, w)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-4, 4, (g1, h, w)).astype(np.float32))

    want = np.asarray(pipe(hrp, lrp, kf, fr, (fx, fy)))
    mesh = data_mesh(4)
    pstep = pipe.gop_parallel_step(mesh)
    got = np.asarray(pstep(hrp, lrp, kf, fr, (fx, fy)))
    np.testing.assert_array_equal(got, want)


def test_streaming_step_device_normalize():
    """streaming_step honors ARPipeline(normalize=...): raw uint8 keyframe/
    frame feeds match the host-normalized f32 feeds exactly."""
    hr = build_model("camvid-psp18", fuse=False)
    lr = build_model("camvid-psp18", fuse=True)
    hrp = hr.init(jax.random.PRNGKey(0))
    lrp = lr.init(jax.random.PRNGKey(1))
    mean, std = (0.4, 0.45, 0.5), (0.3, 0.25, 0.2)
    pipe = ARPipeline(hr, lr, scale=0.5, normalize=(mean, std))
    key_step, frame_step = pipe.streaming_step()

    h, w = 48, 64
    rng = np.random.RandomState(9)
    kf_u8 = rng.randint(0, 255, (1, h, w, 3), np.uint8)
    fr_u8 = rng.randint(0, 255, (1, h, w, 3), np.uint8)
    fx = jnp.asarray(rng.uniform(-4, 4, (1, h, w)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-4, 4, (1, h, w)).astype(np.float32))
    norm = lambda x: (x.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)

    k_u, feat_u = key_step(hrp, jnp.asarray(kf_u8))
    k_f, feat_f = key_step(hrp, jnp.asarray(norm(kf_u8)))
    np.testing.assert_array_equal(np.asarray(k_u), np.asarray(k_f))
    p_u = frame_step(lrp, feat_u, jnp.asarray(fr_u8), (fx, fy))
    p_f = frame_step(lrp, feat_f, jnp.asarray(norm(fr_u8)), (fx, fy))
    np.testing.assert_array_equal(np.asarray(p_u), np.asarray(p_f))


def test_scan_step_matches_single(setup):
    """Clip mode (K GOPs sequential in one dispatch) must reproduce the
    single-GOP program exactly — it lax.maps the identical _gop_step."""
    hr, lr, hp, lp, kf, fr, fl = setup
    K = 2
    rng = np.random.RandomState(6)
    kfs = jnp.asarray(rng.randn(K, H, W, 3).astype(np.float32))
    frs = jnp.asarray(rng.randn(K, G - 1, H, W, 3).astype(np.float32))
    fxs = jnp.asarray(rng.uniform(-4, 4, (K, G - 1, H, W)).astype(np.float32))
    fys = jnp.asarray(rng.uniform(-4, 4, (K, G - 1, H, W)).astype(np.float32))
    pipe = ARPipeline(hr, lr, scale=0.5)
    clip = np.asarray(pipe.scan_step()(hp, lp, kfs, frs, fxs, fys))
    assert clip.shape == (K, G, H, W)
    for k in range(K):
        one = np.asarray(pipe(hp, lp, kfs[k : k + 1], frs[k], (fxs[k], fys[k])))
        np.testing.assert_array_equal(clip[k], one)
