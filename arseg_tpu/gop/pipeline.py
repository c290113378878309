"""GOP-structured AR inference pipeline — the framework's own "pipeline
parallelism" axis (SURVEY.md §5): one HR pass on the keyframe amortized over
the GOP's remaining frames.

TPU-first redesign of the reference's eval loop (`evaluation.py:154-215`,
which runs batch-1 frame-at-a-time): here the whole GOP is one jitted
program —

  1. HR branch on the keyframe (once),
  2. the keyframe feature is broadcast and MV-warped to all G-1 non-key
     frames in a single batched gather,
  3. the LR branch + CReFF fusion run BATCHED over the G-1 frames, so the
     backbone convs hit the MXU with batch G-1 instead of 1 and the fused
     Pallas CReFF kernel processes all frames in one launch.

Host-side decode/MV-read overlaps device compute through the prefetching
loader + JAX async dispatch: step N+1's inputs are being assembled while
step N runs.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.ops import resize_bilinear, warp_feature, scale_and_resize_flow
from arseg_tpu.ops.resize import resize_bilinear_s2d
from arseg_tpu.ops.warp import pad_for_warp, t4_table
from arseg_tpu.ops.warp import _resize_plane_bilinear

# Corner-packed warp table (ops/warp.t4_table): the GOP-invariant keyframe
# feature's four bilinear corners are packed once per GOP into a
# [H+1, W+1, 4C] table so each per-frame warp gathers ONE contiguous row
# per output pixel instead of a (2,2,C) two-row strided block. Same index
# and weight math — f32-bitwise-identical, 26x faster per gather for
# HBM-resident sources (probes/r4/tools_probe_r4l.py); production A/B in
# probes/r4/tools_probe_r4n.py decides the default.
WARP_T4 = False

# Trace-time unroll of the per-frame fuse loop in the p1_batched single-GOP
# step (11 iterations at GOP 12). OFF = lax.map (loop-carried; the compiler
# serializes frame i's CReFF behind frame i-1's). Flag for probe A/B —
# see probes/r4/tools_probe_r4c.py before changing the default.
FUSE_UNROLL = False

# Serving-dtype cast of the [G-1,H,W,3] frames folded into the LR resize
# (resize_bilinear_s2d out_dtype) instead of a standalone tree cast: the
# standalone cast materialized a convert + relayout copy (~0.24 ms/GOP,
# round-4 profile tree.py:17). Identical values — the cast is elementwise
# either side of the resize's reshape; bitwise-equal on TPU
# (probes/r4/tools_probe_r4g.py agreement=1.0 both runs). Default ON:
# measured -0.23/-0.27 ms/GOP across two sessions. (S2D_ONE_EINSUM in
# ops/resize.py wins similarly ALONE but the combination loses 0.06-0.19
# vs this flag alone — layout interference — so only this one defaults on.)
CAST_IN_RESIZE = True

# Emit the LR frames as the 4x4-unshuffled z4 layout straight from the
# resize (ops/resize.resize_bilinear_s2d4) when the serving s2d4 stems will
# consume it — skips the z12 intermediate + its second 2x2 unshuffle
# (~0.17 ms/GOP, round-5 profile). Flag for probe A/B (probes/r5).
LR_INPUT_Z4 = True


def _as_tuple(x):
    return x if isinstance(x, tuple) else (x,)


def _resize_flow_planes(flow_planes, feat_hw):
    """(fx, fy) [n, Hf, Wf] -> magnitude-rescaled planes at feat_hw
    (eval-path semantics: x feat_h/flow_h then bilinear align_corners=True,
    reference `evaluation.py:177-180`).

    The scalar magnitude rescale commutes past the (linear) resize and runs
    AFTER it, on the feat_hw-sized planes instead of the full-res ones
    (-0.42 ms/GOP, probes/r4/tools_probe_r4h.py `flow-after`). For the
    protocol's power-of-two scale chain (s = feat_h/flow_h = 1/8, 1/2, ...)
    the f32 multiply is exact either side, so this is bit-identical to the
    multiply-then-resize order (r4h agreement 1.000000); non-pow2 scales
    would differ at the 1-ulp level only."""
    fx, fy = flow_planes
    s = jnp.float32(feat_hw[0] / fx.shape[-2])
    fx = _resize_plane_bilinear(fx.astype(jnp.float32), feat_hw, True) * s
    fy = _resize_plane_bilinear(fy.astype(jnp.float32), feat_hw, True) * s
    return fx, fy


class ARPipeline:
    """Batched AR inference over one GOP.

    hr_model/lr_model: registry models (lr_model built with fuse=True).
    scale: LR branch resolution scale. Predictions are argmax class maps at
    full input resolution for all GOP frames (keyframe via the HR branch).
    """

    def __init__(self, hr_model, lr_model, scale=0.5, dtype=jnp.float32, lr_chunk=1,
                 p1_batched=None, normalize=None):
        self.hr_model = hr_model
        self.lr_model = lr_model
        self.scale = scale
        # normalize=(mean, std): accept RAW uint8 frames and normalize
        # on-device in f32 — bitwise-identical to the host transform
        # ((x/255 - mean) / std, data/transform.py:normalize; uint8->f32,
        # f32 div/sub are exact IEEE ops on both sides), 4x less H2D
        # traffic, and the host sheds ~0.7 s/GOP of numpy broadcasting at
        # 720x960 (tools_bench_feeder_host.py). f32 inputs pass through
        # untouched, so setting this never changes the traced program for
        # already-normalized feeds.
        if normalize is not None:
            mean, std = normalize
            normalize = (
                jnp.asarray(np.asarray(mean, np.float32)),
                jnp.asarray(np.asarray(std, np.float32)),
            )
        self.normalize = normalize
        # dtype=bfloat16 casts params + frames at the jit boundary: conv/
        # matmul paths run at the MXU's 4x bf16 rate (flow index math and
        # softmax stay f32 inside the ops; argmax output unaffected).
        self.dtype = dtype
        # CReFF runs at HR feature resolution; the halo-tiled k/v for the
        # fused kernel cost ~0.5 GB/frame fp32, so a fully-batched GOP would
        # exceed a v5e chip's 16 GB. lax.map over fixed chunks serializes
        # chunk execution, bounding live memory at chunk size. chunk=1 is
        # also the FASTEST (measured 47.4 / 41.3 / 36.7 fps at chunk 1/2/4,
        # 720x960 bf16): one frame is already 691K pixels of MXU work, so
        # batching adds memory pressure without utilization gains.
        # PATHOLOGY HISTORY (tools_retest_pathologies.py re-checks per
        # toolchain bump): on Mosaic/jax 0.9 round 2-3, lr_chunk>1 on
        # camvid-bise18 crashed the TPU worker in the FULL composed program
        # while every stage passed in isolation. On the round-4 toolchain it
        # PASSES (bench_logs/r4queue_pathology.log) — but chunk=1 remains the
        # measured-fastest serving config, so nothing routes through it.
        self.lr_chunk = lr_chunk
        # p1_batched: run the LR backbone (phase1) over ALL G-1 frames in one
        # batch BEFORE the per-frame warp/CReFF map. At batch 1 the LR
        # backbone's small-spatial convs (e.g. bise18's 12x15x512 stage at
        # 0.5x CamVid) starve the MXU; batching the GOP recovers the
        # utilization (measured -10 ms/GOP on camvid-bise18, tools_probe_r3f:
        # 26.0 -> 16.0 ms). The warp + CReFF + head stay per-frame inside
        # lax.map — batching THOSE crashed the round-3 toolchain
        # (tools_probe_r3b `batched-p1`/`batched-fuse`); on the round-4
        # toolchain batched fuse+head runs again but is perf-NEUTRAL
        # (probes/r4/tools_probe_r4f.py: -0.10 ms/GOP, agreement 1.0), and
        # per-frame CReFF also bounds the halo-tiled k/v memory exactly like
        # lr_chunk=1 did — so the per-frame map stays.
        # Default: batched phase 1 unless the caller explicitly selects the
        # legacy chunked path (lr_chunk>1) — the two are mutually exclusive
        # program structures, so an explicit conflicting pair is an error
        # rather than one silently winning.
        if p1_batched is None:
            p1_batched = lr_chunk <= 1
        if p1_batched and lr_chunk > 1:
            raise ValueError(
                f"p1_batched=True is incompatible with lr_chunk={lr_chunk} "
                "(batched phase 1 replaces the chunked per-frame path)"
            )
        self.p1_batched = p1_batched
        self._step = jax.jit(self._gop_step)

    def _cast(self, tree):
        from arseg_tpu.utils.tree import cast_f32

        return cast_f32(tree, self.dtype)

    def _maybe_normalize(self, x):
        """On-device normalize of RAW uint8 frames (see __init__); f32
        inputs are already normalized and pass through."""
        if self.normalize is None or x.dtype != jnp.uint8:
            return x
        mean, std = self.normalize
        return (x.astype(jnp.float32) / 255.0 - mean) / std

    def _lr_input(self, frames, out_hw):
        """Frames resized to the LR scale for phase 1. When the LR model's
        first convs are s2d stems (`lr_model.s2d_input`), the resize emits
        the 2x2 pixel-unshuffled layout directly (`resize_bilinear_s2d`:
        same interpolation rows per element; bit-identical on the MXU) —
        the [n, oh, ow, 3] tensor, its NHWC relayout, and the stems'
        unshuffle transposes (~0.7 ms/GOP on the camvid-bise18 LR batch,
        round-4 profile) never materialize."""
        oh, ow = int(out_hw[0]), int(out_hw[1])
        if (
            getattr(self.lr_model, "s2d_input", False)
            and oh % 2 == 0
            and ow % 2 == 0
            and frames.shape[-1] <= 4
            and oh * 2 <= frames.shape[-3]
        ):
            from arseg_tpu.nn import functional as Fn
            from arseg_tpu.nn.functional import S2DPacked, S2D4Packed
            from arseg_tpu.ops.resize import resize_bilinear_s2d4

            if (LR_INPUT_Z4 and Fn.stem_s2d4_enabled(None)
                    and oh % 4 == 0 and ow % 4 == 0):
                # serving s2d4 stems eat the z4 layout straight from the
                # resize — the z12 intermediate + its second unshuffle
                # (~0.17 ms/GOP, round-5 profile) never materialize
                return S2D4Packed(
                    resize_bilinear_s2d4(frames, (oh, ow), True,
                                         out_dtype=self.dtype)
                )
            return S2DPacked(
                resize_bilinear_s2d(frames, (oh, ow), True,
                                    out_dtype=self.dtype)
            )
        # fallback path: ensure the serving dtype here (no-op when the
        # caller already cast; CAST_IN_RESIZE callers pass raw f32)
        return resize_bilinear(self._cast(frames), (oh, ow),
                               align_corners=True)

    def _phase2_logits(self, lr_params, feat, warped):
        # log_softmax is monotonic: skip it ahead of argmax when supported
        try:
            return self.lr_model.forward_phase2(lr_params, feat, warped, log_probs=False)
        except TypeError:
            return self.lr_model.forward_phase2(lr_params, feat, warped)

    def _fuse_branch(self, lr_params, feat, flow_planes, ref_feat, out_hw,
                     ref_prepadded=False):
        """Warp + CReFF + head for a batch of frames whose phase-1 features
        are already computed. feat: [n, h1, w1, C]; flow_planes at the HR
        feature resolution. ref_prepadded: ref_feat is already in the
        warp-ready form — pad_for_warp's bordered feature, or (WARP_T4) the
        corner-packed t4_table — hoisted out of the caller's per-frame map
        (the pad/table is loop-invariant but XLA re-materializes it per
        frame)."""
        n = feat.shape[0]
        h, w = out_hw
        ref_rep = jnp.broadcast_to(ref_feat, (n,) + ref_feat.shape[1:])
        warped = warp_feature(ref_rep, flow_planes,
                              prepadded=ref_prepadded and not WARP_T4,
                              t4=ref_prepadded and WARP_T4)
        # shared dispatch predicate with the eval engine (models.phase2_argmax_head)
        from arseg_tpu.models import phase2_argmax_head

        head = phase2_argmax_head(self.lr_model, warped.shape[1:3], (h, w))
        if head is not None:
            return head(lr_params, feat, warped)
        out, _ = self._phase2_logits(lr_params, feat, warped)
        out = resize_bilinear(out, (h, w), align_corners=True)
        return jnp.argmax(out, axis=-1)

    def _lr_branch(self, lr_params, x, flow_planes, ref_feat, out_hw):
        """LR branch for a batch of frames: phase1 -> warp -> CReFF.

        x: frames ALREADY resized to the LR scale (hoisted out of the
        per-frame lax.map and batched — resizes are matmul-shaped, so one
        [G-1, ...] call beats G-1 single-frame calls);
        flow_planes: (fx, fy) [n, Hf, Wf] planes already magnitude-rescaled
        and resampled to the feature resolution (hoisted likewise)."""
        feat = _as_tuple(self.lr_model.forward_phase1(lr_params, x))[-1]
        return self._fuse_branch(lr_params, feat, flow_planes, ref_feat, out_hw)

    def _multi_gop_step(self, hr_params, lr_params, keyframes, frames, flows):
        """Throughput mode: B GOPs in one program. keyframes [B,H,W,3];
        frames [B,G-1,H,W,3]; flows (fx, fy) of [B,G-1,Hf,Wf]. Returns
        [B,G,H,W]. The HR keyframe branch and the LR phase 1 both run
        batched over ALL B GOPs (the HR forward gains ~1.5x at batch 12 vs
        frame-at-a-time, tools_probe_r3h); warp + CReFF stay per-frame."""
        b, g1, h, w, _ = frames.shape
        if isinstance(flows, tuple):
            fx, fy = flows
        else:  # packed [B,G-1,Hf,Wf,2] compat — same split as _gop_step
            fx, fy = flows[..., 0], flows[..., 1]
        keyframes = self._maybe_normalize(keyframes)
        frames = self._maybe_normalize(frames)
        hr_params, lr_params, keyframes = self._cast(
            (hr_params, lr_params, keyframes)
        )
        if not CAST_IN_RESIZE:
            frames = self._cast(frames)
        hr_out = _as_tuple(self.hr_model.apply(hr_params, keyframes))
        key_logits, ref_feat = hr_out[0], hr_out[-1]  # [B,...]

        fx = fx.reshape(b * g1, *fx.shape[2:])
        fy = fy.reshape(b * g1, *fy.shape[2:])
        fx, fy = _resize_flow_planes((fx, fy), ref_feat.shape[1:3])
        x_lr = self._lr_input(
            frames.reshape(b * g1, h, w, frames.shape[-1]),
            (int(h * self.scale), int(w * self.scale)),
        )
        feat = _as_tuple(self.lr_model.forward_phase1(lr_params, x_lr))[-1]
        # frame i's own keyframe, padded for the warp once (not per frame)
        ref_pre = t4_table(ref_feat) if WARP_T4 else pad_for_warp(ref_feat)
        ref_rep = jnp.repeat(ref_pre, g1, axis=0)

        preds = jax.lax.map(
            lambda args: self._fuse_branch(
                lr_params, args[0][None], (args[1][None], args[2][None]),
                args[3][None], (h, w), ref_prepadded=True,
            )[0],
            (feat, fx, fy, ref_rep),
        )
        preds = preds.reshape(b, g1, h, w)
        key_logits = resize_bilinear(key_logits, (h, w), align_corners=True)
        key_preds = jnp.argmax(key_logits, axis=-1)[:, None]
        return jnp.concatenate([key_preds, preds], axis=1).astype(jnp.int32)

    def _gop_step(self, hr_params, lr_params, keyframe, frames, flows):
        """keyframe [1,H,W,3]; frames [G-1,H,W,3];
        flows: (fx, fy) tuple of [G-1,Hf,Wf] planes (preferred — split on
        host), or a packed [G-1,Hf,Wf,2] array (compat).
        Multi-GOP throughput mode: keyframe [B,H,W,3] with frames
        [B,G-1,H,W,3] dispatches _multi_gop_step (returns [B,G,H,W])."""
        if frames.ndim == 5:
            return self._multi_gop_step(hr_params, lr_params, keyframe, frames, flows)
        g1, h, w, _ = frames.shape
        keyframe = self._maybe_normalize(keyframe)
        frames = self._maybe_normalize(frames)
        hr_params, lr_params, keyframe = self._cast(
            (hr_params, lr_params, keyframe)
        )
        if not (CAST_IN_RESIZE and self.p1_batched):
            frames = self._cast(frames)

        hr_out = _as_tuple(self.hr_model.apply(hr_params, keyframe))
        key_logits = hr_out[0]
        ref_feat = hr_out[-1]  # [1, h_f, w_f, C]

        if isinstance(flows, tuple):
            fx, fy = flows
        else:
            # split the [..., 2] flow array into per-axis planes ONCE per
            # GOP: C=2 on the 128-lane axis makes every op touching it ~64x
            # more expensive than necessary (measured 3.7 ms/frame at
            # 720x960 on v5e — callers should split in host numpy instead)
            fx, fy = flows[..., 0], flows[..., 1]

        # hoist the batched, matmul-shaped preprocessing out of the
        # per-frame map: one flow resample + one frame resize over all G-1
        # frames beats G-1 single-frame calls (lane/MXU utilization)
        fx, fy = _resize_flow_planes((fx, fy), ref_feat.shape[1:3])
        lr_hw = (int(h * self.scale), int(w * self.scale))

        if self.p1_batched:
            # LR backbone over the whole GOP in one batch (MXU utilization),
            # then warp + CReFF + head per frame (memory + compiler safety)
            x_lr = self._lr_input(frames, lr_hw)
            feat = _as_tuple(self.lr_model.forward_phase1(lr_params, x_lr))[-1]
            # (hoisting the CReFF lr->HR-grid upsample out of the map was
            # measured perf-neutral — 746.7 vs 748.7 fps, within noise — so
            # the per-frame fuse keeps its own upsample)
            # warp-ready keyframe form built once, not once per frame
            ref_pad = t4_table(ref_feat) if WARP_T4 else pad_for_warp(ref_feat)
            if FUSE_UNROLL:
                # trace-time unroll of the G-1 fuse iterations: retires the
                # while-loop bookkeeping and lets XLA overlap frame i+1's
                # warp gather with frame i's CReFF (the loop-carried form
                # serializes them); identical math per frame
                preds = jnp.concatenate([
                    self._fuse_branch(
                        lr_params, feat[i : i + 1],
                        (fx[i : i + 1], fy[i : i + 1]),
                        ref_pad, (h, w), ref_prepadded=True,
                    )
                    for i in range(g1)
                ], axis=0)
            else:
                preds = jax.lax.map(
                    lambda args: self._fuse_branch(
                        lr_params, args[0][None], (args[1][None], args[2][None]),
                        ref_pad, (h, w), ref_prepadded=True,
                    )[0],
                    (feat, fx, fy),
                )
        else:
            x_lr = resize_bilinear(frames, lr_hw, align_corners=True)
            c = min(self.lr_chunk, g1)
            pad = (-g1) % c
            x_p = jnp.pad(x_lr, ((0, pad), (0, 0), (0, 0), (0, 0)))
            fx_p = jnp.pad(fx, ((0, pad), (0, 0), (0, 0)))
            fy_p = jnp.pad(fy, ((0, pad), (0, 0), (0, 0)))
            x_c = x_p.reshape(-1, c, *x_lr.shape[1:])
            fx_c = fx_p.reshape(-1, c, *fx.shape[1:])
            fy_c = fy_p.reshape(-1, c, *fy.shape[1:])

            preds = jax.lax.map(
                lambda args: self._lr_branch(
                    lr_params, args[0], (args[1], args[2]), ref_feat, (h, w)
                ),
                (x_c, fx_c, fy_c),
            )
        preds = preds.reshape(-1, h, w)[:g1]

        key_logits = resize_bilinear(key_logits, (h, w), align_corners=True)
        preds = jnp.concatenate([jnp.argmax(key_logits, axis=-1), preds], axis=0)
        return preds.astype(jnp.int32)

    def __call__(self, hr_params, lr_params, keyframe, frames, flows):
        return self._step(hr_params, lr_params, keyframe, frames, flows)

    def sharded_step(self, mesh):
        """Multi-stream serving over a device mesh: S independent video
        streams sharded over the 1-D 'data' axis, each device running the
        full GOP program on its local streams (params replicated). The
        deployment scale-out axis — throughput multiplies by mesh size with
        no cross-device traffic (streams are independent; the same mesh
        composes with the eval engine's psum reduction when accuracy is
        tracked in-fleet).

        Returns a jitted fn(hr_params, lr_params, keyframes [S,H,W,3],
        frames [S,G-1,H,W,3], fx [S,G-1,Hf,Wf], fy likewise) -> preds
        [S,G,H,W]. S must be a multiple of the mesh size; place the stream
        inputs with parallel.shard_batch for multi-chip runs."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def local(hp, lp, kf, fr, fx, fy):
            def one(args):
                k, f, x, y = args
                return self._gop_step(hp, lp, k[None], f, (x, y))

            return jax.lax.map(one, (kf, fr, fx, fy))

        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data")),
            out_specs=P("data"),
        )
        return jax.jit(fn)

    def gop_parallel_step(self, mesh):
        """Latency scale-out for ONE stream: the GOP's non-key frames shard
        over the mesh's 1-D 'data' axis, each device running phase 1 +
        warp/CReFF/head on its local frames. Every device computes the
        (identical) HR keyframe branch on the replicated keyframe — that
        costs no more wall time than waiting for one device to compute and
        broadcast it, and keeps the program collective-free until the
        output gather. With 8 devices a camvid-bise18 GOP goes from 11
        fuse iterations to 2 per device: per-GOP latency ~ HR forward +
        ceil((G-1)/n) x per-frame fuse + the [G-1,H,W] int32 gather.

        Complements sharded_step (throughput: S independent streams, no
        cross-device traffic) — this one spends the same mesh on the
        latency of a single stream.

        Returns a jitted fn with ARPipeline.__call__'s single-GOP
        signature: (hr_params, lr_params, keyframe [1,H,W,3],
        frames [G-1,H,W,3], flows (fx, fy) [G-1,Hf,Wf]) -> preds [G,H,W].
        G-1 is zero-padded to a multiple of the mesh size internally; the
        pad frames' predictions are dropped."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n = mesh.devices.size

        def local(hp, lp, kf, fr, fx, fy):
            out = self._gop_step(hp, lp, kf, fr, (fx, fy))
            # the keyframe row is computed identically on every device from
            # the replicated keyframe, but the concat inside _gop_step makes
            # it device-varying to shard_map's replication checker — return
            # it sharded ([n,H,W] of identical copies) and slice one outside
            return out[:1], out[1:]

        sharded = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P("data"), P("data")),
            out_specs=(P("data"), P("data")),
        )

        def fn(hr_params, lr_params, keyframe, frames, flows):
            if isinstance(flows, tuple):
                fx, fy = flows
            else:
                fx, fy = flows[..., 0], flows[..., 1]
            g1 = frames.shape[0]
            pad = (-g1) % n
            frames_p = jnp.pad(frames, ((0, pad),) + ((0, 0),) * (frames.ndim - 1))
            fx_p = jnp.pad(fx, ((0, pad), (0, 0), (0, 0)))
            fy_p = jnp.pad(fy, ((0, pad), (0, 0), (0, 0)))
            key, fr_preds = sharded(
                hr_params, lr_params, keyframe, frames_p, fx_p, fy_p
            )
            return jnp.concatenate([key[:1], fr_preds[:g1]], axis=0).astype(jnp.int32)

        return jax.jit(fn)

    def scan_step(self):
        """Clip mode: K GOPs processed SEQUENTIALLY in one dispatch.

        Returns a jitted fn(hr_params, lr_params, keyframes [K,H,W,3],
        frames [K,G-1,H,W,3], fx [K,G-1,Hf,Wf], fy likewise) -> preds
        [K,G,H,W] int32 that lax.maps the single-GOP program over the K
        GOPs — the exact per-GOP program of __call__ (GOP i+1's compute
        starts after GOP i's, preserving single-stream latency semantics),
        but one host dispatch per clip instead of per GOP. On a
        local-host deployment dispatch overhead is negligible; through the
        dev-tunnel harness it measures ~3.5 ms per dispatch (round-5
        profile: device 10.1 ms vs 13.6 ms wall per GOP), so clip mode is
        how serving actually runs a stream. Contrast _multi_gop_step
        (keyframe [B,...] batched throughput mode: BATCHES the B GOPs into
        one wider program — faster still, but latency-trading)."""

        @jax.jit
        def fn(hr_params, lr_params, keyframes, frames, fx, fy):
            return jax.lax.map(
                lambda args: self._gop_step(
                    hr_params, lr_params, args[0][None], args[1],
                    (args[2], args[3]),
                ),
                (keyframes, frames, fx, fy),
            )

        return fn

    def streaming_step(self):
        """Frame-at-a-time variant (latency mode): returns jitted fns
        (key_step, frame_step) with the keyframe feature threaded as state,
        mirroring the reference's per-frame loop but keeping the feature
        cached in HBM across the GOP."""

        @jax.jit
        def key_step(hr_params, keyframe):
            keyframe = self._maybe_normalize(keyframe)
            out = _as_tuple(self.hr_model.apply(hr_params, keyframe))
            logits = resize_bilinear(out[0], keyframe.shape[1:3], align_corners=True)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), out[-1]

        @jax.jit
        def frame_step(lr_params, ref_feat, frame, flow):
            frame = self._maybe_normalize(frame)
            f = scale_and_resize_flow(flow, ref_feat.shape[1:3], mode="bilinear", split=True)
            h, w = frame.shape[1:3]
            x = self._lr_input(frame, (int(h * self.scale), int(w * self.scale)))
            feat = _as_tuple(self.lr_model.forward_phase1(lr_params, x))[-1]
            # same warp + fused phase-2 + argmax dispatch as the batched
            # path, so latency mode serves with the fast head (and stays
            # prediction-identical to it — tests/test_gop_pipeline.py)
            return self._fuse_branch(lr_params, feat, f, ref_feat, (h, w)).astype(
                jnp.int32
            )

        return key_step, frame_step
