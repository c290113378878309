"""BiSeNetV1 (+ CReFF-fused variant), NHWC functional.

Re-implements /root/reference `model/bisenet.py`:
  Resnet18/34 context backbone (`:70-158`, standard strides, returns
  feat8/16/32), AttentionRefinementModule (`:243-266`), ContextPath
  (`:269-323`, nearest x2 upsamples + one bilinear align_corners=True resize
  for odd sizes), SpatialPath (`:326-357`), FeatureFusionModule (`:360-416`),
  BiSeNetOutput (`:207-240`, bilinear align_corners=False x{8,16} upsample),
  UpSample pixel-shuffle block (`:189-204`, defined for API parity),
  BiSeNetV1 (`:419-479`) and BiSeNetV1WithFuse (`:481-596`, CReFF at the
  256-ch `conv_out.conv` output with phase1/phase2 split).

Param naming matches the torch state_dict (checkpoints store the shared
feat_conv_out/final_conv aliases under `conv_out.conv` / `conv_out.conv_out`).
"""

import jax
import jax.numpy as jnp

from arseg_tpu.nn import functional as Fn
from arseg_tpu.nn import init as Init
from arseg_tpu.nn.attention import get_fusion
from arseg_tpu.nn.resnet import make_resnet_config, init_resnet, resnet_apply
from arseg_tpu.ops import resize_bilinear, resize_nearest, pixel_shuffle

# Fully-fused Pallas inference head (CReFF + final_conv + x8 upsample +
# argmax in one kernel, ops/pallas_creff.creff_phase2_upsample_argmax).
# Compiles on the round-4 toolchain after the round-5 per-class 2-D rewrite
# (the round-3 rank-3 form was a Mosaic pathology) — but measured SLOWER
# than the XLA planes head in production: 14.27 vs 13.94 ms/GOP
# (probes/r5/tools_probe_r5b.py, argmax agreement 0.994). The 12 per-class
# [32,120]x[120,1024] + [240,32]x[32,1024] epilogue dots waste MXU rows
# that XLA's class-batched einsums fill. Default OFF on that measurement;
# the kernel stays compile-verified (tools_retest_pathologies.py).
USE_FUSED_UPSAMPLE_HEAD = False


def init_cbr(rng, cin, cout, ks=3):
    return {
        "conv": Init.conv_kaiming_normal_a1(rng, ks, ks, cin, cout, bias=False),
        "bn": Init.bn_default(cout),
    }


def apply_cbr(p, x, ctx, path, stride=1, padding=1):
    y = Fn.conv2d(p["conv"], x, stride=stride, padding=padding)
    return Fn.relu(Fn.batch_norm(p["bn"], y, ctx, path + ".bn"))


def init_arm(rng, cin, cout):
    return {
        "conv": init_cbr(rng, cin, cout),
        "conv_atten": Init.conv_kaiming_normal_a1(rng, 1, 1, cout, cout, bias=False),
        "bn_atten": Init.bn_default(cout),
    }


def apply_arm(p, x, ctx, path):
    feat = apply_cbr(p["conv"], x, ctx, path + ".conv")
    atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
    atten = Fn.conv2d(p["conv_atten"], atten)
    atten = Fn.batch_norm(p["bn_atten"], atten, ctx, path + ".bn_atten")
    return feat * Fn.sigmoid(atten)


def init_upsample_block(rng, n_chan, factor=2):
    """UpSample pixel-shuffle block (`model/bisenet.py:189-204`)."""
    return {
        "proj": Init.conv_xavier_normal(rng, 1, 1, n_chan, n_chan * factor * factor)
    }


def apply_upsample_block(p, x, factor=2):
    return pixel_shuffle(Fn.conv2d(p["proj"], x), factor)


class BiSeNetV1:
    # phase-1 input feeds ONLY the two 7x7/s2/p3 stems (context resnet conv1
    # + spatial conv1), so callers may pass a pre-unshuffled S2DPacked input
    # (resize fused with the stem s2d — gop/pipeline._lr_input)
    s2d_input = True

    def __init__(
        self,
        n_classes,
        backend="resnet18",
        aux_mode="train",
        with_fuse=False,
        attention_type="local",
        atten_k=7,
    ):
        depth = int(backend.replace("resnet", ""))
        self.cfg = make_resnet_config(depth, "bisenet")
        self.n_classes = n_classes
        self.aux_mode = aux_mode
        self.with_fuse = with_fuse
        self.middle_dim = 256
        self.attention_type = attention_type
        self.atten_k = atten_k
        if with_fuse:
            self.fuse_init, self.fuse_apply = get_fusion(attention_type, atten_k)

    def init(self, key):
        rng = Init.RngStream(key)
        n = self.n_classes
        p = {
            "cp": {
                "resnet": init_resnet(rng, self.cfg, 3, style="default"),
                "arm16": init_arm(rng, 256, 128),
                "arm32": init_arm(rng, 512, 128),
                "conv_head32": init_cbr(rng, 128, 128),
                "conv_head16": init_cbr(rng, 128, 128),
                "conv_avg": init_cbr(rng, 512, 128, ks=1),
            },
            "sp": {
                "conv1": init_cbr(rng, 3, 64, ks=7),
                "conv2": init_cbr(rng, 64, 64),
                "conv3": init_cbr(rng, 64, 64),
                "conv_out": init_cbr(rng, 64, 128, ks=1),
            },
            "ffm": {
                "convblk": init_cbr(rng, 256, 256, ks=1),
                "conv": Init.conv_kaiming_normal_a1(rng, 1, 1, 256, 256, bias=False),
                "bn": Init.bn_default(256),
            },
            "conv_out": {
                "conv": init_cbr(rng, 256, 256),
                "conv_out": Init.conv_kaiming_normal_a1(rng, 1, 1, 256, n, bias=True),
            },
        }
        if self.aux_mode == "train":
            p["conv_out16"] = {
                "conv": init_cbr(rng, 128, 64),
                "conv_out": Init.conv_kaiming_normal_a1(rng, 1, 1, 64, n, bias=True),
            }
            p["conv_out32"] = {
                "conv": init_cbr(rng, 128, 64),
                "conv_out": Init.conv_kaiming_normal_a1(rng, 1, 1, 64, n, bias=True),
            }
        if self.with_fuse:
            p["fuse_attention"] = self.fuse_init(rng, self.middle_dim)
        return p

    def _context_path(self, p, x, ctx):
        cp = p["cp"]
        feat8, feat16, feat32 = resnet_apply(
            cp["resnet"], x, self.cfg, ctx, "cp.resnet.", return_stages=True
        )
        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = apply_cbr(cp["conv_avg"], avg, ctx, "cp.conv_avg", padding=0)

        feat32_arm = apply_arm(cp["arm32"], feat32, ctx, "cp.arm32")
        feat32_sum = feat32_arm + avg
        feat32_up = resize_nearest(feat32_sum, (feat32_sum.shape[1] * 2, feat32_sum.shape[2] * 2))
        feat32_up = resize_bilinear(feat32_up, feat16.shape[1:3], align_corners=True)
        feat32_up = apply_cbr(cp["conv_head32"], feat32_up, ctx, "cp.conv_head32")

        feat16_arm = apply_arm(cp["arm16"], feat16, ctx, "cp.arm16")
        feat16_sum = feat16_arm + feat32_up
        feat16_up = resize_nearest(feat16_sum, (feat16_sum.shape[1] * 2, feat16_sum.shape[2] * 2))
        feat16_up = apply_cbr(cp["conv_head16"], feat16_up, ctx, "cp.conv_head16")
        return feat16_up, feat32_up  # x8, x16

    def _spatial_path(self, p, x, ctx):
        sp = p["sp"]
        if Fn.stem_s2d4_enabled(ctx) and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
            # serving path: block-form conv1, conv2 consumes the blocks
            # directly (functional.py STEM_S2D4_BLOCKS — same math, full-lane
            # MXU contraction; the logical conv1 output is never built)
            b = Fn.conv_stem_s2d4_blocks(sp["conv1"]["conv"], x)
            b = Fn.relu(Fn.batch_norm(Fn.tile_bn4(sp["conv1"]["bn"]), b, ctx,
                                      "sp.conv1.bn"))
            y = Fn.conv3x3s2_from_blocks(sp["conv2"]["conv"], b)
            y = Fn.relu(Fn.batch_norm(sp["conv2"]["bn"], y, ctx, "sp.conv2.bn"))
        else:
            y = apply_cbr(sp["conv1"], x, ctx, "sp.conv1", stride=2, padding=3)
            y = apply_cbr(sp["conv2"], y, ctx, "sp.conv2", stride=2)
        y = apply_cbr(sp["conv3"], y, ctx, "sp.conv3", stride=2)
        return apply_cbr(sp["conv_out"], y, ctx, "sp.conv_out", padding=0)

    def _ffm(self, p, fsp, fcp, ctx):
        ffm = p["ffm"]
        fcat = jnp.concatenate([fsp, fcp], axis=-1)
        feat = apply_cbr(ffm["convblk"], fcat, ctx, "ffm.convblk", padding=0)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = Fn.conv2d(ffm["conv"], atten)
        atten = Fn.batch_norm(ffm["bn"], atten, ctx, "ffm.bn")
        atten = Fn.sigmoid(atten)
        return feat * atten + feat

    def _output_head(self, p, x, up_factor, ctx, path):
        y = apply_cbr(p["conv"], x, ctx, path + ".conv")
        y = Fn.conv2d(p["conv_out"], y)
        return resize_bilinear(
            y, (y.shape[1] * up_factor, y.shape[2] * up_factor), align_corners=False
        )

    def _trunk(self, p, x, ctx):
        feat_cp8, feat_cp16 = self._context_path(p, x, ctx)
        feat_sp = self._spatial_path(p, x, ctx)
        feat_sp = resize_bilinear(feat_sp, feat_cp8.shape[1:3], align_corners=True)
        feat_fuse = self._ffm(p, feat_sp, feat_cp8, ctx)
        return feat_cp8, feat_cp16, feat_fuse

    def apply(self, p, x, ctx=None, mode="normal", ref_p=None):
        """train aux_mode: (out, out16, out32, feat_fuse); eval: (out,).
        mode='merge' uses the phase1/phase2 CReFF split."""
        ctx = ctx or Fn.Ctx()
        if mode == "merge":
            if self.aux_mode == "train":
                out16, out32, mid = self.forward_phase1(p, x, ctx)
            else:
                mid = self.forward_phase1(p, x, ctx)
            out, fused = self.forward_phase2(p, mid, ref_p, ctx)
            if self.aux_mode == "train":
                return out, out16, out32, fused
            return (out,)

        feat_cp8, feat_cp16, feat_fuse = self._trunk(p, x, ctx)
        feat_fuse = apply_cbr(p["conv_out"]["conv"], feat_fuse, ctx, "conv_out.conv")
        out = Fn.conv2d(p["conv_out"]["conv_out"], feat_fuse)
        out = resize_bilinear(out, (out.shape[1] * 8, out.shape[2] * 8), align_corners=False)
        if self.aux_mode == "train":
            out16 = self._output_head(p["conv_out16"], feat_cp8, 8, ctx, "conv_out16")
            out32 = self._output_head(p["conv_out32"], feat_cp16, 16, ctx, "conv_out32")
            return out, out16, out32, feat_fuse
        elif self.aux_mode == "eval":
            return (out,)
        elif self.aux_mode == "pred":
            return jnp.argmax(out, axis=-1)
        raise NotImplementedError(self.aux_mode)

    def forward_phase1(self, p, x, ctx=None):
        ctx = ctx or Fn.Ctx()
        feat_cp8, feat_cp16, feat_fuse = self._trunk(p, x, ctx)
        mid = apply_cbr(p["conv_out"]["conv"], feat_fuse, ctx, "conv_out.conv")
        if self.aux_mode == "train":
            out16 = self._output_head(p["conv_out16"], feat_cp8, 8, ctx, "conv_out16")
            out32 = self._output_head(p["conv_out32"], feat_cp16, 16, ctx, "conv_out32")
            return out16, out32, mid
        return mid

    def forward_phase2(self, p, mid, ref_p, ctx=None):
        fused = self.fuse_apply(p["fuse_attention"], ref_p, mid)
        out = Fn.conv2d(p["conv_out"]["conv_out"], fused)
        out = resize_bilinear(out, (out.shape[1] * 8, out.shape[2] * 8), align_corners=False)
        return out, fused

    # forward_phase2_argmax returns class maps at 8x the fused-feature
    # resolution (the BiSeNetOutput x8 upsample, `model/bisenet.py:546-575`);
    # dispatchers check `feat_hw * phase2_argmax_upscale == target_hw`
    phase2_argmax_upscale = 8

    def forward_phase2_argmax(self, p, mid, ref_p):
        """Inference fast path: argmax(x8_bilinear(final_conv(CReFF fusion))).

        The n_classes logit planes stay channel-major [n, n_cls, h, w] so the
        x8 align_corners=False upsample runs as two constant-matrix matmuls
        with full 128-lane utilization — the NHWC form pads n_cls=12 to 128
        lanes and drags a [8h, 8w, 128]-shaped tensor through every step.
        Math is identical to forward_phase2 + resize + argmax (each output
        logit is still exactly (1-w)*x0 + w*x1; f32 keeps HIGHEST matmul
        precision), so argmax agrees up to float-tie flips.

        A fully-fused Pallas variant
        (`ops/pallas_creff.creff_phase2_upsample_argmax`) folds this whole
        head INTO the CReFF kernel — neither the fused feature nor any
        logit plane touches HBM. Mosaic 0.9 rejected every rank-3 head form
        ("infer-vector-layout: unsupported shape cast"); the round-5
        rewrite (per-class lane-reduction final conv + 2-D upsample matmuls
        + unrolled argmax chain) lowers cleanly but measured slower than
        this XLA head in production (see USE_FUSED_UPSAMPLE_HEAD above —
        default OFF on that A/B; argmax agreement 0.994 on the production
        program, float-association flips at class boundaries)."""
        from arseg_tpu.ops.local_attention import _use_pallas
        from arseg_tpu.ops.resize import _linear_matrix

        if (
            USE_FUSED_UPSAMPLE_HEAD
            and _use_pallas()
            and self.attention_type == "local"
            and ref_p.shape[2] <= 128
        ):
            from arseg_tpu.ops.pallas_creff import creff_phase2_upsample_argmax

            fa = p["fuse_attention"]
            lr_up = resize_bilinear(mid, ref_p.shape[1:3], align_corners=True)
            return creff_phase2_upsample_argmax(
                lr_up, ref_p, fa["lr_query_conv"], fa["hr_key_conv"],
                fa["hr_value_conv"], p["conv_out"]["conv_out"],
                self.atten_k, self.atten_k, 8,
            )

        fused = self.fuse_apply(p["fuse_attention"], ref_p, mid)
        wfc = p["conv_out"]["conv_out"]["weight"][0, 0]
        bfc = p["conv_out"]["conv_out"]["bias"]
        prec = (
            jax.lax.Precision.HIGHEST if fused.dtype == jnp.float32 else None
        )
        lg = jnp.einsum(
            "nhwc,cm->nmhw", fused, wfc.astype(fused.dtype), precision=prec
        ) + bfc.astype(jnp.float32)[None, :, None, None].astype(fused.dtype)
        fh, fw = lg.shape[2], lg.shape[3]
        mh = jnp.asarray(_linear_matrix(fh, fh * 8, False)).astype(lg.dtype)
        mw = jnp.asarray(_linear_matrix(fw, fw * 8, False)).astype(lg.dtype)
        lg = jnp.einsum("Hh,nmhw->nmHw", mh, lg, precision=prec)
        lg = jnp.einsum("Ww,nmhw->nmhW", mw, lg, precision=prec)
        return jnp.argmax(lg, axis=1).astype(jnp.int32)
