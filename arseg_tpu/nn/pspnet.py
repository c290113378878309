"""PSPNet (CamVid flavor) + CReFF-fused variants, NHWC functional.

Re-implements /root/reference `model/pspnet.py`:
  PSPModule (`:14-31`): adaptive-avg pyramids (1,2,3,6) -> 1x1 conv (no bias)
    -> bilinear upsample (F.upsample default => align_corners=False) ->
    concat with input -> 1x1 bottleneck -> ReLU.
  PSPUpsample (`:34-46`): x2 bilinear (align_corners=False) -> 3x3 conv ->
    BN -> PReLU.
  PSPNet (`:49-100`): dilated backbone -> PSP -> drop(.3) -> up x3 (with
    drop(.15)) -> 64-ch feature p; heads: final 1x1 conv -> upsample to input
    HW (align_corners=True) -> LogSoftmax; classifier on global-max-pooled
    layer3 feature.
  PSPNetWithFuse (`:103-231`): + CReFF at p (middle_dim=64), with the
    phase1 (backbone->p) / phase2 (fuse->head) split.
  PSPNetWithFuseV2 (`:234-340`): CReFF at the 512-ch backbone feature before
    the PSP head (middle_dim=512).
  PSPNetWithFuseV3 (`:343-468`): CReFF at the 64-ch stem output (after
    maxpool); phase2 re-runs layers1-4 and the full head.
"""

import jax.numpy as jnp

from arseg_tpu.nn import functional as Fn
from arseg_tpu.nn import init as Init
from arseg_tpu.nn.attention import get_fusion
from arseg_tpu.nn.resnet import (
    make_resnet_config,
    init_resnet,
    resnet_apply,
    resnet_stem,
    resnet_layer,
)
from arseg_tpu.ops import resize_bilinear, adaptive_avg_pool, adaptive_max_pool_11


def init_psp_module(rng, features, out_features=1024, sizes=(1, 2, 3, 6)):
    return {
        "stages": {
            str(i): {"1": Init.conv_kaiming_uniform(rng, 1, 1, features, features, bias=False)}
            for i in range(len(sizes))
        },
        "bottleneck": Init.conv_kaiming_uniform(
            rng, 1, 1, features * (len(sizes) + 1), out_features, bias=True
        ),
    }


def apply_psp_module(p, x, sizes=(1, 2, 3, 6)):
    h, w = x.shape[1:3]
    priors = []
    for i, size in enumerate(sizes):
        y = adaptive_avg_pool(x, (size, size))
        y = Fn.conv2d(p["stages"][str(i)]["1"], y)
        priors.append(resize_bilinear(y, (h, w), align_corners=False))
    priors.append(x)
    out = Fn.conv2d(p["bottleneck"], jnp.concatenate(priors, axis=-1))
    return Fn.relu(out)


def init_psp_upsample(rng, cin, cout):
    return {
        "conv": {
            "0": Init.conv_kaiming_uniform(rng, 3, 3, cin, cout, bias=True),
            "1": Init.bn_default(cout),
            "2": Init.prelu_default(),
        }
    }


def apply_psp_upsample(p, x, ctx, path):
    h, w = 2 * x.shape[1], 2 * x.shape[2]
    y = resize_bilinear(x, (h, w), align_corners=False)
    y = Fn.conv2d(p["conv"]["0"], y, padding=1)
    y = Fn.batch_norm(p["conv"]["1"], y, ctx, path + ".conv.1")
    return Fn.prelu(p["conv"]["2"], y)


class PSPNet:
    """Functional PSPNet; `fuse_version` 0 = plain, 1/2/3 = WithFuse variants."""

    def __init__(
        self,
        n_classes=18,
        sizes=(1, 2, 3, 6),
        psp_size=2048,
        deep_features_size=1024,
        backend="resnet18",
        input_channel=3,
        attention_type="local",
        atten_k=7,
        fuse_version=0,
    ):
        self.backend = backend
        if backend.startswith("resnet"):
            depth = int(backend.replace("resnet", ""))
            self.cfg = make_resnet_config(depth, "arseg")
        else:
            self.cfg = None  # densenet / squeezenet (nn/extractors.py)
        # resnet backbones start at a 7x7/s2/p3 stem over the raw input, so
        # phase-1 accepts a pre-unshuffled S2DPacked input (resize fused with
        # the stem s2d — gop/pipeline._lr_input); extractor backbones differ
        self.s2d_input = self.cfg is not None and input_channel <= 4
        self.n_classes = n_classes
        self.sizes = sizes
        self.psp_size = psp_size
        self.deep_features_size = deep_features_size
        self.input_channel = input_channel
        self.fuse_version = fuse_version
        self.attention_type = attention_type
        self.atten_k = atten_k
        self.middle_dim = {0: None, 1: 64, 2: 512, 3: 64}[fuse_version]
        if fuse_version:
            self.fuse_init, self.fuse_apply = get_fusion(attention_type, atten_k)

    def init(self, key):
        rng = Init.RngStream(key)
        if self.cfg is not None:
            feats = init_resnet(rng, self.cfg, self.input_channel, style="msra")
        else:
            from arseg_tpu.nn.extractors import init_backbone

            feats = init_backbone(rng, self.backend, self.input_channel)
        p = {
            "feats": feats,
            "psp": init_psp_module(rng, self.psp_size, 1024, self.sizes),
            "up_1": init_psp_upsample(rng, 1024, 256),
            "up_2": init_psp_upsample(rng, 256, 64),
            "up_3": init_psp_upsample(rng, 64, 64),
            "final_conv": Init.conv_kaiming_uniform(rng, 1, 1, 64, self.n_classes),
            "classifier": {
                "0": Init.linear_default(rng, self.deep_features_size, 256),
                "2": Init.linear_default(rng, 256, self.n_classes),
            },
        }
        if self.fuse_version:
            p["fuse_attention"] = self.fuse_init(rng, self.middle_dim)
        return p

    # -- shared pieces ------------------------------------------------------

    def _backbone(self, p, x, ctx):
        if self.cfg is not None:
            return resnet_apply(p["feats"], x, self.cfg, ctx, "feats.")
        from arseg_tpu.nn.extractors import apply_backbone

        return apply_backbone(p["feats"], x, self.backend, ctx, "feats.")

    def _decoder(self, p, f, ctx):
        y = apply_psp_module(p["psp"], f, self.sizes)
        y = Fn.dropout2d(y, 0.3, ctx)
        for name in ("up_1", "up_2", "up_3"):
            y = apply_psp_upsample(p[name], y, ctx, name)
            y = Fn.dropout2d(y, 0.15, ctx)
        return y

    def _classifier(self, p, class_f):
        aux = adaptive_max_pool_11(class_f)
        aux = Fn.relu(Fn.linear(p["classifier"]["0"], aux))
        return Fn.linear(p["classifier"]["2"], aux)

    def _head(self, p, feat, out_hw, log_probs=True):
        out = Fn.conv2d(p["final_conv"], feat)
        out = resize_bilinear(out, out_hw, align_corners=True)
        # log_softmax is monotonic, so argmax consumers (inference) skip it
        return Fn.log_softmax(out, axis=-1) if log_probs else out

    # -- forward modes ------------------------------------------------------

    def apply(self, p, x, ctx=None, mode="normal", ref_p=None):
        """normal: (logits_logsoftmax, cls_logits, p_feat); merge: same with
        CReFF-fused feature (reference forward, `model/pspnet.py:164-196`)."""
        ctx = ctx or Fn.Ctx()
        if mode == "merge":
            if self.fuse_version == 1:
                out_cls, feat = self.forward_phase1(p, x, ctx)
                out, feat = self.forward_phase2(p, feat, ref_p, ctx)
                return out, out_cls, feat
            if self.fuse_version == 2:
                out_cls, f = self.forward_phase1(p, x, ctx)
                out, f = self.forward_phase2(p, f, ref_p, ctx)
                return out, out_cls, f
            if self.fuse_version == 3:
                (f,) = self.forward_phase1(p, x, ctx)
                return self.forward_phase2(p, f, ref_p, ctx)

        h, w = x.shape[1:3]
        f, class_f = self._backbone(p, x, ctx)
        feat = self._decoder(p, f, ctx)
        out = self._head(p, feat, (h, w))
        mid = {0: feat, 1: feat, 2: f, 3: None}[self.fuse_version]
        if self.fuse_version == 3:
            # V3 returns the stem output as the distillation feature
            mid = resnet_stem(p["feats"], x, ctx, "feats.")
        return out, self._classifier(p, class_f), mid

    def forward_phase1(self, p, x, ctx=None):
        ctx = ctx or Fn.Ctx()
        if self.fuse_version == 3:
            return (resnet_stem(p["feats"], x, ctx, "feats."),)
        f, class_f = self._backbone(p, x, ctx)
        if self.fuse_version == 2:
            return self._classifier(p, class_f), f
        feat = self._decoder(p, f, ctx)
        return self._classifier(p, class_f), feat

    def forward_phase2_argmax(self, p, feat, ref_p, ctx=None):
        """Inference fast path: int32 argmax class map at ref_p resolution.
        log_softmax is monotonic and the final logit upsample is the identity
        here (AR eval fuses at full feature resolution,
        `evaluation.py:193-207`), so on TPU the V1-local config collapses the
        whole phase-2 into one kernel (dwconv QKV + attention + residual +
        final_conv + argmax) with no intermediate HBM tensors."""
        from arseg_tpu.ops.local_attention import _use_pallas

        if (
            self.fuse_version == 1
            and self.attention_type == "local"
            and _use_pallas()
        ):
            from arseg_tpu.ops.pallas_creff import creff_phase2_argmax

            fa = p["fuse_attention"]
            lr_up = resize_bilinear(feat, ref_p.shape[1:3], align_corners=True)
            return creff_phase2_argmax(
                lr_up, ref_p, fa["lr_query_conv"], fa["hr_key_conv"],
                fa["hr_value_conv"], p["final_conv"], self.atten_k, self.atten_k,
            )
        out, _ = self.forward_phase2(p, feat, ref_p, ctx, log_probs=False)
        return jnp.argmax(out, axis=-1).astype(jnp.int32)

    def forward_phase2(self, p, feat, ref_p, ctx=None, log_probs=True):
        ctx = ctx or Fn.Ctx()
        out_hw = ref_p.shape[1:3]
        if self.fuse_version == 1:
            fused = self.fuse_apply(p["fuse_attention"], ref_p, feat)
            return self._head(p, fused, out_hw, log_probs), fused
        if self.fuse_version == 2:
            f = self.fuse_apply(p["fuse_attention"], ref_p, feat)
            y = self._decoder(p, f, ctx)
            return self._head(p, y, out_hw), f
        if self.fuse_version == 3:
            mid = self.fuse_apply(p["fuse_attention"], ref_p, feat)
            x = resnet_layer(p["feats"], mid, self.cfg, 0, ctx, "feats.")
            x = resnet_layer(p["feats"], x, self.cfg, 1, ctx, "feats.")
            class_f = resnet_layer(p["feats"], x, self.cfg, 2, ctx, "feats.")
            f = resnet_layer(p["feats"], class_f, self.cfg, 3, ctx, "feats.")
            y = self._decoder(p, f, ctx)
            return self._head(p, y, out_hw), self._classifier(p, class_f), mid
        raise ValueError("phase2 requires a fuse variant")
