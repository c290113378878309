"""PSPNet (Cityscapes / hszhao-semseg flavor) + CReFF variant, NHWC functional.

Re-implements /root/reference `model/pspnet_semseg.py`:
  PPM (`:12-30`): adaptive-avg pyramids -> 1x1 conv (no bias) -> BN -> ReLU ->
    bilinear upsample align_corners=True -> concat [x, p1..p4].
  PSPNet (`:33-116`): layer0 (stem) + layers1-4 of the dilated resnet with
    the semseg dilation surgery (`:59-68`), PPM, cls head
    (3x3 conv no-bias -> BN -> ReLU -> Dropout(.1) -> 1x1 conv), aux head on
    layer3; outputs upsampled to input HW align_corners=True. No LogSoftmax.
  PSPNetWithFuse (`:118-250`): CReFF at the 512-ch cls[:-1] feature;
    phase2 = fuse -> final 1x1 conv, NO upsample (`:237-250`); the aux head
    runs in both modes (`:212-219`).
"""

from arseg_tpu.nn import functional as Fn
from arseg_tpu.nn import init as Init
from arseg_tpu.nn.attention import get_fusion
from arseg_tpu.nn.resnet import make_resnet_config, init_resnet, resnet_stem, resnet_layer
from arseg_tpu.ops import resize_bilinear, adaptive_avg_pool

import jax.numpy as jnp


def init_ppm(rng, in_dim, reduction_dim, bins):
    return {
        "features": {
            str(i): {
                "1": Init.conv_kaiming_uniform(rng, 1, 1, in_dim, reduction_dim, bias=False),
                "2": Init.bn_default(reduction_dim),
            }
            for i in range(len(bins))
        }
    }


def apply_ppm(p, x, bins, ctx, path="ppm"):
    h, w = x.shape[1:3]
    out = [x]
    for i, b in enumerate(bins):
        y = adaptive_avg_pool(x, (b, b))
        y = Fn.conv2d(p["features"][str(i)]["1"], y)
        y = Fn.relu(Fn.batch_norm(p["features"][str(i)]["2"], y, ctx, f"{path}.features.{i}.2"))
        out.append(resize_bilinear(y, (h, w), align_corners=True))
    return jnp.concatenate(out, axis=-1)


class PSPNetSemseg:
    """Functional semseg-PSPNet; with_fuse=True adds the CReFF module."""

    def __init__(
        self,
        layers=50,
        bins=(1, 2, 3, 6),
        dropout=0.1,
        classes=2,
        zoom_factor=8,
        feat_dim=2048,
        with_fuse=False,
        attention_type="local",
        atten_k=7,
    ):
        assert layers in (18, 50, 101, 152)
        self.cfg = make_resnet_config(layers, "semseg")
        self.bins = bins
        self.dropout = dropout
        self.classes = classes
        self.zoom_factor = zoom_factor
        self.feat_dim = feat_dim
        self.with_fuse = with_fuse
        self.middle_dim = 512
        if with_fuse:
            self.fuse_init, self.fuse_apply = get_fusion(attention_type, atten_k)

    def init(self, key):
        rng = Init.RngStream(key)
        fea_dim = self.feat_dim * 2
        p = {
            "backbone": init_resnet(rng, self.cfg, 3, style="msra"),
            "ppm": init_ppm(rng, self.feat_dim, self.feat_dim // len(self.bins), self.bins),
            "cls": {
                "0": Init.conv_kaiming_uniform(rng, 3, 3, fea_dim, 512, bias=False),
                "1": Init.bn_default(512),
                "4": Init.conv_kaiming_uniform(rng, 1, 1, 512, self.classes),
            },
            "aux": {
                "0": Init.conv_kaiming_uniform(rng, 3, 3, self.feat_dim // 2, 256, bias=False),
                "1": Init.bn_default(256),
                "4": Init.conv_kaiming_uniform(rng, 1, 1, 256, self.classes),
            },
        }
        if self.with_fuse:
            p["fuse_attention"] = self.fuse_init(rng, self.middle_dim)
        return p

    def _trunk(self, p, x, ctx):
        y = resnet_stem(p["backbone"], x, ctx, "backbone.")
        y = resnet_layer(p["backbone"], y, self.cfg, 0, ctx, "backbone.")
        y = resnet_layer(p["backbone"], y, self.cfg, 1, ctx, "backbone.")
        x_tmp = resnet_layer(p["backbone"], y, self.cfg, 2, ctx, "backbone.")
        y = resnet_layer(p["backbone"], x_tmp, self.cfg, 3, ctx, "backbone.")
        return x_tmp, y

    def _cls_feature(self, p, x, ctx):
        """cls[:-1]: 3x3 conv -> BN -> ReLU -> Dropout -> 512-ch feature p."""
        y = Fn.conv2d(p["cls"]["0"], x, padding=1)
        y = Fn.relu(Fn.batch_norm(p["cls"]["1"], y, ctx, "cls.1"))
        return Fn.dropout2d(y, self.dropout, ctx)

    def _aux_head(self, p, x_tmp, out_hw, ctx):
        a = Fn.conv2d(p["aux"]["0"], x_tmp, padding=1)
        a = Fn.relu(Fn.batch_norm(p["aux"]["1"], a, ctx, "aux.1"))
        a = Fn.dropout2d(a, self.dropout, ctx)
        a = Fn.conv2d(p["aux"]["4"], a)
        if self.zoom_factor != 1:
            a = resize_bilinear(a, out_hw, align_corners=True)
        return a

    def apply(self, p, x, ctx=None, mode="normal", ref_p=None):
        """Plain model: (logits, aux). WithFuse: (logits, aux, p_feat) in both
        modes, matching `model/pspnet_semseg.py:90-116,184-221`."""
        ctx = ctx or Fn.Ctx()
        h, w = x.shape[1:3]
        if mode == "normal":
            x_tmp, y = self._trunk(p, x, ctx)
            y = apply_ppm(p["ppm"], y, self.bins, ctx)
            feat = self._cls_feature(p, y, ctx)
            out = Fn.conv2d(p["cls"]["4"], feat)
            if self.zoom_factor != 1:
                out = resize_bilinear(out, (h, w), align_corners=True)
        else:
            x_tmp, feat = self.forward_phase1(p, x, ctx)
            out, feat = self.forward_phase2(p, feat, ref_p, ctx)
        if not self.with_fuse:
            return out, self._aux_head(p, x_tmp, (h, w), ctx)
        return out, self._aux_head(p, x_tmp, (h, w), ctx), feat

    def forward_phase1(self, p, x, ctx=None):
        ctx = ctx or Fn.Ctx()
        x_tmp, y = self._trunk(p, x, ctx)
        y = apply_ppm(p["ppm"], y, self.bins, ctx)
        return x_tmp, self._cls_feature(p, y, ctx)

    def forward_phase2(self, p, feat, ref_p, ctx=None):
        fused = self.fuse_apply(p["fuse_attention"], ref_p, feat)
        out = Fn.conv2d(p["cls"]["4"], fused)  # final_conv = cls[-1]; no upsample
        return out, fused
