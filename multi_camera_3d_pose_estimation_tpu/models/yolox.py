"""YOLOX person detector — CSPDarknet + PAFPN + decoupled head, NHWC.

From-scratch TPU-native equivalent of the reference's named
`yolox-tiny` detector checkpoint (examples/model_paths.yaml:1-7, loaded
through MMDetection at mmpose_pose_estimation.py:236-250).  Completes the
checkpoint-import story for every model class the reference names: pose
families (HRNet/Swin/RTMPose) already convert via `models/convert.py`;
this adds the detector family (`load_torch_yolox`).

Architecture follows the public YOLOX paper (Ge et al. 2021) and the
MMDetection implementation precisely — Focus stem (space-to-depth ×2 +
3×3 conv), CSPDarknet P5 stages with DarknetBottleneck CSP layers and an
SPP bottleneck in stage 4, a YOLOX PAFPN neck, and the decoupled
anchor-free head (2 stacked ConvModules per branch, cls/reg/obj 1×1
outputs per stride-8/16/32 level).  Submodules carry explicit names
mirroring the torch state-dict hierarchy so conversion is name-based.

The forward returns a FLAT anchor-free candidate set
(``boxes_all`` (B, N, 4) xyxy input pixels, ``scores_all`` (B, N) person
probabilities = sigmoid(obj)·sigmoid(cls_person)) — the same decode the
MMDet head performs (YOLOXHead._bbox_decode) fused into the jitted
program, consumed by `models.detector.decode_top1`/`decode_topk` exactly
like the CenterNet maps.  NHWC, bfloat16 activations, float32 params,
static shapes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .rtmpose import ConvModule, SPPBottleneck

__all__ = ["YOLOX", "YOLOX_TINY"]

# widen_factor / deepen_factor per YOLOX flavor (mmdet configs).
YOLOX_TINY = {"widen": 0.375, "deepen": 0.33, "num_classes": 80}
YOLOX_S = {"widen": 0.5, "deepen": 0.33, "num_classes": 80}

# CSPDarknet P5 arch: (out_channels, num_blocks, add_identity, use_spp)
_DARKNET_P5 = ((128, 3, True, False), (256, 9, True, False),
               (512, 9, True, False), (1024, 3, False, True))


class DarknetBottleneck(nn.Module):
    """1×1 ConvModule → 3×3 ConvModule (+ identity) — mmdet layout."""

    features: int
    add_identity: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvModule(self.features, 1, dtype=self.dtype, name="conv1")(x, train)
        y = ConvModule(self.features, 3, dtype=self.dtype, name="conv2")(y, train)
        if self.add_identity and x.shape[-1] == self.features:
            y = y + x
        return y


class DarknetCSPLayer(nn.Module):
    """mmdet CSPLayer with DarknetBottleneck blocks (no channel attention)."""

    features: int
    num_blocks: int
    add_identity: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // 2
        main = ConvModule(mid, 1, dtype=self.dtype, name="main_conv")(x, train)
        short = ConvModule(mid, 1, dtype=self.dtype, name="short_conv")(x, train)
        for i in range(self.num_blocks):
            main = DarknetBottleneck(
                mid, add_identity=self.add_identity, dtype=self.dtype,
                name=f"blocks_{i}",
            )(main, train)
        y = jnp.concatenate([main, short], axis=-1)
        return ConvModule(self.features, 1, dtype=self.dtype, name="final_conv")(
            y, train
        )


class CSPDarknet(nn.Module):
    """CSPDarknet-P5; returns the stride-8/16/32 maps (out_indices 2,3,4)."""

    widen: float = 0.375
    deepen: float = 0.33
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def w(c):
            return max(int(c * self.widen), 8)

        def d(n):
            return max(int(round(n * self.deepen)), 1)

        x = x.astype(self.dtype)
        # Focus stem: space-to-depth ×2 (mmdet patch-slice order: top-left,
        # bottom-left, top-right, bottom-right along channels), then 3×3.
        tl = x[:, ::2, ::2]
        bl = x[:, 1::2, ::2]
        tr = x[:, ::2, 1::2]
        br = x[:, 1::2, 1::2]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)  # (B, H/2, W/2, 12)
        x = ConvModule(w(64), 3, dtype=self.dtype, name="stem_conv")(x, train)

        outs = []
        for s, (ch, nb, add_id, use_spp) in enumerate(_DARKNET_P5, start=1):
            x = ConvModule(w(ch), 3, 2, dtype=self.dtype, name=f"stage{s}_down")(
                x, train
            )
            if use_spp:
                x = SPPBottleneck(w(ch), dtype=self.dtype, name=f"stage{s}_spp")(
                    x, train
                )
            x = DarknetCSPLayer(
                w(ch), d(nb), add_identity=add_id, dtype=self.dtype,
                name=f"stage{s}_csp",
            )(x, train)
            if s >= 2:
                outs.append(x)
        return outs  # strides 8, 16, 32


def _upsample2(x):
    """2× nearest-neighbour upsample (torch Upsample(mode='nearest'))."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


class YOLOXPAFPN(nn.Module):
    """YOLOX PAFPN neck (mmdet layout): top-down + bottom-up CSP fusion."""

    widen: float = 0.375
    deepen: float = 0.33
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        def w(c):
            return max(int(c * self.widen), 8)

        def d(n):
            return max(int(round(n * self.deepen)), 1)

        c3, c4, c5 = feats  # strides 8/16/32: w(256), w(512), w(1024)
        nb = d(3)

        # Top-down.
        p5 = ConvModule(w(512), 1, dtype=self.dtype, name="reduce_0")(c5, train)
        t4 = DarknetCSPLayer(w(512), nb, add_identity=False, dtype=self.dtype,
                             name="top_down_0")(
            jnp.concatenate([_upsample2(p5), c4], axis=-1), train)
        p4 = ConvModule(w(256), 1, dtype=self.dtype, name="reduce_1")(t4, train)
        p3 = DarknetCSPLayer(w(256), nb, add_identity=False, dtype=self.dtype,
                             name="top_down_1")(
            jnp.concatenate([_upsample2(p4), c3], axis=-1), train)

        # Bottom-up.
        d3 = ConvModule(w(256), 3, 2, dtype=self.dtype, name="downsample_0")(
            p3, train)
        n4 = DarknetCSPLayer(w(512), nb, add_identity=False, dtype=self.dtype,
                             name="bottom_up_0")(
            jnp.concatenate([d3, p4], axis=-1), train)
        d4 = ConvModule(w(512), 3, 2, dtype=self.dtype, name="downsample_1")(
            n4, train)
        n5 = DarknetCSPLayer(w(1024), nb, add_identity=False, dtype=self.dtype,
                             name="bottom_up_1")(
            jnp.concatenate([d4, p5], axis=-1), train)

        out = w(256)
        o3 = ConvModule(out, 1, dtype=self.dtype, name="out_0")(p3, train)
        o4 = ConvModule(out, 1, dtype=self.dtype, name="out_1")(n4, train)
        o5 = ConvModule(out, 1, dtype=self.dtype, name="out_2")(n5, train)
        return [o3, o4, o5]


class YOLOXHead(nn.Module):
    """Decoupled anchor-free head; per level cls/reg/obj predictions."""

    widen: float = 0.375
    num_classes: int = 80
    stacked_convs: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        feat_ch = max(int(256 * self.widen), 8)
        outs = []
        for lvl, x in enumerate(feats):
            c = x
            for i in range(self.stacked_convs):
                c = ConvModule(feat_ch, 3, dtype=self.dtype,
                               name=f"cls_convs_{lvl}_{i}")(c, train)
            r = x
            for i in range(self.stacked_convs):
                r = ConvModule(feat_ch, 3, dtype=self.dtype,
                               name=f"reg_convs_{lvl}_{i}")(r, train)
            cls = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                          param_dtype=jnp.float32,
                          name=f"conv_cls_{lvl}")(c).astype(jnp.float32)
            reg = nn.Conv(4, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                          name=f"conv_reg_{lvl}")(r).astype(jnp.float32)
            obj = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                          name=f"conv_obj_{lvl}")(r).astype(jnp.float32)
            outs.append((cls, reg, obj))
        return outs


class YOLOX(nn.Module):
    """Full YOLOX detector; forward = fused MMDet decode.

    Returns ``{"boxes_all": (B, N, 4) xyxy input px, "scores_all": (B, N)
    person prob, "raw": per-level (cls, reg, obj)}`` with
    N = Σ_l H_l·W_l (strides 8/16/32) — static for a static input size.
    Person = class ``person_class`` (COCO index 0) of the
    ``num_classes``-way classifier, so an 80-class zoo checkpoint imports
    verbatim.
    """

    widen: float = 0.375
    deepen: float = 0.33
    num_classes: int = 80
    person_class: int = 0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = CSPDarknet(self.widen, self.deepen, self.dtype,
                           name="backbone")(x, train)
        feats = YOLOXPAFPN(self.widen, self.deepen, self.dtype,
                           name="neck")(feats, train)
        level_outs = YOLOXHead(self.widen, self.num_classes,
                               dtype=self.dtype, name="head")(feats, train)

        boxes, scores = [], []
        for (cls, reg, obj), stride in zip(level_outs, (8, 16, 32)):
            B, h, w, _ = reg.shape
            # MMDet YOLOXHead._bbox_decode with MlvlPointGenerator(offset=0):
            # centers = (grid + xy_pred)·stride, sizes = exp(wh_pred)·stride.
            gx = jnp.arange(w, dtype=jnp.float32)
            gy = jnp.arange(h, dtype=jnp.float32)
            grid = jnp.stack(jnp.meshgrid(gx, gy), axis=-1)  # (h, w, 2) xy
            cxy = (reg[..., :2] + grid) * float(stride)
            wh = jnp.exp(jnp.clip(reg[..., 2:], -20.0, 9.0)) * float(stride)
            half = wh * 0.5
            b = jnp.concatenate([cxy - half, cxy + half], axis=-1)
            s = (nn.sigmoid(obj[..., 0])
                 * nn.sigmoid(cls[..., self.person_class]))
            boxes.append(b.reshape(B, h * w, 4))
            scores.append(s.reshape(B, h * w))
        return {
            "boxes_all": jnp.concatenate(boxes, axis=1),
            "scores_all": jnp.concatenate(scores, axis=1),
            "raw": level_outs,
        }
