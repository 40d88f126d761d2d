"""RTMDet person detector — CSPNeXt + CSPNeXtPAFPN + SepBN head, NHWC.

From-scratch TPU-native equivalent of the reference's PRIMARY named
detector checkpoint — `coco_base` resolves to RTMDet-m
(`rtmdet_m_640-8xb32_coco-person` + the person-only
`rtmdet_m_8xb32-100e_coco-obj365-person` weights,
/root/reference/examples/model_paths.yaml:1-4, loaded through
MMDetection at mmpose_pose_estimation.py:98/236-250).  Together with
YOLOX (`yolo_base`, models/yolox.py) this gives every detector the
reference names an import path, matching the pose families.

Architecture follows the public RTMDet paper (Lyu et al. 2022) and the
MMDetection implementation precisely:

- **CSPNeXt backbone** (3-conv stem, CSPNeXt-block CSP stages with
  channel attention, SPP in stage 4) — the SAME modules RTMPose's
  backbone uses (models/rtmpose.py), here tapping the stride-8/16/32
  maps (mmdet out_indices (2, 3, 4)) instead of only the last.
- **CSPNeXtPAFPN neck** — YOLOX PAFPN control flow with CSPNeXt-block
  CSP layers (NO channel attention in the neck — mmdet CSPLayer's
  `channel_attention` defaults off there) and 3×3 out convs.
- **RTMDetSepBNHead** with `share_conv=True`: the stacked 3×3 conv
  KERNELS are shared across the three pyramid levels while every level
  keeps its own BatchNorm — expressed here directly as one flax conv per
  stack index + per-level BN (the torch version aliases modules after
  construction; the state dict still carries one copy per level, which
  `convert.load_torch_rtmdet` verifies are identical before folding).
  Prediction convs (`rtm_cls`/`rtm_reg`, 1×1 + bias) are per-level.

The forward fuses the MMDet decode (RTMDetHead.predict with
`MlvlPointGenerator(offset=0)` + `DistancePointBBoxCoder`): per level
``reg_dist = relu(rtm_reg(x)) · stride`` are (l, t, r, b) pixel
distances from the prior point ``(gx·stride, gy·stride)``, and person
score = ``sigmoid(cls[person_class])`` (`with_objectness=False` in every
RTMDet config — there is no objectness branch).  Returns the same flat
candidate contract as YOLOX/CenterNet: ``boxes_all`` (B, N, 4) xyxy
input pixels, ``scores_all`` (B, N), consumed by
`models.detector.decode_top1`/`decode_topk`.  NHWC, bfloat16
activations, float32 params, static shapes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .rtmpose import ConvModule, CSPLayer, SPPBottleneck, _P5

__all__ = ["RTMDet", "RTMDET_M", "RTMDET_TINY"]

# widen/deepen per RTMDet flavor (mmdet configs).  The reference's
# checkpoint is person-only (num_classes=1, rtmdet_m_640-8xb32_coco-person).
RTMDET_M = {"widen": 0.75, "deepen": 0.67, "num_classes": 1,
            "neck_out": 192, "num_csp_blocks": 2}
RTMDET_TINY = {"widen": 0.375, "deepen": 0.167, "num_classes": 1,
               "neck_out": 96, "num_csp_blocks": 1}


class CSPNeXtDet(nn.Module):
    """CSPNeXt-P5 with detection taps: returns stride-8/16/32 maps.

    Identical module tree (and therefore converter key surface) to
    models/rtmpose.py::CSPNeXt — only the out_indices differ (mmdet
    builds the detection backbone with out_indices=(2, 3, 4), the pose
    backbone with (4,)).
    """

    widen: float = 0.75
    deepen: float = 0.67
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def w(c):
            return max(int(round(c * self.widen)), 8)

        def d(n):
            return max(int(round(n * self.deepen)), 1)

        x = x.astype(self.dtype)
        x = ConvModule(w(64) // 2, 3, 2, dtype=self.dtype, name="stem_0")(x, train)
        x = ConvModule(w(64) // 2, 3, dtype=self.dtype, name="stem_1")(x, train)
        x = ConvModule(w(64), 3, dtype=self.dtype, name="stem_2")(x, train)
        outs = []
        for s, (ch, nb, add_id, use_spp) in enumerate(_P5, start=1):
            x = ConvModule(w(ch), 3, 2, dtype=self.dtype, name=f"stage{s}_down")(
                x, train
            )
            if use_spp:
                x = SPPBottleneck(w(ch), dtype=self.dtype, name=f"stage{s}_spp")(
                    x, train
                )
            x = CSPLayer(
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


class CSPNeXtPAFPN(nn.Module):
    """CSPNeXt PAFPN neck (mmdet layout): CSPNeXt-block CSP fusion,
    no channel attention, 3×3 out convs to a common width."""

    widen: float = 0.75
    num_csp_blocks: int = 2
    out_features: int = 192
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        def w(c):
            return max(int(round(c * self.widen)), 8)

        c3, c4, c5 = feats  # strides 8/16/32: w(256), w(512), w(1024)
        nb = self.num_csp_blocks

        def csp(features, name):
            return CSPLayer(features, nb, add_identity=False,
                            use_attention=False, dtype=self.dtype, name=name)

        # Top-down (mmdet CSPNeXtPAFPN.forward — YOLOXPAFPN control flow).
        p5 = ConvModule(w(512), 1, dtype=self.dtype, name="reduce_0")(c5, train)
        t4 = csp(w(512), "top_down_0")(
            jnp.concatenate([_upsample2(p5), c4], axis=-1), train)
        p4 = ConvModule(w(256), 1, dtype=self.dtype, name="reduce_1")(t4, train)
        p3 = csp(w(256), "top_down_1")(
            jnp.concatenate([_upsample2(p4), c3], axis=-1), train)

        # Bottom-up.
        d3 = ConvModule(w(256), 3, 2, dtype=self.dtype, name="downsample_0")(
            p3, train)
        n4 = csp(w(512), "bottom_up_0")(
            jnp.concatenate([d3, p4], axis=-1), train)
        d4 = ConvModule(w(512), 3, 2, dtype=self.dtype, name="downsample_1")(
            n4, train)
        n5 = csp(w(1024), "bottom_up_1")(
            jnp.concatenate([d4, p5], axis=-1), train)

        out = self.out_features
        o3 = ConvModule(out, 3, dtype=self.dtype, name="out_0")(p3, train)
        o4 = ConvModule(out, 3, dtype=self.dtype, name="out_1")(n4, train)
        o5 = ConvModule(out, 3, dtype=self.dtype, name="out_2")(n5, train)
        return [o3, o4, o5]


class RTMDetSepBNHead(nn.Module):
    """Shared-conv / separate-BN head (mmdet RTMDetSepBNHead).

    One 3×3 conv kernel per stack index serves all three levels; each
    level owns its BatchNorm (+SiLU).  1×1 rtm_cls/rtm_reg per level.
    """

    features: int = 192
    num_classes: int = 1
    stacked_convs: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # Shared conv kernels (instantiated once, applied per level).
        shared_cls = [
            nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"cls_conv_{i}")
            for i in range(self.stacked_convs)
        ]
        shared_reg = [
            nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"reg_conv_{i}")
            for i in range(self.stacked_convs)
        ]

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name=name)

        outs = []
        for lvl, x in enumerate(feats):
            c = x
            for i in range(self.stacked_convs):
                c = nn.silu(bn(f"cls_bn_{lvl}_{i}")(shared_cls[i](c)))
            r = x
            for i in range(self.stacked_convs):
                r = nn.silu(bn(f"reg_bn_{lvl}_{i}")(shared_reg[i](r)))
            cls = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                          param_dtype=jnp.float32,
                          name=f"rtm_cls_{lvl}")(c).astype(jnp.float32)
            reg = nn.Conv(4, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                          name=f"rtm_reg_{lvl}")(r).astype(jnp.float32)
            outs.append((cls, reg))
        return outs


class RTMDet(nn.Module):
    """Full RTMDet detector; forward = fused MMDet decode.

    Returns ``{"boxes_all": (B, N, 4) xyxy input px, "scores_all": (B, N)
    person prob, "raw": per-level (cls, reg)}`` with N = Σ_l H_l·W_l
    (strides 8/16/32) — static for a static input size.  The reference's
    checkpoint is person-only (num_classes=1) so ``person_class``
    defaults to its single logit; an 80-class COCO RTMDet imports with
    ``num_classes=80`` unchanged.
    """

    widen: float = 0.75
    deepen: float = 0.67
    num_classes: int = 1
    num_csp_blocks: int = 2
    neck_out: int = 192
    person_class: int = 0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = CSPNeXtDet(self.widen, self.deepen, self.dtype,
                           name="backbone")(x, train)
        feats = CSPNeXtPAFPN(self.widen, self.num_csp_blocks, self.neck_out,
                             self.dtype, name="neck")(feats, train)
        level_outs = RTMDetSepBNHead(
            self.neck_out, self.num_classes, dtype=self.dtype, name="head",
        )(feats, train)

        boxes, scores = [], []
        for (cls, reg), stride in zip(level_outs, (8, 16, 32)):
            B, h, w, _ = reg.shape
            # MlvlPointGenerator(offset=0): prior at (gx·s, gy·s);
            # DistancePointBBoxCoder: box = prior ∓ relu(reg)·stride.
            gx = jnp.arange(w, dtype=jnp.float32) * float(stride)
            gy = jnp.arange(h, dtype=jnp.float32) * float(stride)
            px, py = jnp.meshgrid(gx, gy)  # (h, w)
            dist = nn.relu(reg) * float(stride)  # (B, h, w, 4) l,t,r,b
            b = jnp.stack([
                px - dist[..., 0], py - dist[..., 1],
                px + dist[..., 2], py + dist[..., 3],
            ], axis=-1)
            s = nn.sigmoid(cls[..., self.person_class])
            boxes.append(b.reshape(B, h * w, 4))
            scores.append(s.reshape(B, h * w))
        return {
            "boxes_all": jnp.concatenate(boxes, axis=1),
            "scores_all": jnp.concatenate(scores, axis=1),
            "raw": level_outs,
        }
