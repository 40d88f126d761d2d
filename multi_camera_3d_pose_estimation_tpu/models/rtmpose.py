"""RTMPose SimCC pose model — CSPNeXt backbone + RTMCC head, NHWC.

From-scratch TPU-native equivalent of the reference's RTMPose-t config
(`coco_rtmpose-t` at examples/model_paths.yaml:14-18, loaded through MMPose
at mmpose_pose_estimation.py:103-109).  Exercises the framework's
*non-heatmap* decode path: the head emits per-joint 1-D classification
logits over x and y bins at `simcc_split_ratio`× the input resolution,
decoded on-device by `ops.simcc_decode`.

Architecture follows the public RTMPose paper (Jiang et al. 2023) and the
MMPose/MMDet implementation precisely — CSPNeXt P5 backbone (stem + 4 CSP
stages, SPP bottleneck in stage 4, hard-sigmoid channel attention) and the
RTMCC head (7×7 conv → ScaleNorm+FC token embedding → one Gated Attention
Unit → x/y bin classifiers) — so trained MMPose checkpoints convert 1:1
(`models/convert.py::load_torch_rtmpose`).  Submodules carry explicit
names mirroring the torch state-dict hierarchy, which makes the
conversion name-based rather than order-based.

NHWC, bfloat16 activations, float32 params; everything static-shape.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["RTMPose", "CSPNeXt", "RTMPOSE_T", "RTMPOSE_S", "RTMPOSE_M"]

# widen_factor / deepen_factor per RTMPose flavor
RTMPOSE_T = {"widen": 0.375, "deepen": 0.167, "embed": 256}
RTMPOSE_S = {"widen": 0.5, "deepen": 0.33, "embed": 256}
RTMPOSE_M = {"widen": 0.75, "deepen": 0.67, "embed": 256}

# CSPNeXt P5 arch: (out_channels, num_blocks, add_identity, use_spp)
_P5 = ((128, 3, True, False), (256, 6, True, False),
       (512, 6, True, False), (1024, 3, False, True))


class ConvModule(nn.Module):
    """conv (no bias) + BN + SiLU — mmcv ConvModule with SiLU act."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),  # torch padding=k//2 (not XLA SAME)
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            dtype=self.dtype, param_dtype=jnp.float32, name="bn",
        )(x)
        if self.act:
            x = nn.silu(x)
        return x


class DepthwiseSeparableConv(nn.Module):
    """depthwise k×k ConvModule + pointwise 1×1 ConvModule (mmcv layout)."""

    features: int
    kernel: int = 5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = ConvModule(
            c, self.kernel, groups=c, dtype=self.dtype, name="depthwise_conv"
        )(x, train)
        x = ConvModule(self.features, 1, dtype=self.dtype, name="pointwise_conv")(
            x, train
        )
        return x


class ChannelAttention(nn.Module):
    """Global-pool + 1×1 conv + HARD-sigmoid gate (mmdet ChannelAttention)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        g = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        g = nn.Conv(C, (1, 1), param_dtype=jnp.float32, name="fc")(g)
        # torch nn.Hardsigmoid: relu6(x + 3) / 6
        gate = jnp.clip(g + 3.0, 0.0, 6.0) / 6.0
        return x * gate.astype(x.dtype)


class CSPNeXtBlock(nn.Module):
    """3×3 ConvModule → 5×5 depthwise-separable ConvModule (+ identity)."""

    features: int
    add_identity: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvModule(self.features, 3, dtype=self.dtype, name="conv1")(x, train)
        y = DepthwiseSeparableConv(self.features, 5, dtype=self.dtype, name="conv2")(
            y, train
        )
        if self.add_identity and x.shape[-1] == self.features:
            y = y + x
        return y


class CSPLayer(nn.Module):
    """Cross-stage partial layer (mmdet CSPLayer, cspnext blocks).

    main path goes through the blocks; concat order is (main, short);
    channel attention gates the concat before final_conv.
    """

    features: int
    num_blocks: int
    add_identity: bool = True
    use_attention: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // 2
        main = ConvModule(mid, 1, dtype=self.dtype, name="main_conv")(x, train)
        short = ConvModule(mid, 1, dtype=self.dtype, name="short_conv")(x, train)
        for i in range(self.num_blocks):
            main = CSPNeXtBlock(
                mid, add_identity=self.add_identity, dtype=self.dtype,
                name=f"blocks_{i}",
            )(main, train)
        y = jnp.concatenate([main, short], axis=-1)
        if self.use_attention:
            y = ChannelAttention(dtype=self.dtype, name="attention")(y)
        return ConvModule(self.features, 1, dtype=self.dtype, name="final_conv")(
            y, train
        )


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling (kernels 5/9/13, stride 1) — mmdet layout."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 2
        x = ConvModule(mid, 1, dtype=self.dtype, name="conv1")(x, train)
        pools = [
            nn.max_pool(
                x, (k, k), strides=(1, 1), padding=((k // 2, k // 2), (k // 2, k // 2))
            )
            for k in (5, 9, 13)
        ]
        y = jnp.concatenate([x] + pools, axis=-1)
        return ConvModule(self.features, 1, dtype=self.dtype, name="conv2")(y, train)


class CSPNeXt(nn.Module):
    """CSPNeXt-P5 backbone; returns the final 1/32 feature map (NHWC)."""

    widen: float = 0.375
    deepen: float = 0.167
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def w(c):
            return max(int(round(c * self.widen)), 8)

        def d(n):
            return max(int(round(n * self.deepen)), 1)

        x = x.astype(self.dtype)
        # Stem: three 3×3 convs, stride 2 on the first (input /2).
        x = ConvModule(w(64) // 2, 3, 2, dtype=self.dtype, name="stem_0")(x, train)
        x = ConvModule(w(64) // 2, 3, dtype=self.dtype, name="stem_1")(x, train)
        x = ConvModule(w(64), 3, dtype=self.dtype, name="stem_2")(x, train)
        # Stages: /4, /8, /16, /32.
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
        return x


class ScaleNorm(nn.Module):
    """x / (||x||₂ · d^-½) · g — the RTMCC normalization (scalar gain g)."""

    dtype: Any = jnp.bfloat16
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,), jnp.float32)
        x32 = x.astype(jnp.float32)
        d = x.shape[-1]
        norm = jnp.linalg.norm(x32, axis=-1, keepdims=True) * (d ** -0.5)
        return (x32 / jnp.maximum(norm, self.eps) * g).astype(self.dtype)


class GAU(nn.Module):
    """Gated Attention Unit over the joint axis (RTMCC self-attn block).

    Mirrors mmpose RTMCCBlock(attn_type='self-attn', use_rel_bias=False,
    pos_enc=False): ScaleNorm → uv projection (bias-free) → SiLU →
    relu(qk/√s)² attention → output projection → learnable residual scale.
    """

    embed: int = 256
    expansion: int = 2
    s: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # x: (B, K, embed)
        e = self.embed * self.expansion
        res = x
        xn = ScaleNorm(dtype=self.dtype, name="ln")(x)

        uv = nn.Dense(
            2 * e + self.s, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="uv",
        )(xn)
        uv = nn.silu(uv)
        u, v, base = jnp.split(uv, [e, 2 * e], axis=-1)
        gamma = self.param("gamma", nn.initializers.normal(0.02), (2, self.s),
                           jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (2, self.s), jnp.float32)
        q = base * gamma[0].astype(self.dtype) + beta[0].astype(self.dtype)
        k = base * gamma[1].astype(self.dtype) + beta[1].astype(self.dtype)
        qk = jnp.einsum("bms,bns->bmn", q, k, preferred_element_type=jnp.float32)
        attn = nn.relu(qk / jnp.sqrt(jnp.float32(self.s))) ** 2
        out = u * jnp.einsum(
            "bmn,bne->bme", attn.astype(self.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out = nn.Dense(
            self.embed, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="o",
        )(out)
        scale = self.param("res_scale", nn.initializers.ones, (self.embed,),
                           jnp.float32)
        return res * scale.astype(self.dtype) + out


class RTMPose(nn.Module):
    """SimCC pose model: image -> (simcc_x (B,K,Wx), simcc_y (B,K,Wy)).

    ``input_size`` is (width, height); bin counts are
    `input_size * simcc_split_ratio`.  Decode with `ops.simcc_decode`.
    """

    num_joints: int = 17
    input_size: tuple[int, int] = (192, 256)  # (W, H)
    simcc_split_ratio: float = 2.0
    cfg: Any = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg or RTMPOSE_T
        feats = CSPNeXt(
            cfg["widen"], cfg["deepen"], dtype=self.dtype, name="backbone"
        )(x, train)
        B, H, W, C = feats.shape

        # RTMCC head: full 7×7 conv C→K (with bias), flatten to K tokens.
        y = nn.Conv(
            self.num_joints, (7, 7), padding=((3, 3), (3, 3)), dtype=self.dtype,
            param_dtype=jnp.float32, name="final_layer",
        )(feats)  # (B, H, W, K)
        y = y.reshape(B, H * W, self.num_joints)
        y = jnp.swapaxes(y, 1, 2)  # (B, K, H*W)
        y = ScaleNorm(dtype=self.dtype, name="mlp_ln")(y)
        y = nn.Dense(
            cfg["embed"], use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="mlp_fc",
        )(y)
        y = GAU(cfg["embed"], dtype=self.dtype, name="gau")(y)

        wx = int(self.input_size[0] * self.simcc_split_ratio)
        wy = int(self.input_size[1] * self.simcc_split_ratio)
        simcc_x = nn.Dense(
            wx, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="cls_x",
        )(y)
        simcc_y = nn.Dense(
            wy, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="cls_y",
        )(y)
        return simcc_x.astype(jnp.float32), simcc_y.astype(jnp.float32)
