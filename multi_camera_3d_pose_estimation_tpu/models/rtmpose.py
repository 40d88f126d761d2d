"""RTMPose-style SimCC pose model — CSPNeXt backbone + coordinate heads.

From-scratch TPU-native equivalent of the reference's RTMPose-t config
(`coco_rtmpose-t` at examples/model_paths.yaml:14-18, loaded through MMPose
at mmpose_pose_estimation.py:103-109).  Exercises the framework's
*non-heatmap* decode path: the head emits per-joint 1-D classification
logits over x and y bins at `simcc_split_ratio`× the input resolution,
decoded on-device by `ops.simcc_decode`.

Architecture (public RTMPose paper, Jiang et al. 2023):
- CSPNeXt backbone (stem + 4 CSP stages with SiLU + channel attention)
- head: 7×7 depthwise + 1×1 conv on the final 1/32 feature map, flatten,
  FC to an embedding, one Gated Attention Unit block, then two linear
  projections to the x / y bin logits.

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


class ConvModule(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        if self.act:
            x = nn.silu(x)
        return x


class ChannelAttention(nn.Module):
    """Squeeze-excite style gate (CSPNeXt block attention)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(C, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(g)
        return x * nn.sigmoid(g)


class CSPNeXtBlock(nn.Module):
    features: int
    add_identity: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvModule(self.features, 3, dtype=self.dtype)(x, train)
        y = ConvModule(self.features, 5, groups=self.features, dtype=self.dtype)(y, train)
        if self.add_identity and x.shape[-1] == self.features:
            y = y + x
        return y


class CSPLayer(nn.Module):
    features: int
    num_blocks: int
    use_attention: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // 2
        a = ConvModule(mid, 1, dtype=self.dtype)(x, train)
        b = ConvModule(mid, 1, dtype=self.dtype)(x, train)
        for _ in range(self.num_blocks):
            b = CSPNeXtBlock(mid, dtype=self.dtype)(b, train)
        y = jnp.concatenate([a, b], axis=-1)
        if self.use_attention:
            y = ChannelAttention(dtype=self.dtype)(y)
        return ConvModule(self.features, 1, dtype=self.dtype)(y, train)


class CSPNeXt(nn.Module):
    """CSPNeXt backbone; returns the final 1/32 feature map (NHWC)."""

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
        x = ConvModule(w(64) // 2, 3, 2, dtype=self.dtype)(x, train)
        x = ConvModule(w(64) // 2, 3, dtype=self.dtype)(x, train)
        x = ConvModule(w(64), 3, dtype=self.dtype)(x, train)
        # Stages: /4, /8, /16, /32.
        for ch, nb in ((128, 3), (256, 6), (512, 6), (1024, 3)):
            x = ConvModule(w(ch), 3, 2, dtype=self.dtype)(x, train)
            x = CSPLayer(w(ch), d(nb), dtype=self.dtype)(x, train)
        return x


class GAU(nn.Module):
    """Gated Attention Unit over the joint axis (RTMCC head block)."""

    embed: int = 256
    expansion: int = 2
    s: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # x: (B, K, embed)
        e = self.embed * self.expansion
        res = x
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        xn = ((x32 - mean) / jnp.sqrt(var + 1e-5)).astype(self.dtype)

        uv = nn.Dense(2 * e + self.s, dtype=self.dtype, param_dtype=jnp.float32)(xn)
        uv = nn.silu(uv)
        u, v, base = jnp.split(uv, [e, 2 * e], axis=-1)
        # Per-head learned offsets for q/k (simplified RoPE-free variant).
        gamma = self.param("gamma", nn.initializers.ones, (2, self.s), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (2, self.s), jnp.float32)
        q = base * gamma[0].astype(self.dtype) + beta[0].astype(self.dtype)
        k = base * gamma[1].astype(self.dtype) + beta[1].astype(self.dtype)
        qk = jnp.einsum("bms,bns->bmn", q, k, preferred_element_type=jnp.float32)
        attn = nn.relu(qk / self.s) ** 2
        out = u * jnp.einsum(
            "bmn,bne->bme", attn.astype(self.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out = nn.Dense(self.embed, dtype=self.dtype, param_dtype=jnp.float32)(out)
        return res + out


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
        feats = CSPNeXt(cfg["widen"], cfg["deepen"], dtype=self.dtype)(x, train)
        B, H, W, C = feats.shape

        # Head: large-kernel depthwise + pointwise, then flatten to tokens.
        y = ConvModule(C, 7, groups=C, dtype=self.dtype)(feats, train)
        y = nn.Conv(
            self.num_joints, (1, 1), dtype=self.dtype, param_dtype=jnp.float32
        )(y)  # (B, H, W, K)
        y = y.reshape(B, H * W, self.num_joints)
        y = jnp.swapaxes(y, 1, 2)  # (B, K, H*W)
        y = nn.Dense(cfg["embed"], dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = GAU(cfg["embed"], dtype=self.dtype)(y)

        wx = int(self.input_size[0] * self.simcc_split_ratio)
        wy = int(self.input_size[1] * self.simcc_split_ratio)
        simcc_x = nn.Dense(wx, dtype=self.dtype, param_dtype=jnp.float32)(y)
        simcc_y = nn.Dense(wy, dtype=self.dtype, param_dtype=jnp.float32)(y)
        return simcc_x.astype(jnp.float32), simcc_y.astype(jnp.float32)
