"""HRNet-W32 top-down heatmap pose model — flax/NNX-free linen, NHWC.

From-scratch TPU-native replacement of the reference's MMPose heatmap model
(the Swin/HRNet family loaded at mmpose_pose_estimation.py:103-109 via
`init_model(..., output_heatmaps=True)`).  Architecture follows the public
HRNet paper (Sun et al., CVPR'19) W32 configuration with the standard
top-down heatmap head:

- stem: two stride-2 3×3 convs to 64ch (input /4)
- stage 1: 4 × Bottleneck(64, expansion 4)
- stages 2-4: multi-resolution branches [32, 64, 128, 256] of BasicBlocks
  with full cross-resolution fusion after every module (1/4/3 modules)
- head: 1×1 conv on the highest-resolution branch → K heatmaps at input/4

TPU notes: NHWC layout (XLA's preferred conv layout on TPU), bfloat16
activations with float32 params/batch-stats, all shapes static.  The
17-channel heatmap output feeds the fused on-device decode
(`ops.heatmap_moments` / `ops.heatmap_argmax_decode`) so the whole
frame→Gaussian path is one jitted program.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["HRNet", "HRNET_W32", "HRNET_W48", "set_conv_barriers"]

# (channels per branch, num modules per stage)
HRNET_W32 = {"widths": (32, 64, 128, 256), "modules": (1, 1, 4, 3), "stem": 64}
HRNET_W48 = {"widths": (48, 96, 192, 384), "modules": (1, 1, 4, 3), "stem": 64}

# Measured scheduling issue (PROFILE.md): XLA fuses the residual-add /
# cross-branch-sum epilogues INTO conv output loops, dragging 3-4 extra
# full-size activation reads through the MXU pipeline — identical
# [3,3,32,32] convs run 21 TFLOP/s with such an epilogue vs 119 TFLOP/s
# bare.  Barrier modes (tracing-time global; ConvBN is instantiated
# throughout the tree):
#   "off"      — let XLA fuse freely (baseline; 2694 fps measured).
#   "all"      — optimization_barrier after EVERY ConvBN.  Measured NET
#                LOSS (2223 fps): it also kills the beneficial patterns
#                (BN/ReLU input-fusions into the next conv, and the
#                memory-saving residual epilogues of the HBM-bound
#                stage-1 1x1 bottleneck convs).  Kept as evidence.
#   "residual" — barrier only between a BasicBlock's second conv and the
#                residual/fuse-sum adds: splits the multi-tensor VPU
#                epilogue off the MXU-heavy 3x3s while leaving every
#                other fusion free.
_CONV_BARRIERS = "off"


def set_conv_barriers(mode) -> None:
    """Set conv-fusion barrier mode: "off" (default) | "all" | "residual".

    Takes effect at TRACE time — call before jit/compile of the model."""
    global _CONV_BARRIERS
    if mode is True:
        mode = "all"
    if mode is False or mode is None:
        mode = "off"
    if mode not in ("off", "all", "residual"):
        raise ValueError(f"unknown barrier mode {mode!r}")
    _CONV_BARRIERS = mode


def _barrier(x):
    import jax

    return jax.lax.optimization_barrier(x)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Explicit symmetric padding (k//2 each side) rather than "SAME":
        # identical for stride 1, but for stride-2 convs XLA's SAME pads
        # (0, 1) while torch's padding=1 pads (1, 1) — a one-pixel shift
        # that would break MMPose-checkpoint numerics (models/convert.py).
        p = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.act:
            x = nn.relu(x)
        if _CONV_BARRIERS == "all":
            x = _barrier(x)
        return x


class Bottleneck(nn.Module):
    """ResNet bottleneck, expansion 4 (HRNet stage-1 block)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * 4
        residual = x
        y = ConvBN(self.features, 1, dtype=self.dtype)(x, train)
        y = ConvBN(self.features, 3, self.stride, dtype=self.dtype)(y, train)
        y = ConvBN(out_ch, 1, act=False, dtype=self.dtype)(y, train)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = ConvBN(out_ch, 1, self.stride, act=False, dtype=self.dtype)(
                x, train
            )
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    """Two 3×3 convs with identity shortcut (HRNet branch block)."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.features, 3, dtype=self.dtype)(x, train)
        y = ConvBN(self.features, 3, act=False, dtype=self.dtype)(y, train)
        if _CONV_BARRIERS == "residual":
            # Keep the residual add (and any downstream fuse-layer sums
            # that would chain onto it) OUT of the conv's output loop —
            # see _CONV_BARRIERS.
            y = _barrier(y)
        return nn.relu(y + x)


def _upsample_nearest(x, factor: int):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (B, H, factor, W, factor, C)
    )
    return x.reshape(B, H * factor, W * factor, C)


class FuseLayer(nn.Module):
    """Full cross-resolution fusion: every output branch sums all inputs.

    ``out_branches``: number of output branches to produce (default: all).
    MMPose's final stage-4 module fuses only into branch 0
    (multiscale_output=False) — matching that keeps torch checkpoints
    loadable AND skips the unused low-resolution fusions.
    """

    widths: Sequence[int]
    out_branches: int | None = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(xs)
        n_out = self.out_branches if self.out_branches is not None else n
        outs = []
        for i in range(n_out):
            acc = None
            for j in range(n):
                y = xs[j]
                if j > i:
                    # Lower res -> up: 1×1 conv + nearest-neighbour upsample.
                    y = ConvBN(self.widths[i], 1, act=False, dtype=self.dtype)(y, train)
                    y = _upsample_nearest(y, 2 ** (j - i))
                elif j < i:
                    # Higher res -> down: chain of stride-2 3×3 convs.
                    for k in range(i - j):
                        last = k == i - j - 1
                        y = ConvBN(
                            self.widths[i] if last else self.widths[j],
                            3,
                            2,
                            act=not last,
                            dtype=self.dtype,
                        )(y, train)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRModule(nn.Module):
    """4 BasicBlocks per branch + one fusion."""

    widths: Sequence[int]
    num_blocks: int = 4
    multiscale_output: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xs, train: bool = False):
        ys = []
        for b, x in enumerate(xs):
            for _ in range(self.num_blocks):
                x = BasicBlock(self.widths[b], dtype=self.dtype)(x, train)
            ys.append(x)
        out_branches = None if self.multiscale_output else 1
        return FuseLayer(self.widths, out_branches=out_branches, dtype=self.dtype)(
            ys, train
        )


class HRNet(nn.Module):
    """HRNet heatmap pose estimator; returns (B, H/4, W/4, num_joints).

    ``cfg``: HRNET_W32 / HRNET_W48.  Input NHWC float in [0, 1] (the caller
    applies ImageNet mean/std normalization — see models.topdown).
    """

    num_joints: int = 17
    cfg: Any = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, fused_stage1=None):
        cfg = self.cfg or HRNET_W32
        widths = cfg["widths"]
        modules = cfg["modules"]
        dt = self.dtype
        H, W = x.shape[1], x.shape[2]
        if H % 32 or W % 32:
            raise ValueError(
                f"HRNet input height/width must be divisible by 32 so the "
                f"4 branch resolutions nest exactly; got {(H, W)}"
            )
        x = x.astype(dt)

        # Stem /4
        x = ConvBN(cfg["stem"], 3, 2, dtype=dt)(x, train)
        x = ConvBN(cfg["stem"], 3, 2, dtype=dt)(x, train)

        # Stage 1: bottlenecks at full (1/4) resolution.
        if fused_stage1 is not None and not train:
            # Inference replacement (ops.pallas.bottleneck): the flax
            # modules still run on a tiny dummy slab so the parameter
            # tree is IDENTICAL (checkpoints/converters unaffected); XLA
            # dead-code-eliminates the unused dummy compute.  ``fn`` is
            # built from this model's variables by
            # `make_fused_stage1(variables)`.
            d = x[:1, :8, :8, :]
            for _ in range(4):
                d = Bottleneck(64, dtype=dt)(d, train)
            x = fused_stage1(x)
        else:
            for _ in range(4):
                x = Bottleneck(64, dtype=dt)(x, train)

        # Transition 1: split into 2 branches.
        xs = [
            ConvBN(widths[0], 3, dtype=dt)(x, train),
            ConvBN(widths[1], 3, 2, dtype=dt)(x, train),
        ]
        for _ in range(modules[1]):
            xs = HRModule(widths[:2], dtype=dt)(xs, train)

        # Transition 2: add branch 3.
        xs = xs + [ConvBN(widths[2], 3, 2, dtype=dt)(xs[-1], train)]
        for _ in range(modules[2]):
            xs = HRModule(widths[:3], dtype=dt)(xs, train)

        # Transition 3: add branch 4.  The LAST module of the last stage
        # fuses only into branch 0 (MMPose multiscale_output=False) unless
        # cfg["final_multiscale"] — the head reads branch 0 only, so the
        # other fusions would be dead compute (and absent from MMPose
        # checkpoints, models/convert.py).
        xs = xs + [ConvBN(widths[3], 3, 2, dtype=dt)(xs[-1], train)]
        final_ms = bool(cfg.get("final_multiscale", False))
        for m in range(modules[3]):
            last = m == modules[3] - 1
            xs = HRModule(
                widths[:4], multiscale_output=final_ms or not last, dtype=dt
            )(xs, train)

        # Head: 1×1 conv on the highest-resolution branch.
        heat = nn.Conv(
            self.num_joints,
            (1, 1),
            dtype=dt,
            param_dtype=jnp.float32,
            name="head",
        )(xs[0])
        return heat.astype(jnp.float32)
