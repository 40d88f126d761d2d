"""Pallas TPU kernel: HRNet stage-1 Bottleneck block, VMEM-resident.

PROFILE.md's conclusion #3: stage 1 (4 × Bottleneck at 64×48 spatial,
256 channels) is the headline program's largest sink (~20% of block
time) and is HBM-BANDWIDTH-bound — XLA materializes every intermediate
(conv1 writes 201 MB, conv2 201 MB, conv3 reads the 805 MB residual and
writes 805 MB per 512-crop block), ~3.2 GB of traffic per block where
the information content is one 805 MB read + one 805 MB write.

This kernel runs ONE bottleneck block per grid program with everything
VMEM-resident: grid over images, per program load the (64, 48, C_in)
slab once, compute

    y1 = relu(x @ W1 + b1)            # 1×1 reduce   (C_in -> 64)
    y2 = relu(conv3x3(y1) + b2)       # 9 shifted matmuls, zero-padded
    y3 = y2 @ W3 + b3                 # 1×1 expand   (64 -> 256)
    out = relu(y3 + residual)         # residual = x, or x @ Wd + bd

and write the (64, 48, 256) result once.  BatchNorms are FOLDED into
the conv weights at trace time (`fold_bottleneck_params`) — inference
BN is an output-channel affine, so W' = W·scale, b' = β − μ·scale.

HBM traffic per block drops from ~3.2 GB to ~1.6 GB (input + output +
weights).  Matmuls accumulate in f32 (`preferred_element_type`).

Integration: `HRNet.__call__(..., fused_stage1=fn)` skips its stage-1
module COMPUTE (params still declared, so the variables tree is
unchanged) and calls ``fn`` instead; `TopDownEstimator`/bench opt in by
building ``fn = make_fused_stage1(variables, cfg)``.  Off-TPU the
kernel runs in interpret mode (tests exercise parity vs the flax path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fold_convbn",
    "fold_bottleneck_params",
    "fused_bottleneck_block",
    "make_fused_stage1",
]


def fold_convbn(conv_params, bn_params, bn_stats, eps: float = 1e-5):
    """Fold inference BatchNorm into conv weights.

    Returns (W (kh, kw, cin, cout) f32, b (cout,) f32) with
    ``conv(x, W) + b == bn(conv(x, W_orig))`` at inference.
    """
    W = np.asarray(conv_params["kernel"], np.float32)
    gamma = np.asarray(bn_params["scale"], np.float32)
    beta = np.asarray(bn_params["bias"], np.float32)
    mean = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    scale = gamma / np.sqrt(var + eps)
    return W * scale, beta - mean * scale


def fold_bottleneck_params(block_params, block_stats):
    """Fold one Bottleneck module's ConvBN_0..2 (+ optional downsample
    ConvBN_3) into the kernel's weight dict (host-side numpy)."""
    out = {}
    for i, name in enumerate(("1", "2", "3")):
        W, b = fold_convbn(
            block_params[f"ConvBN_{i}"]["Conv_0"],
            block_params[f"ConvBN_{i}"]["BatchNorm_0"],
            block_stats[f"ConvBN_{i}"]["BatchNorm_0"],
        )
        out[f"W{name}"] = W
        out[f"b{name}"] = b
    if "ConvBN_3" in block_params:
        Wd, bd = fold_convbn(
            block_params["ConvBN_3"]["Conv_0"],
            block_params["ConvBN_3"]["BatchNorm_0"],
            block_stats["ConvBN_3"]["BatchNorm_0"],
        )
        out["Wd"] = Wd
        out["bd"] = bd
    return out


def _block_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  wd_ref, bd_ref, out_ref, *, H: int, W: int, mid: int,
                  cout: int, has_down: bool):
    f32 = jnp.float32
    x = x_ref[0]  # (H, W, Cin)
    cin = x.shape[-1]
    xf = x.reshape(H * W, cin)

    # 1x1 reduce.
    y1 = jnp.dot(xf, w1_ref[:], preferred_element_type=f32)
    y1 = jnp.maximum(y1 + b1_ref[:], 0.0).astype(x.dtype)

    # 3x3 SAME conv as 9 shifted matmuls over a zero-padded plane.
    y1p = jnp.zeros((H + 2, W + 2, mid), x.dtype)
    y1p = jax.lax.dynamic_update_slice(y1p, y1.reshape(H, W, mid), (1, 1, 0))
    acc = jnp.zeros((H * W, mid), f32)
    for dy in range(3):
        for dx in range(3):
            win = jax.lax.slice(
                y1p, (dy, dx, 0), (dy + H, dx + W, mid)
            ).reshape(H * W, mid)
            acc += jnp.dot(win, w2_ref[dy, dx], preferred_element_type=f32)
    y2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(x.dtype)

    # 1x1 expand + residual + relu.
    y3 = jnp.dot(y2, w3_ref[:], preferred_element_type=f32) + b3_ref[:]
    if has_down:
        res = jnp.dot(xf, wd_ref[:], preferred_element_type=f32) + bd_ref[:]
    else:
        res = xf.astype(f32)
    out = jnp.maximum(y3 + res, 0.0)
    out_ref[0] = out.reshape(H, W, cout).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def fused_bottleneck_block(x: jax.Array, folded: dict,
                           interpret: bool | None = None) -> jax.Array:
    """One Bottleneck block: x (B, H, W, Cin) -> (B, H, W, cout).

    ``folded``: output of `fold_bottleneck_params` (W1 (1,1,Cin,mid),
    W2 (3,3,mid,mid), W3 (1,1,mid,cout), optional Wd (1,1,Cin,cout)).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, cin = x.shape
    w1 = jnp.asarray(folded["W1"], jnp.float32).reshape(cin, -1)
    mid = w1.shape[1]
    w2 = jnp.asarray(folded["W2"], jnp.float32)  # (3, 3, mid, mid)
    w3 = jnp.asarray(folded["W3"], jnp.float32).reshape(mid, -1)
    cout = w3.shape[1]
    # rank-1 VMEM operands trip this Mosaic toolchain (see
    # fused_decode.py) — biases ride as (1, n).
    b1 = jnp.asarray(folded["b1"], jnp.float32).reshape(1, -1)
    b2 = jnp.asarray(folded["b2"], jnp.float32).reshape(1, -1)
    b3 = jnp.asarray(folded["b3"], jnp.float32).reshape(1, -1)
    has_down = "Wd" in folded
    if has_down:
        wd = jnp.asarray(folded["Wd"], jnp.float32).reshape(cin, cout)
        bd = jnp.asarray(folded["bd"], jnp.float32).reshape(1, -1)
    else:
        if cin != cout:
            raise ValueError(f"identity residual needs cin == cout, got "
                             f"{cin} vs {cout}")
        wd = jnp.zeros((1, 1), jnp.float32)
        bd = jnp.zeros((1, 1), jnp.float32)
    # Cast weights to the activation dtype for the MXU (bias stays f32 —
    # it adds into the f32 accumulator).
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    w3 = w3.astype(x.dtype)
    wd = wd.astype(x.dtype)

    def idx_x(i):
        return (i, 0, 0, 0)

    return pl.pallas_call(
        partial(_block_kernel, H=H, W=W, mid=mid, cout=cout,
                has_down=has_down),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, cin), idx_x, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w3.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b3.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wd.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bd.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, cout), idx_x,
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3, wd, bd)


def make_fused_stage1(variables: dict, n_blocks: int = 4,
                      interpret: bool | None = None):
    """Build ``fn(x) -> x`` running HRNet stage 1 via the Pallas kernel.

    ``variables``: the HRNet variables tree ({"params", "batch_stats"}).
    The returned closure folds the BN stats ONCE (host-side numpy) and
    chains the per-block kernels.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    folded = [
        fold_bottleneck_params(params[f"Bottleneck_{i}"],
                               stats[f"Bottleneck_{i}"])
        for i in range(n_blocks)
    ]

    def fn(x):
        for f in folded:
            x = fused_bottleneck_block(x, f, interpret=interpret)
        return x

    return fn
