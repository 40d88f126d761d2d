"""Pallas TPU kernels: HRNet stage-1 Bottleneck chain, VMEM-resident.

PROFILE.md's conclusion #3: stage 1 (4 × Bottleneck at 64×48 spatial,
256 channels) is the headline program's largest sink (~20% of block
time) and is HBM-BANDWIDTH-bound — XLA materializes every intermediate
(conv1 writes 201 MB, conv2 201 MB, conv3 reads the 805 MB residual and
writes 805 MB per 512-crop block), ~3.2 GB of traffic per block where
the information content is one 805 MB read + one 805 MB write.

Each Bottleneck is, with BatchNorms FOLDED into the conv weights at
trace time (`fold_bottleneck_params` — inference BN is an
output-channel affine, so W' = W·scale, b' = β − μ·scale):

    y1 = relu(x @ W1 + b1)            # 1×1 reduce   (C_in -> 64)
    y2 = relu(conv3x3(y1) + b2)       # im2col matmul, zero-padded SAME
    y3 = y2 @ W3 + b3                 # 1×1 expand   (64 -> 256)
    out = relu(y3 + residual)         # residual = x, or x @ Wd + bd

Two kernels, BOTH measured end-to-end (PROFILE.md experiments table):

- `fused_bottleneck_block` — ONE block per `pallas_call`, 3×3 as 9
  shifted K=64 matmuls.  A measured 4.7% end-to-end LOSS: intra-block
  VMEM residency is outweighed by skinny matmuls at half MXU
  contraction depth, and consecutive blocks still round-trip HBM.
- `fused_stage1_chain` — the WHOLE 4-block chain in one `pallas_call`
  (grid over images, per program the (64, 48, C) slab stays VMEM-
  resident through all 4 blocks), 3×3 as a single (HW, 576) @ (576, 64)
  im2col matmul that fills the MXU's 128 contraction lanes.  Stage-1
  HBM traffic drops to one input read + one output write.  A measured
  +3.9% end-to-end WIN (2857 vs 2749 fps) — the +9% swing between the
  two kernels at identical math is the empirical cost of inter-block
  HBM traffic + MXU underutilization.

Matmuls accumulate in f32 (`preferred_element_type`).

Integration: `HRNet.__call__(..., fused_stage1=fn)` skips its stage-1
module COMPUTE (params still declared, so the variables tree is
unchanged) and calls ``fn`` instead; `TopDownEstimator`/bench opt in by
building ``fn = make_fused_stage1(variables)``, which picks the chain
kernel.  Off-TPU the kernels run in interpret mode (tests exercise
parity vs the flax path).
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
    "fused_stage1_chain",
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

    # 3x3 SAME conv as 9 shifted matmuls.  Mosaic lowers neither pad nor
    # dynamic_update_slice, so zero-shifts are built from concatenated
    # zero strips: shift(a, d, axis) == a moved by -d with zero fill,
    # i.e. shifted(i) = a(i + d).
    y1hw = y1.reshape(H, W, mid)

    def shift(a, d, axis):
        if d == 0:
            return a
        zshape = list(a.shape)
        zshape[axis] = 1
        z = jnp.zeros(zshape, a.dtype)
        if d == 1:  # shifted(i) = a(i+1): drop first, zero at end
            body = jax.lax.slice_in_dim(a, 1, a.shape[axis], axis=axis)
            return jnp.concatenate([body, z], axis=axis)
        body = jax.lax.slice_in_dim(a, 0, a.shape[axis] - 1, axis=axis)
        return jnp.concatenate([z, body], axis=axis)

    acc = jnp.zeros((H * W, mid), f32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            win = shift(shift(y1hw, dy, 0), dx, 1).reshape(H * W, mid)
            acc += jnp.dot(win, w2_ref[dy + 1, dx + 1],
                           preferred_element_type=f32)
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
        # The 9-shift accumulation holds several (H*W, mid) copies plus
        # the f32 accumulator live at once — past the default 16 MiB
        # scoped-VMEM limit at 64x48x256.  v5e has 128 MiB VMEM/core;
        # grant the kernel half.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3, wd, bd)


def _shift(a, d, axis):
    """shifted(i) = a(i + d) with zero fill.  Mosaic lowers neither pad
    nor dynamic_update_slice; concatenated zero strips do lower."""
    if d == 0:
        return a
    zshape = list(a.shape)
    zshape[axis] = 1
    z = jnp.zeros(zshape, a.dtype)
    if d == 1:  # drop first, zero at end
        body = jax.lax.slice_in_dim(a, 1, a.shape[axis], axis=axis)
        return jnp.concatenate([body, z], axis=axis)
    body = jax.lax.slice_in_dim(a, 0, a.shape[axis] - 1, axis=axis)
    return jnp.concatenate([z, body], axis=axis)


def _chain_kernel(x_ref, w1_0, b1_0, w2_0, b2_0, w3_0, b3_0, wd_0, bd_0,
                  w1s, b1s, w2s, b2s, w3s, b3s, out_ref, *, H: int, W: int,
                  mid: int, cout: int, n_rest: int):
    """The full stage-1 chain (block 0 with downsample + ``n_rest``
    identity blocks) for ONE image, everything VMEM-resident.

    The 3x3 runs as a single im2col matmul: the 9 shifted (HW, mid)
    windows concatenate along lanes into (HW, 9*mid) against W2 reshaped
    (9*mid, mid) — K=9*64=576 fills the MXU's 128 contraction lanes,
    where 9 separate K=64 matmuls ran it at half depth.
    """
    f32 = jnp.float32

    def bottleneck(xf, w1, b1, w2r, b2, w3, b3, wd=None, bd=None):
        y1 = jnp.dot(xf, w1, preferred_element_type=f32)
        y1 = jnp.maximum(y1 + b1, 0.0).astype(xf.dtype)
        y1hw = y1.reshape(H, W, mid)
        cat = jnp.concatenate(
            [_shift(_shift(y1hw, dy, 0), dx, 1).reshape(H * W, mid)
             for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
            axis=1,
        )
        y2 = jnp.dot(cat, w2r, preferred_element_type=f32)
        y2 = jnp.maximum(y2 + b2, 0.0).astype(xf.dtype)
        y3 = jnp.dot(y2, w3, preferred_element_type=f32) + b3
        if wd is not None:
            res = jnp.dot(xf, wd, preferred_element_type=f32) + bd
        else:
            res = xf.astype(f32)
        return jnp.maximum(y3 + res, 0.0).astype(xf.dtype)

    x = x_ref[0]  # (H, W, Cin)
    xf = x.reshape(H * W, x.shape[-1])
    xf = bottleneck(xf, w1_0[:], b1_0[:], w2_0[:], b2_0[:], w3_0[:], b3_0[:],
                    wd_0[:], bd_0[:])
    for i in range(n_rest):
        xf = bottleneck(xf, w1s[i], b1s[i], w2s[i], b2s[i], w3s[i], b3s[i])
    out_ref[0] = xf.reshape(H, W, cout)


@partial(jax.jit, static_argnames=("n_rest", "interpret"))
def _chain_call(x, args, n_rest: int, interpret: bool):
    B, H, W, cin = x.shape
    mid = args[0].shape[1]
    cout = args[4].shape[1]
    full = [pl.BlockSpec(a.shape, (lambda nd: lambda i: (0,) * nd)(a.ndim),
                         memory_space=pltpu.VMEM) for a in args]
    return pl.pallas_call(
        partial(_chain_kernel, H=H, W=W, mid=mid, cout=cout, n_rest=n_rest),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), x.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + full,
        out_specs=pl.BlockSpec((1, H, W, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, *args)


def fused_stage1_chain(x: jax.Array, folded: list[dict],
                       interpret: bool | None = None) -> jax.Array:
    """Whole stage 1 in ONE kernel: x (B, H, W, Cin) -> (B, H, W, cout).

    ``folded``: per-block dicts from `fold_bottleneck_params`; block 0
    must carry the downsample (Wd/bd), the rest must be identity blocks.
    HBM traffic for stage 1 drops to one input read + one output write —
    the per-block `fused_bottleneck_block` still round-trips HBM between
    blocks (measured a 4.7% end-to-end LOSS for exactly that reason).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if "Wd" not in folded[0] or any("Wd" in f for f in folded[1:]):
        raise ValueError("chain expects downsample in block 0 only")
    dt = x.dtype
    cin = x.shape[-1]

    def prep(f):
        w1 = jnp.asarray(f["W1"], jnp.float32)
        mid = w1.shape[-1]
        w2r = jnp.asarray(f["W2"], jnp.float32).reshape(9 * mid, mid)
        w3 = jnp.asarray(f["W3"], jnp.float32)
        return (w1.reshape(-1, mid).astype(dt),
                jnp.asarray(f["b1"], jnp.float32).reshape(1, -1),
                w2r.astype(dt),
                jnp.asarray(f["b2"], jnp.float32).reshape(1, -1),
                w3.reshape(mid, -1).astype(dt),
                jnp.asarray(f["b3"], jnp.float32).reshape(1, -1))

    b0 = prep(folded[0])
    cout = b0[4].shape[1]
    wd = jnp.asarray(folded[0]["Wd"], jnp.float32).reshape(cin, cout).astype(dt)
    bd = jnp.asarray(folded[0]["bd"], jnp.float32).reshape(1, -1)
    rest = [prep(f) for f in folded[1:]]
    stacked = [jnp.stack([r[j] for r in rest]) for j in range(6)]
    args = list(b0) + [wd, bd] + stacked
    # arg order for _chain_call shape probing: [0]=w1_0 (cin, mid),
    # [4]=w3_0 (mid, cout).
    return _chain_call(x, tuple(args), n_rest=len(rest),
                       interpret=bool(interpret))


def make_fused_stage1(variables: dict, n_blocks: int = 4,
                      interpret: bool | None = None):
    """Build ``fn(x) -> x`` running HRNet stage 1 via the Pallas kernel.

    ``variables``: the HRNet variables tree ({"params", "batch_stats"}).
    The returned closure folds the BN stats ONCE (host-side numpy) and
    runs the whole chain in one kernel (`fused_stage1_chain`); if the
    block structure is not the standard downsample-then-identity chain it
    falls back to per-block kernels.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    folded = [
        fold_bottleneck_params(params[f"Bottleneck_{i}"],
                               stats[f"Bottleneck_{i}"])
        for i in range(n_blocks)
    ]
    chain_ok = (n_blocks >= 1 and "Wd" in folded[0]
                and not any("Wd" in f for f in folded[1:]))

    def fn(x):
        if chain_ok:
            return fused_stage1_chain(x, folded, interpret=interpret)
        for f in folded:
            x = fused_bottleneck_block(x, f, interpret=interpret)
        return x

    return fn
