"""Pallas TPU kernel: Swin window attention core, VMEM-resident.

The Swin pipeline's attention stage (models/swin.py::WindowAttention)
materializes, per block layer, a (B·nW, heads, w², w²) float32 score
tensor in HBM three times over (QKᵀ batched-matmul write, bias+mask+
softmax fusion read/write, AV batched-matmul read).  At the `bench.py
swin` shapes (Swin-B, 256 crops/block) that is ~0.7 GB per stage-0 layer
— far more traffic than the qkv tensors themselves.  The arithmetic
cannot fill the MXU either way (w²=49 tokens, head_dim 32 → tiny
contractions), so window attention is BANDWIDTH-bound and the win is to
never let the scores leave VMEM.

This kernel takes the qkv projection output (Bw, n, 3C) — windows
already partitioned/rolled by XLA (cheap layout next to the matmuls) —
and emits the attention context (Bw, n, C): per window, per head,
scores = scale·q@kᵀ + relative-position bias (+ shift-region mask),
softmax, @v, all in VMEM.  The qkv and proj Dense layers stay in XLA:
they are MXU-efficient (M = Bw·n, K = C) and fuse with their neighbors.

Numerics match the einsum path: bf16 operands, f32 score accumulation
and softmax, bf16 probabilities into the AV matmul with f32 accumulation
(tests/test_pallas_window_attention.py pins parity in interpret mode and
against the full flax module).

Windows are batched ``WB`` per program so Mosaic can pipeline block DMA
against compute; the shifted-window region mask is indexed per window as
``(program·WB + j) mod nW`` — the partition order (B, h-windows,
w-windows) makes window-in-image periodic in the flattened window axis.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_window_attention", "packed_window_attention"]


def _attn_kernel(qkv_ref, bias_ref, mask_ref, out_ref, *, heads: int,
                 C: int, WB: int, nW: int, scale: float):
    f32 = jnp.float32
    d = C // heads
    i = pl.program_id(0)

    def body(j, carry):
        qkv = qkv_ref[j]  # (n, 3C) bf16
        # Window index within its image: partition order is
        # (B, h-windows, w-windows) -> flat index periodic mod nW.
        wi = (i * WB + j).astype(jnp.int32)
        mask = mask_ref[jax.lax.rem(wi, jnp.asarray(nW, jnp.int32))]  # (n, n)
        for h in range(heads):
            q = qkv[:, h * d:(h + 1) * d]
            k = qkv[:, C + h * d:C + (h + 1) * d]
            v = qkv[:, 2 * C + h * d:2 * C + (h + 1) * d]
            # q @ k^T without an explicit transpose (contract dim 1 of
            # both operands); accumulate f32.
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
            ) * scale
            s = s + bias_ref[h] + mask
            p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
            o = jnp.dot(p, v, preferred_element_type=f32)
            out_ref[j, :, h * d:(h + 1) * d] = o.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, WB, body, 0)


@partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_window_attention(qkv: jax.Array, bias: jax.Array,
                           mask: jax.Array | None, heads: int,
                           interpret: bool | None = None) -> jax.Array:
    """Window attention context from the fused qkv projection.

    qkv:  (Bw, n, 3C) — Dense output per partitioned window (q | k | v
          along the last axis, each C = heads·d channels).
    bias: (heads, n, n) float32 relative-position bias (table already
          gathered by the caller).
    mask: (nW, n, n) float32 additive shift-region mask, or None for
          unshifted layers.  ``Bw`` must be a multiple of nW (it is
          B·nW by construction).
    Returns (Bw, n, C) in qkv.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Bw, n, C3 = qkv.shape
    C = C3 // 3
    if C % heads:
        raise ValueError(f"C={C} not divisible by heads={heads}")
    scale = float((C // heads) ** -0.5)
    if mask is None:
        mask = jnp.zeros((1, n, n), jnp.float32)
    mask = mask.astype(jnp.float32)
    bias = bias.astype(jnp.float32)
    nW = mask.shape[0]
    if Bw % nW:
        raise ValueError(f"Bw={Bw} not a multiple of nW={nW}")
    # Windows per program: enough to amortize grid/DMA overhead, small
    # enough to keep the (WB, n, 3C) block + f32 scores comfortably in
    # VMEM at Swin-L's stage-3 widths.
    WB = 1
    for cand in (16, 8, 4, 2):
        if Bw % cand == 0:
            WB = cand
            break

    kernel = partial(_attn_kernel, heads=heads, C=C, WB=WB, nW=nW,
                     scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bw, n, C), qkv.dtype),
        grid=(Bw // WB,),
        in_specs=[
            pl.BlockSpec((WB, n, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bias.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mask.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((WB, n, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkv, bias, mask)


# ---------------------------------------------------------------------------
# Packed variant: amortize MXU issue latency across windows.
#
# The per-window kernel above is bound by MXU ISSUE LATENCY, not bandwidth
# or flops: the device trace (PROFILE.md, Swin-B appendix) shows ~70-150 ns
# per (49,32)@(32,49) dot REGARDLESS of stage shape — each sub-tile matmul
# pays a full systolic-array traversal.  This variant stacks WB windows
# along the row axis and issues ONE (WB·n, d)@(d, WB·n) score matmul and
# ONE (WB·n, WB·n)@(WB·n, d) context matmul per head per program — WB×
# fewer issues at WB× wasted flops (free: the kernel runs at ~1-3% of the
# MXU flop peak).
#
# Correctness of the packing: cross-window score blocks are garbage, so a
# precomputed additive tensor T[h] = tile(bias_h) + (−1e5 off the window-
# diagonal) is added before softmax; exp(−1e5) underflows to EXACTLY 0.0
# in float32, so the packed probability matrix is exactly block-diagonal
# and the stacked AV matmul reproduces the per-window result bit-for-bit
# (same f32 accumulate / f32 softmax / bf16 probabilities as the einsum
# path).  The shifted-window region mask is applied as a rank-1 broadcast
# comparison of per-token region ids (r_row != r_col → −100), which equals
# the (nW, n, n) mask of models/swin.py::_shift_mask on the diagonal
# blocks and is harmless off-diagonal (already −1e5 there).
#
# Layout: qkv is passed FLATTENED to (Bw·n, 3C) so each program's block is
# (WB·n, 3C) — for n=49, WB∈{2,4,8} gives 8-aligned sublane counts and no
# in-kernel window-merge reshapes; q/k/v head slices are static lane
# slices.  T rides in VMEM once (constant index map → no per-program DMA);
# the region-id patterns are tiny (nW/gcd(WB,nW) distinct row/col vectors,
# block-indexed by `(i·WB mod nW) // gcd`).
# ---------------------------------------------------------------------------


def _packed_kernel(qkv_ref, t_ref, rrow_ref, rcol_ref, out_ref, *,
                   heads: int, C: int, scale: float, shifted: bool):
    f32 = jnp.float32
    d = C // heads
    for h in range(heads):
        q = qkv_ref[:, h * d:(h + 1) * d]
        k = qkv_ref[:, C + h * d:C + (h + 1) * d]
        v = qkv_ref[:, 2 * C + h * d:2 * C + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
        ) * scale
        s = s + t_ref[h]
        if shifted:
            s = s + jnp.where(rrow_ref[0] != rcol_ref[0], f32(-100.0),
                              f32(0.0))
        p = jax.nn.softmax(s, axis=-1).astype(qkv_ref.dtype)
        o = jnp.dot(p, v, preferred_element_type=f32)
        out_ref[:, h * d:(h + 1) * d] = o.astype(out_ref.dtype)


def packed_window_attention(qkv: jax.Array, bias: jax.Array,
                            regions: np.ndarray | None, heads: int,
                            wb: int | None = None,
                            interpret: bool | None = None) -> jax.Array:
    """Window attention context, WB windows packed per MXU issue.

    Not independently jitted: callers trace it inside their own jit (the
    region-id table is trace-time numpy geometry, not a device array).

    qkv:     (Bw, n, 3C) fused projection output (see
             ``fused_window_attention``).
    bias:    (heads, n, n) float32 relative-position bias.
    regions: (nW, n) integer region ids (``models.swin._shift_regions``),
             host numpy, or None for unshifted layers.  ``Bw % nW == 0``.
    wb:      windows packed per program (must divide Bw); default picks
             the largest of 8/4/2 whose additive tensor fits ~12 MB VMEM.
    Returns (Bw, n, C) in qkv.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Bw, n, C3 = qkv.shape
    C = C3 // 3
    if C % heads:
        raise ValueError(f"C={C} not divisible by heads={heads}")
    scale = float((C // heads) ** -0.5)
    shifted = regions is not None
    nW = int(regions.shape[0]) if shifted else 1
    if shifted and Bw % nW:
        raise ValueError(f"Bw={Bw} not a multiple of nW={nW}")
    # Mosaic block constraint: the sublane (rows) dim of every block must
    # be a multiple of 8 — for n=49 that means wb ∈ {8, 16, …}.
    if wb is None:
        # 8 first: both microbench runs had wb=8 beating wb=16 at the
        # Swin-B stage-0/1 shapes (bigger packs pay p× score/softmax
        # waste without further issue savings — see PROFILE.md).
        for cand in (8, 16, 4, 2):
            if (Bw % cand == 0 and (cand * n) % 8 == 0
                    and heads * (cand * n) ** 2 * 4 <= 32 * 2 ** 20):
                wb = cand
                break
        else:
            # No valid packing (tiny Bw or huge heads·n): per-window kernel.
            mask = None
            if shifted:
                r = np.asarray(regions)
                mask = jnp.asarray(np.where(
                    r[:, None, :] != r[:, :, None], -100.0, 0.0
                ).astype(np.float32))
            return fused_window_attention(qkv, bias, mask, heads=heads,
                                          interpret=interpret)
    elif Bw % wb:
        raise ValueError(f"wb={wb} must divide Bw={Bw}")
    elif (wb * n) % 8 and not interpret:
        raise ValueError(
            f"wb·n = {wb * n} must be a multiple of 8 (Mosaic sublane "
            f"block constraint)")
    WBn = wb * n

    # Additive tensor: relative-position bias tiled across window blocks
    # (off-diagonal copies are dead — see −1e5 below) + the block-diagonal
    # packing mask.
    offdiag = np.full((WBn, WBn), -1e5, np.float32)
    for j in range(wb):
        offdiag[j * n:(j + 1) * n, j * n:(j + 1) * n] = 0.0
    t = jnp.broadcast_to(
        bias.astype(jnp.float32)[:, None, :, None, :], (heads, wb, n, wb, n)
    ).reshape(heads, WBn, WBn) + jnp.asarray(offdiag)

    # Region-id row/col vectors per packing pattern: program i covers
    # windows (i·wb + j) mod nW, so the slot→window map depends only on
    # (i·wb) mod nW — nW/gcd distinct patterns, cycled by the index map.
    if shifted:
        g = math.gcd(wb, nW)
        npat = nW // g
        regs = np.asarray(regions, np.float32)
        rpat = np.stack([
            np.concatenate([regs[(p * g + j) % nW] for j in range(wb)])
            for p in range(npat)
        ])  # (npat, WBn)
        rrow = jnp.asarray(rpat[:, :, None])
        rcol = jnp.asarray(rpat[:, None, :])

        def r_index(i):
            return (((i * wb) % nW) // g, 0, 0)
    else:
        rrow = jnp.zeros((1, WBn, 1), jnp.float32)
        rcol = jnp.zeros((1, 1, WBn), jnp.float32)

        def r_index(i):
            return (0, 0, 0)

    kernel = partial(_packed_kernel, heads=heads, C=C, scale=scale,
                     shifted=shifted)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bw * n, C), qkv.dtype),
        grid=(Bw // wb,),
        in_specs=[
            pl.BlockSpec((WBn, C3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, WBn, WBn), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WBn, 1), r_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, WBn), r_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((WBn, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkv.reshape(Bw * n, C3), t, rrow, rcol)
    return out.reshape(Bw, n, C)
