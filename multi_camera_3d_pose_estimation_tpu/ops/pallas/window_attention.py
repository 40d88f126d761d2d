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

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_window_attention"]


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
