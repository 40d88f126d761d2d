"""Pallas TPU kernel: single-pass heatmap decode (moments + argmax).

Computes, per heatmap, the thresholded Gaussian moments
[Σv, Σvx, Σvy, Σvx², Σvxy, Σvy²] (ops.moments), the raw argmax + peak
(ops.heatmap_decode), and the 4 argmax neighbours for the ±0.25 sub-pixel
shift — one kernel, one read of the heatmap.

**Measured verdict (TPU v5e): keep this OFF.**  XLA fuses the "multi-pass"
jnp decode into a single loop over the input already (256×17 maps of
64×48 decode in ~45 µs ≈ memory-bandwidth-bound), while this kernel runs
~2.3 ms — the per-program grid overhead plus the masked-reduction
neighbour extraction (4 extra full-block passes) lose to XLA's fusion by
~50×.  It is kept in-tree as (a) the measured evidence for WHY the decode
stays in plain jnp, and (b) a working template for Pallas reduction
kernels on this toolchain, which required three non-obvious workarounds:

- output block sublane dim must be 8 → process 8 maps per program;
- `reshape`+`argmax` and any rank-1 intermediate SIGABRT the Mosaic
  compiler (`layout.h` check) → argmax as max + masked min-linear-index,
  all intermediates kept rank-2 (M, 1);
- dynamic scalar loads from values don't lower → neighbour extraction as
  masked reductions.

Enable explicitly via `TopDownEstimator(use_fused_decode=True)` or direct
calls; falls back to interpret mode off-TPU.  Semantics are identical to
the jnp pair (same thresholding, zero-sum → zero moments, quarter-pixel
shift); raw-moment centering costs ≤1e-3 absolute on covariance terms.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_heatmap_decode"]

_LANES = 128
_N_OUT = 128  # 6 raw moments + max + argmax + 4 neighbours; padded to one
# full 128-lane row (TPU block tiling requires the last dim be 128)
_MAPS = 8  # heatmaps per program (8-sublane output block)


def _decode_kernel(hm_ref, out_ref, *, W: int, threshold: float):
    hm = hm_ref[:]  # (_MAPS, S, 128) — 8 heatmaps per program (output
    # tiling needs an 8-row sublane block)
    M, S = hm.shape[0], hm.shape[1]
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (S, _LANES), 1)
    )
    xf = (lin % W).astype(jnp.float32)[None]
    yf = (lin // W).astype(jnp.float32)[None]

    # All intermediates stay rank-2 (M, 1): this Mosaic toolchain trips a
    # layout check ("arr.size() >= layout_rank") on rank-1 vectors.
    def rsum(a):  # (M, S, 128) -> (M, 1)
        return jnp.sum(jnp.sum(a, axis=2), axis=1, keepdims=True)

    v = jnp.where(hm < threshold, 0.0, hm)  # moment threshold (ref :166)
    s0 = rsum(v)
    sx = rsum(v * xf)
    sy = rsum(v * yf)
    sxx = rsum(v * xf * xf)
    sxy = rsum(v * xf * yf)
    syy = rsum(v * yf * yf)

    # Raw-heatmap argmax as max + masked min-linear-index (first occurrence,
    # matching jnp.argmax row-major semantics).
    peak = jnp.max(jnp.max(hm, axis=2), axis=1, keepdims=True)  # (M, 1)
    is_peak = hm == peak[:, :, None]
    big = jnp.int32(S * _LANES)
    masked = jnp.where(is_peak, lin[None], big)
    amax = jnp.min(jnp.min(masked, axis=2), axis=1, keepdims=True)  # (M, 1)
    ax = amax % W
    ay = amax // W
    H = (S * _LANES) // W

    def at(yy, xx):
        # Neighbour extraction as a masked reduction: dynamic scalar loads
        # don't lower in Pallas TPU, but the data is already in registers —
        # one compare + select + sum per neighbour is pure VPU work.
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        tgt = (yy * W + xx)[:, :, None]  # (M, 1, 1)
        mask = lin[None] == tgt
        return rsum(jnp.where(mask, hm, 0.0))  # (M, 1)

    # Write-out as broadcast-selects on the lane index.
    lane = jax.lax.broadcasted_iota(jnp.int32, (M, _N_OUT), 1)
    vals = (
        s0, sx, sy, sxx, sxy, syy, peak, amax.astype(jnp.float32),
        at(ay, ax + 1), at(ay, ax - 1), at(ay + 1, ax), at(ay - 1, ax),
    )
    out = jnp.zeros((M, _N_OUT), jnp.float32)
    for k, vk in enumerate(vals):
        out = out + jnp.where(lane == k, vk, 0.0)
    out_ref[:, :] = out


@partial(jax.jit, static_argnames=("threshold", "shift", "interpret"))
def fused_heatmap_decode(
    heatmaps: jax.Array,
    threshold: float = 0.01,
    shift: float = 0.25,
    interpret: bool | None = None,
):
    """One-pass decode of heatmaps (..., H, W) → (moments (..., 6),
    xy (..., 2), score (...,)).

    Semantics match `ops.heatmap_moments` + `ops.heatmap_argmax_decode`
    exactly (same thresholding, zero-sum → zero moments, quarter-pixel
    shift toward the larger neighbour).  Requires H·W divisible by 128;
    callers fall back to the jnp pair otherwise.
    """
    heatmaps = jnp.asarray(heatmaps, jnp.float32)
    *batch, H, W = heatmaps.shape
    HW = H * W
    if HW % _LANES:
        raise ValueError(f"H*W = {HW} must be divisible by {_LANES}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = 1
    for b in batch:
        N *= b
    Np = ((N + _MAPS - 1) // _MAPS) * _MAPS  # pad to whole programs
    flat = heatmaps.reshape(N, HW // _LANES, _LANES)
    if Np != N:
        flat = jnp.pad(flat, ((0, Np - N), (0, 0), (0, 0)))

    out = pl.pallas_call(
        partial(_decode_kernel, W=W, threshold=float(threshold)),
        out_shape=jax.ShapeDtypeStruct((Np, _N_OUT), jnp.float32),
        grid=(Np // _MAPS,),
        in_specs=[
            pl.BlockSpec(
                (_MAPS, HW // _LANES, _LANES),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (_MAPS, _N_OUT), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(flat)
    out = out[:N]

    s0 = out[:, 0]
    empty = s0 <= 0
    denom = jnp.where(empty, 1.0, s0)
    mean_x = out[:, 1] / denom
    mean_y = out[:, 2] / denom
    var_x = out[:, 3] / denom - mean_x * mean_x
    var_y = out[:, 5] / denom - mean_y * mean_y
    cov_xy = out[:, 4] / denom - mean_x * mean_y
    moments = jnp.stack([mean_x, mean_y, var_x, cov_xy, cov_xy, var_y], axis=-1)
    moments = jnp.where(empty[:, None], 0.0, moments)

    amax = out[:, 7].astype(jnp.int32)
    ax = (amax % W).astype(jnp.float32)
    ay = (amax // W).astype(jnp.float32)
    dx = jnp.sign(out[:, 8] - out[:, 9])
    dy = jnp.sign(out[:, 10] - out[:, 11])
    xy = jnp.stack([ax + shift * dx, ay + shift * dy], axis=-1)
    score = out[:, 6]

    bshape = tuple(batch)
    return (
        moments.reshape(bshape + (6,)),
        xy.reshape(bshape + (2,)),
        score.reshape(bshape),
    )
