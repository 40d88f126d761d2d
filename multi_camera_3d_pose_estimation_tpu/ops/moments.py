"""Heatmap → 2D Gaussian moment compression (the `(K,6)` decode).

TPU-native, fully batched replacement of the reference's per-joint torch
loop `PoseEstimator.get_heatmap_means_cov` (mmpose_pose_estimation.py:163-215):
threshold values <0.01 to 0 (exactly as the reference does at :166 — this
materially changes the moments and is required for refinement parity),
normalize each map to a distribution, then compute
[mean_x, mean_y, var_x, cov_xy, cov_xy, var_y].

Zero-sum heatmaps return all-zero rows (reference :191-192).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["heatmap_moments"]


def heatmap_moments(heatmaps: jax.Array, threshold: float = 0.01) -> jax.Array:
    """Compress heatmaps (..., H, W) to Gaussian moments (..., 6).

    The leading axes are arbitrary (time, cameras, joints all batch).  One
    fused pass: XLA keeps the coordinate grids, masking and the five weighted
    reductions in registers — this is the "on-device decode" that replaces
    host-side per-joint loops.
    """
    heatmaps = jnp.asarray(heatmaps)
    H, W = heatmaps.shape[-2], heatmaps.shape[-1]
    dtype = heatmaps.dtype if jnp.issubdtype(heatmaps.dtype, jnp.floating) else jnp.float32
    hm = heatmaps.astype(dtype)
    hm = jnp.where(hm < threshold, jnp.zeros_like(hm), hm)

    ys = jnp.arange(H, dtype=dtype)[:, None]  # (H,1)
    xs = jnp.arange(W, dtype=dtype)[None, :]  # (1,W)

    total = jnp.sum(hm, axis=(-2, -1))  # (...,)
    empty = total <= 0
    denom = jnp.where(empty, jnp.ones_like(total), total)

    mean_x = jnp.sum(hm * xs, axis=(-2, -1)) / denom
    mean_y = jnp.sum(hm * ys, axis=(-2, -1)) / denom
    dx = xs - mean_x[..., None, None]
    dy = ys - mean_y[..., None, None]
    var_x = jnp.sum(hm * dx * dx, axis=(-2, -1)) / denom
    var_y = jnp.sum(hm * dy * dy, axis=(-2, -1)) / denom
    cov_xy = jnp.sum(hm * dx * dy, axis=(-2, -1)) / denom

    out = jnp.stack([mean_x, mean_y, var_x, cov_xy, cov_xy, var_y], axis=-1)
    return jnp.where(empty[..., None], jnp.zeros_like(out), out)
