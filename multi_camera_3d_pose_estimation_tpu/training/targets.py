"""Supervised target rendering: Gaussian heatmaps and SimCC label vectors.

Batched, jittable renderers for the two decode families:
- `render_heatmap_targets`: per-joint 2D Gaussian maps (the MSE targets of
  SimpleBaselines/HRNet training; σ in heatmap pixels).
- `render_simcc_targets`: per-axis 1-D Gaussian label vectors at
  split_ratio× resolution (RTMPose's soft classification targets).

Both mask invisible joints (visibility ≤ 0) to zero targets + a weight
mask so losses ignore them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["render_heatmap_targets", "render_simcc_targets"]


def render_heatmap_targets(
    keypoints: jax.Array,  # (..., K, 2) in heatmap pixels
    visibility: jax.Array,  # (..., K) > 0 where labeled
    heatmap_size: tuple[int, int],  # (H, W)
    sigma: float = 2.0,
):
    """Returns (targets (..., K, H, W), weights (..., K))."""
    H, W = heatmap_size
    kp = jnp.asarray(keypoints)
    vis = jnp.asarray(visibility) > 0
    ys = jnp.arange(H, dtype=kp.dtype)[:, None]
    xs = jnp.arange(W, dtype=kp.dtype)[None, :]
    dx = xs - kp[..., 0][..., None, None]
    dy = ys - kp[..., 1][..., None, None]
    hm = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    inside = (
        (kp[..., 0] >= 0) & (kp[..., 0] < W) & (kp[..., 1] >= 0) & (kp[..., 1] < H)
    )
    w = (vis & inside).astype(kp.dtype)
    return hm * w[..., None, None], w


def render_simcc_targets(
    keypoints: jax.Array,  # (..., K, 2) in input pixels
    visibility: jax.Array,  # (..., K)
    input_size: tuple[int, int],  # (W, H)
    split_ratio: float = 2.0,
    sigma: float = 6.0,
):
    """Returns (x_labels (..., K, Wx), y_labels (..., K, Wy), weights).

    Labels are normalized Gaussians (soft one-hot) in bin space; σ is in
    BINS (RTMPose's convention).
    """
    Wpix, Hpix = input_size
    Wx = int(Wpix * split_ratio)
    Wy = int(Hpix * split_ratio)
    kp = jnp.asarray(keypoints) * split_ratio
    vis = jnp.asarray(visibility) > 0

    def axis_labels(loc, n):
        bins = jnp.arange(n, dtype=kp.dtype)
        g = jnp.exp(-((bins - loc[..., None]) ** 2) / (2.0 * sigma * sigma))
        norm = jnp.sum(g, axis=-1, keepdims=True)
        return g / jnp.maximum(norm, 1e-12)

    x_lab = axis_labels(kp[..., 0], Wx)
    y_lab = axis_labels(kp[..., 1], Wy)
    inside = (
        (kp[..., 0] >= 0) & (kp[..., 0] < Wx) & (kp[..., 1] >= 0) & (kp[..., 1] < Wy)
    )
    w = (vis & inside).astype(kp.dtype)
    return x_lab * w[..., None], y_lab * w[..., None], w
