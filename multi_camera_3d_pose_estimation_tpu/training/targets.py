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

__all__ = ["render_heatmap_targets", "render_simcc_targets",
           "render_centernet_targets"]


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


def render_centernet_targets(
    bboxes: jax.Array,  # (B, 4) xyxy in input pixels
    out_size: tuple[int, int],  # (h, w) of the stride-16 head maps
    stride: int = 16,
    min_radius: float = 1.0,
):
    """Targets for `losses.centernet_focal_loss` from top-1 person boxes.

    Returns (center (B,h,w) Gaussian-splattered ∈[0,1], wh (B,h,w,2) box
    sizes in input pixels, offset (B,h,w,2) sub-stride offsets, mask
    (B,h,w) = 1 at the centre pixel).  Radius follows the CenterNet paper's
    overlap-0.7 rule, clamped to ``min_radius``.
    """
    h, w = out_size
    b = jnp.asarray(bboxes, jnp.float32)
    cx = (b[:, 0] + b[:, 2]) * 0.5 / stride
    cy = (b[:, 1] + b[:, 3]) * 0.5 / stride
    bw = (b[:, 2] - b[:, 0]) / stride
    bh = (b[:, 3] - b[:, 1]) / stride

    # Gaussian radius for IoU >= 0.7 (CornerNet/CenterNet heuristic).
    def radius(width, height, min_overlap=0.7):
        a1 = 1.0
        b1 = height + width
        c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
        r1 = (b1 - jnp.sqrt(jnp.maximum(b1 * b1 - 4 * a1 * c1, 0.0))) / 2
        a2 = 4.0
        b2 = 2 * (height + width)
        c2 = (1 - min_overlap) * width * height
        r2 = (b2 - jnp.sqrt(jnp.maximum(b2 * b2 - 4 * a2 * c2, 0.0))) / (2 * a2)
        a3 = 4 * min_overlap
        b3 = -2 * min_overlap * (height + width)
        c3 = (min_overlap - 1) * width * height
        r3 = (b3 + jnp.sqrt(jnp.maximum(b3 * b3 - 4 * a3 * c3, 0.0))) / (2 * a3)
        return jnp.minimum(jnp.minimum(r1, r2), r3)

    r = jnp.maximum(radius(bw, bh), min_radius)
    sigma = r / 3.0

    ix = jnp.clip(jnp.floor(cx), 0, w - 1)
    iy = jnp.clip(jnp.floor(cy), 0, h - 1)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    dx = xs - ix[:, None, None]
    dy = ys - iy[:, None, None]
    center = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma)[:, None, None])

    mask = ((jnp.abs(dx) < 0.5) & (jnp.abs(dy) < 0.5)).astype(jnp.float32)
    wh = jnp.broadcast_to(
        jnp.stack([bw, bh], -1)[:, None, None, :] * stride, (b.shape[0], h, w, 2)
    )
    off = jnp.broadcast_to(
        jnp.stack([cx - ix, cy - iy], -1)[:, None, None, :], (b.shape[0], h, w, 2)
    )
    return center, wh, off, mask
