"""Heatmap keypoint decode: argmax + sub-pixel refinement (batched jnp).

TPU-native equivalent of MMPose's top-down heatmap decode (the model-zoo
C++/torch path behind mmpose_pose_estimation.py:253-254): per-joint argmax,
a ±0.25-pixel shift toward the larger neighbour, and the peak value as the
keypoint score.  All joints/frames/cameras decode in one fused program —
no Python loops, no host round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["heatmap_argmax_decode", "heatmap_dark_decode"]


def heatmap_argmax_decode(
    heatmaps: jax.Array,
    shift: float = 0.25,
) -> tuple[jax.Array, jax.Array]:
    """Decode heatmaps (..., H, W) -> (xy (..., 2), score (...,)).

    ``xy`` is in heatmap pixel coordinates (callers rescale to image space
    via the inverse of the top-down crop affine).  The quarter-pixel offset
    follows the standard MMPose/SimpleBaselines convention.
    """
    heatmaps = jnp.asarray(heatmaps)
    H, W = heatmaps.shape[-2], heatmaps.shape[-1]
    flat = heatmaps.reshape(heatmaps.shape[:-2] + (H * W,))
    idx = jnp.argmax(flat, axis=-1)
    score = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    y = (idx // W).astype(jnp.int32)
    x = (idx % W).astype(jnp.int32)

    def at(yy, xx):
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        lin = yy * W + xx
        return jnp.take_along_axis(flat, lin[..., None], axis=-1)[..., 0]

    dx = jnp.sign(at(y, x + 1) - at(y, x - 1))
    dy = jnp.sign(at(y + 1, x) - at(y - 1, x))
    fx = x.astype(flat.dtype) + shift * dx
    fy = y.astype(flat.dtype) + shift * dy
    xy = jnp.stack([fx, fy], axis=-1)
    return xy, score


def heatmap_dark_decode(
    heatmaps: jax.Array,
    blur_kernel: int = 11,
    eps: float = 1e-10,
) -> tuple[jax.Array, jax.Array]:
    """DARK/UDP-style decode: argmax + log-Taylor sub-pixel refinement.

    The distribution-aware refinement MMPose's UDP codecs use (the decode
    convention SURVEY.md §7 lists under "hard parts"): Gaussian-smooth the
    map, take log, and correct the argmax by −H⁻¹∇ evaluated with central
    differences — unbiased sub-pixel peaks instead of the ±0.25 shift.

    ``heatmaps``: (..., H, W) → (xy (..., 2) heatmap pixels, score (...,)).
    Fully batched: the 3×3 neighbourhood is gathered with clamped linear
    indices; the 2×2 Hessian solve is closed-form.
    """
    heatmaps = jnp.asarray(heatmaps)
    H, W = heatmaps.shape[-2], heatmaps.shape[-1]

    # Separable Gaussian blur (sigma from kernel size, cv2 convention).
    k = int(blur_kernel) | 1
    sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
    xs = jnp.arange(k, dtype=heatmaps.dtype) - (k - 1) / 2.0
    g = jnp.exp(-(xs * xs) / (2.0 * sigma * sigma))
    g = g / jnp.sum(g)

    flat_shape = heatmaps.shape[:-2]
    hm = heatmaps.reshape((-1, H, W))
    peak = jnp.max(hm, axis=(-2, -1), keepdims=True)
    pad = k // 2

    def blur1d(x, axis):
        moved = jnp.moveaxis(x, axis, -1)
        padded = jnp.pad(moved, [(0, 0)] * (moved.ndim - 1) + [(pad, pad)])
        out = jax.vmap(lambda row: jnp.convolve(row, g, mode="valid"))(
            padded.reshape(-1, padded.shape[-1])
        ).reshape(moved.shape)
        return jnp.moveaxis(out, -1, axis)

    sm = blur1d(blur1d(hm, -1), -2)
    # Re-normalize to the original peak (cv2.GaussianBlur + renorm in DARK).
    sm = sm * peak / jnp.maximum(jnp.max(sm, axis=(-2, -1), keepdims=True), eps)
    lg = jnp.log(jnp.maximum(sm, eps))

    flat = hm.reshape(hm.shape[0], -1)
    idx = jnp.argmax(flat, axis=-1)
    score = jnp.take_along_axis(flat, idx[:, None], axis=-1)[:, 0]
    x0 = (idx % W).astype(jnp.int32)
    y0 = (idx // W).astype(jnp.int32)

    lgf = lg.reshape(lg.shape[0], -1)

    def at(dy, dx):
        yy = jnp.clip(y0 + dy, 0, H - 1)
        xx = jnp.clip(x0 + dx, 0, W - 1)
        return jnp.take_along_axis(lgf, (yy * W + xx)[:, None], axis=-1)[:, 0]

    dx = 0.5 * (at(0, 1) - at(0, -1))
    dy = 0.5 * (at(1, 0) - at(-1, 0))
    dxx = 0.25 * (at(0, 2) - 2.0 * at(0, 0) + at(0, -2))
    dyy = 0.25 * (at(2, 0) - 2.0 * at(0, 0) + at(-2, 0))
    dxy = 0.25 * (at(1, 1) - at(1, -1) - at(-1, 1) + at(-1, -1))

    det = dxx * dyy - dxy * dxy
    ok = jnp.abs(det) > eps
    det_safe = jnp.where(ok, det, 1.0)
    off_x = -(dyy * dx - dxy * dy) / det_safe
    off_y = -(dxx * dy - dxy * dx) / det_safe
    off_x = jnp.where(ok, jnp.clip(off_x, -1.0, 1.0), 0.0)
    off_y = jnp.where(ok, jnp.clip(off_y, -1.0, 1.0), 0.0)

    xy = jnp.stack([x0.astype(lg.dtype) + off_x, y0.astype(lg.dtype) + off_y], axis=-1)
    return xy.reshape(flat_shape + (2,)), score.reshape(flat_shape)
