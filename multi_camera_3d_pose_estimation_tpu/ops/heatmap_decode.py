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

__all__ = ["heatmap_argmax_decode"]


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
