"""Pose augmentation: flip with joint swapping, random affine parameters.

Device-side, key-driven (no host RNG in the step).  The horizontal-flip
joint permutation comes from the skeleton metadata's ``swap`` table
(utils.skeleton.POINT_INFO — the same table the reference carries at
utils.py:1076-1161), so left/right joints exchange labels correctly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.skeleton import POINT_INFO

__all__ = ["flip_permutation", "random_flip_pose", "random_affine_params"]


def flip_permutation(connectivity_type: str = "coco") -> np.ndarray:
    """Joint index permutation under horizontal flip (swap left↔right)."""
    info = POINT_INFO[connectivity_type]
    name_to_idx = {v["name"]: k for k, v in info.items()}
    perm = np.arange(len(info))
    for idx, entry in info.items():
        if entry["swap"]:
            perm[idx] = name_to_idx[entry["swap"]]
    return perm


def random_flip_pose(key, images, keypoints, visibility, perm,
                     prob: float = 0.5):
    """Randomly mirror images (B, H, W, C) + keypoints (B, K, 2) together."""
    B = images.shape[0]
    W = images.shape[2]
    do = jax.random.bernoulli(key, prob, (B,))
    flipped = images[:, :, ::-1]
    images = jnp.where(do[:, None, None, None], flipped, images)
    kp_f = keypoints.at[..., 0].set(W - 1 - keypoints[..., 0])[:, perm]
    keypoints = jnp.where(do[:, None, None], kp_f, keypoints)
    visibility = jnp.where(do[:, None], visibility[:, perm], visibility)
    return images, keypoints, visibility


def random_affine_params(key, batch: int, scale_range=(0.75, 1.25),
                         rot_deg: float = 30.0, translate_frac: float = 0.1):
    """Sample per-item (scale (B,), rotation rad (B,), translation (B, 2)).

    Consumed by the top-down crop (scale/translate fold into the crop box;
    rotation is applied by rotating the KEYPOINT targets — axis-aligned
    crops keep `jax.image.scale_and_translate` as the only resampler).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    scale = jax.random.uniform(k1, (batch,), minval=scale_range[0], maxval=scale_range[1])
    rot = jax.random.uniform(k2, (batch,), minval=-1.0, maxval=1.0) * (
        rot_deg * jnp.pi / 180.0
    )
    trans = jax.random.uniform(k3, (batch, 2), minval=-translate_frac, maxval=translate_frac)
    return scale, rot, trans
