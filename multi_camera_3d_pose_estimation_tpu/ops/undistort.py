"""Iterative point undistortion (jnp, batched, jittable).

TPU-native replacement of the reference's `cv.undistortPoints` call at
utils.py:1314-1315 (OpenCV's C++ iterative inverse-distortion).  The
fixed-point iteration is UNROLLED (static trip count): the per-iteration
tensor is tiny (~10s of KB for a full block's keypoints), so a device-side
while loop would pay per-iteration kernel-launch overhead ~10× the math —
unrolled, XLA fuses all iterations into one elementwise kernel (measured
~1 ms/block saved in the headline trace, PROFILE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["undistort_points", "normalize_pixels"]


def normalize_pixels(pts: jax.Array, K: jax.Array) -> jax.Array:
    """Pixel coordinates (..., 2) -> normalized camera coordinates (..., 2)."""
    K = jnp.asarray(K)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    skew = K[0, 1]
    y = (pts[..., 1] - cy) / fy
    x = (pts[..., 0] - cx - skew * y) / fx
    return jnp.stack([x, y], axis=-1)


def undistort_points(
    pts: jax.Array,
    K: jax.Array,
    dist: jax.Array | None,
    P: jax.Array | None = None,
    n_iter: int = 10,
) -> jax.Array:
    """Invert the 5-coefficient distortion model for pixel points (..., 2).

    Semantics match `cv.undistortPoints(pts, K, dist, None, P)`:
    normalize by ``K``, iterate the fixed-point inverse of the
    (k1,k2,p1,p2,k3) model, then optionally re-project with ``P`` (the
    reference passes P=K so triangulation runs in pixel units,
    utils.py:1314-1315).  ``dist=None`` or all-zeros is a no-op inverse.

    ``n_iter`` is static (default 10 > OpenCV's 5 for a tighter inverse;
    set 5 for bit-closer OpenCV parity).
    """
    pts = jnp.asarray(pts)
    xy0 = normalize_pixels(pts, K)

    if dist is not None:
        d = jnp.asarray(dist).reshape(-1)
        k1, k2, p1, p2, k3 = d[0], d[1], d[2], d[3], d[4]

        def body(xy):
            x, y = xy[..., 0], xy[..., 1]
            r2 = x * x + y * y
            icdist = 1.0 / (1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2)
            dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
            dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
            xn = (xy0[..., 0] - dx) * icdist
            yn = (xy0[..., 1] - dy) * icdist
            return jnp.stack([xn, yn], axis=-1)

        xy = xy0
        for _ in range(n_iter):  # unrolled: fuses into ONE kernel (see top)
            xy = body(xy)
    else:
        xy = xy0

    if P is None:
        return xy
    P = jnp.asarray(P)
    if P.shape == (3, 3):
        # Treat as a camera matrix.
        fx, fy = P[0, 0], P[1, 1]
        cx, cy = P[0, 2], P[1, 2]
        skew = P[0, 1]
        u = fx * xy[..., 0] + skew * xy[..., 1] + cx
        v = fy * xy[..., 1] + cy
        return jnp.stack([u, v], axis=-1)
    # Full 3x4 projection of the normalized ray (z=1).
    ones = jnp.ones_like(xy[..., :1])
    ray = jnp.concatenate([xy, ones, ones], axis=-1)
    uvw = jnp.einsum("ij,...j->...i", P, ray,
                     precision=jax.lax.Precision.HIGHEST)
    return uvw[..., :2] / uvw[..., 2:3]
