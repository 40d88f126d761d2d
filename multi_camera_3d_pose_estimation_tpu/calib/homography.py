"""Planar homography estimation (normalized DLT) — closed form, batched.

Building block for Zhang-style intrinsic calibration (the math inside
OpenCV's `cv.calibrateCamera` init stage, which the reference calls at
utils.py:196).  Hartley-normalized 9-parameter DLT solved with the SVD of
the stacked 2N×9 system; vmappable over views.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["find_homography"]


def _normalize_2d(pts: jax.Array):
    """Similarity transform sending points to mean 0, mean radius √2."""
    mean = jnp.mean(pts, axis=0)
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1))
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.mean(d), 1e-12)
    T = jnp.array(
        [
            [scale, 0.0, -scale * mean[0]],
            [0.0, scale, -scale * mean[1]],
            [0.0, 0.0, 1.0],
        ],
        pts.dtype,
    )
    return (pts - mean) * scale, T


def find_homography(src: jax.Array, dst: jax.Array) -> jax.Array:
    """H (3,3) with dst ~ H @ src for planar points src/dst (N, 2)."""
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    sn, Ts = _normalize_2d(src)
    dn, Td = _normalize_2d(dst)
    N = src.shape[0]
    X, Y = sn[:, 0], sn[:, 1]
    u, v = dn[:, 0], dn[:, 1]
    zeros = jnp.zeros_like(X)
    ones = jnp.ones_like(X)
    r1 = jnp.stack([X, Y, ones, zeros, zeros, zeros, -u * X, -u * Y, -u], axis=-1)
    r2 = jnp.stack([zeros, zeros, zeros, X, Y, ones, -v * X, -v * Y, -v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2N, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    Hn = Vt[-1].reshape(3, 3)
    H = jnp.linalg.solve(Td, Hn @ Ts)
    return H / H[2, 2]
