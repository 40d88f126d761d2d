"""Perspective-n-Point: DLT init + jitted LM refine.

TPU-native replacement of `cv.solvePnP` (reference utils.py:661-662, used
by `get_world_space_origin` to anchor the world frame to a checkerboard).
DLT solves the 2N×12 system for the projection matrix of NORMALIZED,
undistorted image points, decomposes to (R, t) with SVD orthogonalization,
then LM-refines the 6-dof pose on full (distorted) reprojection error.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import project_points, rodrigues_vector
from ..ops.undistort import undistort_points
from .lm import levenberg_marquardt

__all__ = ["solve_pnp"]


def _dlt_pnp(obj_pts: jax.Array, norm_pts: jax.Array):
    """P (3,4) from 3D↔normalized-2D correspondences via DLT."""
    X = obj_pts
    ones = jnp.ones_like(X[:, :1])
    Xh = jnp.concatenate([X, ones], axis=-1)  # (N, 4)
    u = norm_pts[:, 0:1]
    v = norm_pts[:, 1:2]
    zeros = jnp.zeros_like(Xh)
    r1 = jnp.concatenate([Xh, zeros, -u * Xh], axis=-1)  # (N, 12)
    r2 = jnp.concatenate([zeros, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    return Vt[-1].reshape(3, 4)


def _pose_nonplanar(obj_points, norm):
    """DLT-12 init for general (non-coplanar) point clouds."""
    P = _dlt_pnp(obj_points, norm)
    M = P[:, :3]
    scale = jnp.cbrt(jnp.abs(jnp.linalg.det(M)))
    sign = jnp.sign(jnp.linalg.det(M))
    M = M * sign / jnp.maximum(scale, 1e-12)
    t = P[:, 3] * sign / jnp.maximum(scale, 1e-12)
    U, _, Vt = jnp.linalg.svd(M)
    R = U @ Vt
    # Ensure the object sits in front of the camera.
    cam_z = (obj_points @ R.T + t)[:, 2]
    flip = jnp.mean(cam_z) < 0
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    # det(R) must stay +1 after any flip (−R has det −1 for 3×3).
    U2, _, Vt2 = jnp.linalg.svd(R)
    d = jnp.sign(jnp.linalg.det(U2 @ Vt2))
    D = jnp.diag(jnp.array([1.0, 1.0, 0.0], R.dtype)) + jnp.diag(
        jnp.array([0.0, 0.0, 1.0], R.dtype)
    ) * d
    R = U2 @ D @ Vt2
    return R, t


def _pose_planar(obj_points, norm):
    """Homography init for coplanar clouds (the checkerboard case — the
    12-parameter DLT is rank-deficient there)."""
    from .homography import find_homography

    mean = jnp.mean(obj_points, axis=0)
    centered = obj_points - mean
    _, _, Vt = jnp.linalg.svd(centered, full_matrices=False)
    e1, e2 = Vt[0], Vt[1]
    e3 = jnp.cross(e1, e2)
    uv = jnp.stack([centered @ e1, centered @ e2], axis=-1)  # plane coords
    H = find_homography(uv, norm)  # K = I in normalized coordinates
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / jnp.maximum(jnp.linalg.norm(h1), 1e-12)
    # In-front disambiguation: flip λ if the plane centre lands behind.
    lam = jnp.where(h3[2] * lam < 0, -lam, lam)
    r1 = lam * h1
    r2 = lam * h2
    r3 = jnp.cross(r1, r2)
    Rp = jnp.stack([r1, r2, r3], axis=1)  # plane frame -> camera
    U, _, Vt2 = jnp.linalg.svd(Rp)
    Rp = U @ Vt2
    Rp = Rp * jnp.sign(jnp.linalg.det(Rp))
    tp = lam * h3
    E = jnp.stack([e1, e2, e3], axis=1)  # world -> plane basis (orthonormal)
    R = Rp @ E.T
    t = tp - R @ mean
    return R, t


def solve_pnp(obj_points, img_points, K, dist=None, n_lm_iter: int = 40):
    """Pose of ≥6 3D points observed at pixel positions.

    Handles both general and coplanar clouds (checkerboards): the init is
    selected by the cloud's planarity (smallest/largest singular value of
    the centered points) with `jnp.where` — static shapes, vmappable.
    Returns ``(rvec (3,), tvec (3,))`` — axis-angle like `cv.solvePnP`.
    """
    obj_points = jnp.asarray(obj_points)
    img_points = jnp.asarray(img_points)
    K = jnp.asarray(K)

    norm = undistort_points(img_points, K, dist)  # normalized coordinates

    R_g, t_g = _pose_nonplanar(obj_points, norm)
    R_p, t_p = _pose_planar(obj_points, norm)
    sv = jnp.linalg.svd(obj_points - jnp.mean(obj_points, axis=0), compute_uv=False)
    planar = sv[-1] < 1e-6 * jnp.maximum(sv[0], 1e-12)
    R = jnp.where(planar, R_p, R_g)
    t = jnp.where(planar, t_p, t_g)

    rvec0 = rodrigues_vector(R)
    x0 = jnp.concatenate([rvec0, t])

    d_coef = None if dist is None else jnp.asarray(dist).reshape(-1)

    def residuals(x):
        proj = project_points(obj_points, K, x[:3], x[3:], dist_coeffs=d_coef)
        return (proj - img_points).reshape(-1)

    x, _, _ = levenberg_marquardt(residuals, x0, n_iter=n_lm_iter)
    return x[:3], x[3:]
