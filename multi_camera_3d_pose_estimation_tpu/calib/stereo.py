"""Stereo extrinsic calibration with fixed intrinsics (jitted LM).

TPU-native replacement of `cv.stereoCalibrate(..., CALIB_FIX_INTRINSIC)`
(reference utils.py:412-413): estimate the rigid transform (R, T) of
camera 1 w.r.t. camera 0 from simultaneously captured checkerboard views.

Init: per-view PnP in each camera → per-view relative poses → chordal mean
of rotations (SVD of the summed matrices) + mean translation.
Refine: joint LM over [rel rvec, rel tvec, (board rvec, tvec) × views]
minimizing reprojection error in BOTH cameras, intrinsics fixed — the same
parameterization OpenCV uses under CALIB_FIX_INTRINSIC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import project_points, rodrigues_matrix, rodrigues_vector
from .lm import levenberg_marquardt
from .pnp import solve_pnp

__all__ = ["stereo_calibrate", "mean_rotation"]


def mean_rotation(Rs: jax.Array) -> jax.Array:
    """Chordal L2 mean of rotation matrices (V, 3, 3) via SVD projection."""
    M = jnp.sum(jnp.asarray(Rs), axis=0)
    U, _, Vt = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, d.astype(M.dtype)]))
    return U @ D @ Vt


def stereo_calibrate(
    obj_points,
    img_points0,
    img_points1,
    K0,
    dist0,
    K1,
    dist1,
    n_lm_iter: int = 60,
):
    """Returns ``(rmse, R (3,3), T (3,1))`` of camera 1 w.r.t. camera 0.

    - ``obj_points``: (V, N, 3) board coordinates per view (Z = 0 plane).
    - ``img_points0/1``: (V, N, 2) matching corner pixels in each camera.
    """
    obj_points = jnp.asarray(obj_points)
    img_points0 = jnp.asarray(img_points0)
    img_points1 = jnp.asarray(img_points1)
    K0 = jnp.asarray(K0)
    K1 = jnp.asarray(K1)
    d0 = None if dist0 is None else jnp.asarray(dist0).reshape(-1)
    d1 = None if dist1 is None else jnp.asarray(dist1).reshape(-1)
    V, N = obj_points.shape[0], obj_points.shape[1]
    dtype = img_points0.dtype

    # Per-view PnP in both cameras (vmapped).
    rv0, tv0 = jax.vmap(lambda o, i: solve_pnp(o, i, K0, d0))(obj_points, img_points0)
    rv1, tv1 = jax.vmap(lambda o, i: solve_pnp(o, i, K1, d1))(obj_points, img_points1)

    # Relative pose per view: cam1 = rel ∘ cam0  →  R_rel = R1 R0ᵀ,
    # t_rel = t1 − R_rel t0.
    R0s = rodrigues_matrix(rv0)
    R1s = rodrigues_matrix(rv1)
    R_rels = jnp.einsum("vij,vkj->vik", R1s, R0s)
    t_rels = tv1 - jnp.einsum("vij,vj->vi", R_rels, tv0)
    R_rel0 = mean_rotation(R_rels)
    t_rel0 = jnp.mean(t_rels, axis=0)

    x0 = jnp.concatenate(
        [
            rodrigues_vector(R_rel0),
            t_rel0,
            rv0.reshape(-1),
            tv0.reshape(-1),
        ]
    ).astype(dtype)

    def unpack(x):
        rel_rv = x[:3]
        rel_tv = x[3:6]
        rvs = x[6 : 6 + 3 * V].reshape(V, 3)
        tvs = x[6 + 3 * V :].reshape(V, 3)
        return rel_rv, rel_tv, rvs, tvs

    def residuals(x):
        rel_rv, rel_tv, rvs, tvs = unpack(x)
        R_rel = rodrigues_matrix(rel_rv)

        def view(rv, tv, op, ip0, ip1):
            r0 = project_points(op, K0, rv, tv, dist_coeffs=d0) - ip0
            R_board = rodrigues_matrix(rv)
            # Compose as matrices — differentiating a matrix→axis-angle
            # roundtrip (arccos) is numerically fragile near θ ∈ {0, π}.
            R_c1 = R_rel @ R_board
            t_c1 = R_rel @ tv + rel_tv
            r1 = project_points(op, K1, R_c1, t_c1, dist_coeffs=d1) - ip1
            return jnp.concatenate([r0.reshape(-1), r1.reshape(-1)])

        return jax.vmap(view)(rvs, tvs, obj_points, img_points0, img_points1).reshape(-1)

    x, final_cost, _ = levenberg_marquardt(residuals, x0, n_iter=n_lm_iter)
    rel_rv, rel_tv, _, _ = unpack(x)
    rmse = jnp.sqrt(final_cost / (2 * V * N))
    return (
        float(rmse),
        np.asarray(rodrigues_matrix(rel_rv)),
        np.asarray(rel_tv).reshape(3, 1),
    )
