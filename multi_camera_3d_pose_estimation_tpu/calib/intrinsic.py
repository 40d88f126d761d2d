"""From-scratch intrinsic camera calibration: Zhang init + jitted LM refine.

TPU-native replacement of `cv.calibrateCamera` (Zhang's method + LM inside
OpenCV C++, called by the reference at utils.py:196; SURVEY.md §2.2 maps it
to "homography init (DLT per view) + jitted Gauss-Newton/LM in JAX over
intrinsics+distortion").

Pipeline:
1. Per-view planar homographies (normalized DLT, `calib.homography`).
2. Zhang's closed-form K from the image of the absolute conic (stacked
   v-constraints, SVD).
3. Per-view extrinsics from H columns through K⁻¹, SVD-orthogonalized.
4. Joint Levenberg-Marquardt over [fx, fy, cx, cy, k1, k2, p1, p2, k3,
   (rvec, tvec) × views] minimizing full reprojection error — one jitted
   program, matching OpenCV's default flags (skew fixed at 0, 5-coeff
   distortion model).

Returns RMSE exactly as the reference prints it (utils.py:197).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import project_points, rodrigues_vector
from .homography import find_homography
from .lm import levenberg_marquardt

__all__ = ["calibrate_camera", "zhang_intrinsics_init", "extrinsics_from_homography"]


def zhang_intrinsics_init(Hs: jax.Array) -> jax.Array:
    """K (3,3) from ≥3 homographies (V, 3, 3) via the absolute-conic system."""
    Hs = jnp.asarray(Hs)

    def v_ij(H, i, j):
        return jnp.stack(
            [
                H[0, i] * H[0, j],
                H[0, i] * H[1, j] + H[1, i] * H[0, j],
                H[1, i] * H[1, j],
                H[2, i] * H[0, j] + H[0, i] * H[2, j],
                H[2, i] * H[1, j] + H[1, i] * H[2, j],
                H[2, i] * H[2, j],
            ]
        )

    def constraints(H):
        return jnp.stack([v_ij(H, 0, 1), v_ij(H, 0, 0) - v_ij(H, 1, 1)])

    V = jax.vmap(constraints)(Hs).reshape(-1, 6)
    _, _, Vt = jnp.linalg.svd(V, full_matrices=False)
    b11, b12, b22, b13, b23, b33 = Vt[-1]

    v0 = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + v0 * (b12 * b13 - b11 * b23)) / b11
    alpha = jnp.sqrt(jnp.abs(lam / b11))
    beta = jnp.sqrt(jnp.abs(lam * b11 / (b11 * b22 - b12 * b12)))
    gamma = -b12 * alpha * alpha * beta / lam
    u0 = gamma * v0 / beta - b13 * alpha * alpha / lam
    # Skew is fixed to 0 downstream (OpenCV default); keep the closed form's
    # principal point and focals.
    return jnp.array(
        [[alpha, 0.0, u0], [0.0, beta, v0], [0.0, 0.0, 1.0]], Hs.dtype
    )


def extrinsics_from_homography(H: jax.Array, K: jax.Array):
    """(rvec (3,), tvec (3,)) of the plane from its homography."""
    Kinv = jnp.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / jnp.maximum(jnp.linalg.norm(Kinv @ h1), 1e-12)
    r1 = lam * (Kinv @ h1)
    r2 = lam * (Kinv @ h2)
    r3 = jnp.cross(r1, r2)
    R = jnp.stack([r1, r2, r3], axis=1)
    U, _, Vt = jnp.linalg.svd(R)
    R = U @ Vt
    # Keep det(R) = +1 (flip the sign the SVD projection may introduce).
    det = jnp.linalg.det(R)
    R = R * jnp.sign(det)
    t = lam * (Kinv @ h3) * jnp.sign(det)
    return rodrigues_vector(R), t


def calibrate_camera(
    obj_points,
    img_points,
    image_size=None,
    n_lm_iter: int = 60,
):
    """Calibrate one camera from V checkerboard views.

    - ``obj_points``: (V, N, 3) planar board coordinates (Z = 0) or (V, N, 2).
    - ``img_points``: (V, N, 2) detected corner pixels.

    Returns ``(rmse, K (3,3), dist (1,5), rvecs (V,3), tvecs (V,3))`` —
    the same tuple layout as `cv.calibrateCamera`.
    """
    obj_points = jnp.asarray(obj_points)
    img_points = jnp.asarray(img_points)
    if obj_points.shape[-1] == 2:
        obj_points = jnp.concatenate(
            [obj_points, jnp.zeros_like(obj_points[..., :1])], axis=-1
        )
    V, N = obj_points.shape[0], obj_points.shape[1]
    dtype = img_points.dtype

    # 1-3. Closed-form init.
    Hs = jax.vmap(find_homography)(obj_points[..., :2], img_points)
    K0 = zhang_intrinsics_init(Hs)
    rvecs0, tvecs0 = jax.vmap(extrinsics_from_homography, in_axes=(0, None))(Hs, K0)

    # 4. Joint LM over intrinsics + distortion + per-view poses.
    x0 = jnp.concatenate(
        [
            jnp.stack([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2]]),
            jnp.zeros(5, dtype),
            rvecs0.reshape(-1),
            tvecs0.reshape(-1),
        ]
    ).astype(dtype)

    def unpack(x):
        fx, fy, cx, cy = x[0], x[1], x[2], x[3]
        K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], x.dtype)
        dist = x[4:9]
        rvecs = x[9 : 9 + 3 * V].reshape(V, 3)
        tvecs = x[9 + 3 * V :].reshape(V, 3)
        return K, dist, rvecs, tvecs

    def residuals(x):
        K, dist, rvecs, tvecs = unpack(x)

        def view(rv, tv, op, ip):
            proj = project_points(op, K, rv, tv, dist_coeffs=dist)
            return (proj - ip).reshape(-1)

        return jax.vmap(view)(rvecs, tvecs, obj_points, img_points).reshape(-1)

    x, final_cost, _ = levenberg_marquardt(residuals, x0, n_iter=n_lm_iter)
    K, dist, rvecs, tvecs = unpack(x)
    rmse = jnp.sqrt(final_cost / (V * N))  # OpenCV's per-point RMS convention
    return (
        float(rmse),
        np.asarray(K),
        np.asarray(dist).reshape(1, 5),
        np.asarray(rvecs),
        np.asarray(tvecs),
    )
