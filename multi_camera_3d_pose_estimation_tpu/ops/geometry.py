"""Core camera geometry in jnp: rotations, projections, distortion.

TPU-native counterpart of the reference's numpy/torch geometry helpers
(reference: utils.py:425-458 homogeneous/projection, utils.py:1219-1268
rotation conversion, pose_refinement.py:94-179 differentiable projection).
Everything here is written for arbitrary leading batch dimensions, static
shapes, and `jax.jit`/`vmap` — the reference's per-frame Python loops become
batch axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "make_homogeneous_rep_matrix",
    "projection_matrix",
    "rodrigues_matrix",
    "rodrigues_vector",
    "rotation_conversion",
    "distort_normalized",
    "project_points",
]

_EPS = 1e-12


def make_homogeneous_rep_matrix(R: jax.Array, t: jax.Array) -> jax.Array:
    """[R|t; 0 0 0 1] — homogeneous rigid transform.

    Behavioural parity with reference utils.py:425-431, batched: ``R`` is
    (..., 3, 3), ``t`` is (..., 3) or (..., 3, 1); returns (..., 4, 4).
    """
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    if t.shape[-1] == 1:  # (...,3,1) -> (...,3)
        t = t[..., 0]
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)  # (...,3,4)
    bottom = jnp.zeros(batch + (1, 4), R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def projection_matrix(K: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """P = K [R|t], shape (..., 3, 4). Parity: reference utils.py:433-435."""
    K = jnp.asarray(K)
    Rt = make_homogeneous_rep_matrix(R, t)[..., :3, :]
    # HIGHEST: TPU's default bf16 matmul precision would put ~1e-2 relative
    # error into P and every downstream triangulation/projection.
    return jnp.einsum("...ij,...jk->...ik", K, Rt,
                      precision=jax.lax.Precision.HIGHEST)


def rodrigues_matrix(rvec: jax.Array) -> jax.Array:
    """Axis-angle vector (..., 3) -> rotation matrix (..., 3, 3).

    Rodrigues formula R = I + sin(θ)K + (1-cos(θ))K², with a Taylor-safe
    branch at θ→0 (returns identity in the limit, like reference
    utils.py:1242-1262 which special-cases θ<1e-6).
    """
    rvec = jnp.asarray(rvec)
    # θ via a clamped sum-of-squares: `jnp.linalg.norm` has a NaN gradient
    # at exactly 0, and even a `where`-select output still back-propagates
    # NaN through the untaken branch (0·NaN = NaN).  The origin camera's
    # rvec IS exactly zero in every real pipeline, and that NaN poisons
    # global-norm gradient clipping for ALL parameters.  With the clamp,
    # u = rvec/θ → 0, K → 0, R → I exactly, and the gradient limit
    # dR = [d rvec]× is correct.
    sumsq = jnp.sum(rvec * rvec, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(sumsq, 1e-24))  # (...,1)
    u = rvec / theta
    ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
    zero = jnp.zeros_like(ux)
    K = jnp.stack(
        [
            jnp.stack([zero, -uz, uy], axis=-1),
            jnp.stack([uz, zero, -ux], axis=-1),
            jnp.stack([-uy, ux, zero], axis=-1),
        ],
        axis=-2,
    )  # (...,3,3)
    th = theta[..., None]  # (...,1,1)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    KK = jnp.einsum("...ij,...jk->...ik", K, K,
                    precision=jax.lax.Precision.HIGHEST)
    return eye + jnp.sin(th) * K + (1.0 - jnp.cos(th)) * KK


def rodrigues_vector(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> axis-angle vector (..., 3).

    acos-trace form as in reference utils.py:1225-1240, with clipping for
    numerical safety and a zero vector at θ→0. The θ→π case is handled by
    falling back to the dominant-diagonal axis extraction.
    """
    R = jnp.asarray(R)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)  # (...,)
    sin_theta = jnp.sin(theta)

    # Generic branch: axis from the skew-symmetric part.
    denom = jnp.where(jnp.abs(sin_theta) < 1e-7, jnp.ones_like(sin_theta), 2.0 * sin_theta)
    ax = jnp.stack(
        [
            (R[..., 2, 1] - R[..., 1, 2]) / denom,
            (R[..., 0, 2] - R[..., 2, 0]) / denom,
            (R[..., 1, 0] - R[..., 0, 1]) / denom,
        ],
        axis=-1,
    )

    # θ≈π branch: axis from diagonal of (R + I)/2 = uu^T.
    diag = jnp.stack(
        [R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1
    )
    u_sq = jnp.clip((diag + 1.0) / 2.0, 0.0, None)
    u_abs = jnp.sqrt(u_sq)
    # Fix signs using off-diagonal sums relative to the largest component.
    k = jnp.argmax(u_abs, axis=-1)

    def _sign_fix(R, u_abs, k):
        # R is (3,3), u_abs (3,), k scalar — vmapped over batch below.
        s01 = R[0, 1] + R[1, 0]
        s02 = R[0, 2] + R[2, 0]
        s12 = R[1, 2] + R[2, 1]

        def from0(_):
            return jnp.stack([u_abs[0], jnp.sign(s01) * u_abs[1], jnp.sign(s02) * u_abs[2]])

        def from1(_):
            return jnp.stack([jnp.sign(s01) * u_abs[0], u_abs[1], jnp.sign(s12) * u_abs[2]])

        def from2(_):
            return jnp.stack([jnp.sign(s02) * u_abs[0], jnp.sign(s12) * u_abs[1], u_abs[2]])

        return jax.lax.switch(k, [from0, from1, from2], None)

    batch_shape = R.shape[:-2]
    if batch_shape:
        flatR = R.reshape((-1, 3, 3))
        flatU = u_abs.reshape((-1, 3))
        flatK = k.reshape((-1,))
        u_pi = jax.vmap(_sign_fix)(flatR, flatU, flatK).reshape(batch_shape + (3,))
    else:
        u_pi = _sign_fix(R, u_abs, k)

    near_pi = (jnp.pi - theta) < 1e-4
    axis = jnp.where(near_pi[..., None], u_pi, ax)
    rvec = theta[..., None] * axis
    small = theta < 1e-7
    return jnp.where(small[..., None], jnp.zeros_like(rvec), rvec)


def rotation_conversion(rotation_rep: jax.Array, to_vector: bool = True) -> jax.Array:
    """Reference-compatible dispatcher (utils.py:1219-1268).

    (3,3) + to_vector    -> axis-angle (3,)
    (3,)  + not to_vector -> matrix (3,3)
    otherwise passthrough.
    """
    rotation_rep = jnp.asarray(rotation_rep)
    if rotation_rep.shape[-2:] == (3, 3) and to_vector:
        return rodrigues_vector(rotation_rep)
    if rotation_rep.shape[-1:] == (3,) and rotation_rep.ndim >= 1 and not to_vector:
        if rotation_rep.shape[-2:] != (3, 3):
            return rodrigues_matrix(rotation_rep)
    return rotation_rep


def distort_normalized(xy: jax.Array, dist: jax.Array) -> jax.Array:
    """Apply the 5-coefficient (k1,k2,p1,p2,k3) radial+tangential model.

    ``xy``: normalized image coordinates (..., 2).  Matches the reference's
    differentiable model at pose_refinement.py:147-161 (and OpenCV's
    projectPoints distortion with 5 coefficients).
    """
    dist = jnp.asarray(dist).reshape(-1)
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def project_points(
    points: jax.Array,
    K: jax.Array,
    R: jax.Array,
    T: jax.Array,
    dist_coeffs: jax.Array | None = None,
    ignore_distortions: bool = False,
) -> jax.Array:
    """Project world points (..., 3) to pixel coordinates (..., 2).

    Full pinhole + distortion model; differentiable; works with ``R`` given
    as a (3,3) matrix or a (3,) axis-angle vector (the refinement loop learns
    the axis-angle form — reference pose_refinement.py:933-943).

    Parity spec: reference pose_refinement.py:94-179 (`project_points_torch`)
    and utils.py:438-458 (`project_points` via cv.projectPoints).
    """
    points = jnp.asarray(points)
    K = jnp.asarray(K)
    R = jnp.asarray(R)
    T = jnp.asarray(T).reshape(3)
    if R.shape[-2:] != (3, 3):
        R = rodrigues_matrix(R)

    cam = jnp.einsum("ij,...j->...i", R, points,
                     precision=jax.lax.Precision.HIGHEST) + T
    x = cam[..., 0] / cam[..., 2]
    y = cam[..., 1] / cam[..., 2]
    xy = jnp.stack([x, y], axis=-1)
    if not ignore_distortions and dist_coeffs is not None:
        xy = distort_normalized(xy, dist_coeffs)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    skew = K[0, 1]
    u = fx * xy[..., 0] + skew * xy[..., 1] + cx
    v = fy * xy[..., 1] + cy
    return jnp.stack([u, v], axis=-1)
