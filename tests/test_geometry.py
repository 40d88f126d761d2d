"""Geometry ops vs float64 numpy / scipy oracles."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from multi_camera_3d_pose_estimation_tpu.ops import (
    make_homogeneous_rep_matrix,
    projection_matrix,
    project_points,
    rodrigues_matrix,
    rodrigues_vector,
    rotation_conversion,
)
from tests.conftest import project_np


def test_homogeneous_matrix():
    R = np.arange(9).reshape(3, 3).astype(float)
    t = np.array([1.0, 2.0, 3.0])
    H = np.array(make_homogeneous_rep_matrix(R, t))
    assert H.shape == (4, 4)
    np.testing.assert_allclose(H[:3, :3], R)
    np.testing.assert_allclose(H[:3, 3], t)
    np.testing.assert_allclose(H[3], [0, 0, 0, 1])


def test_projection_matrix(camera_pair):
    c = camera_pair
    P = np.array(projection_matrix(c["K2"], c["R2"], c["T2"]))
    expected = c["K2"] @ np.hstack([c["R2"], c["T2"].reshape(3, 1)])
    np.testing.assert_allclose(P, expected, rtol=1e-12)


def test_rodrigues_roundtrip(rng):
    # Canonical range: |rvec| in (0, pi) so matrix->vector is unambiguous.
    dirs = rng.normal(size=(32, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rvecs = dirs * rng.uniform(0.01, 3.1, size=(32, 1))
    R = np.array(rodrigues_matrix(jnp.asarray(rvecs)))
    R_ref = Rotation.from_rotvec(rvecs).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-10)

    back = np.array(rodrigues_vector(jnp.asarray(R_ref)))
    np.testing.assert_allclose(back, rvecs, atol=1e-7)


def test_rodrigues_small_angle():
    R = np.array(rodrigues_matrix(jnp.zeros(3)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-12)
    v = np.array(rodrigues_vector(jnp.eye(3)))
    np.testing.assert_allclose(v, np.zeros(3), atol=1e-12)


def test_rodrigues_near_pi():
    rvec = np.array([0.0, np.pi - 1e-9, 0.0])
    R_ref = Rotation.from_rotvec(rvec).as_matrix()
    back = np.array(rodrigues_vector(jnp.asarray(R_ref)))
    R_back = Rotation.from_rotvec(back).as_matrix()
    # Axis-angle is ambiguous in sign at pi; compare reconstructed matrices.
    np.testing.assert_allclose(R_back, R_ref, atol=1e-6)


def test_rotation_conversion_dispatch():
    rvec = np.array([0.1, -0.2, 0.3])
    R = np.array(rotation_conversion(jnp.asarray(rvec), to_vector=False))
    np.testing.assert_allclose(R, Rotation.from_rotvec(rvec).as_matrix(), atol=1e-10)
    v = np.array(rotation_conversion(jnp.asarray(R), to_vector=True))
    np.testing.assert_allclose(v, rvec, atol=1e-8)
    # Passthrough cases
    same = rotation_conversion(jnp.asarray(R), to_vector=False)
    np.testing.assert_allclose(np.array(same), R)


def test_project_points_matches_oracle(camera_pair):
    c = camera_pair
    got = np.array(
        project_points(c["pts3d"], c["K2"], c["R2"], c["T2"], dist_coeffs=c["d2"])
    )
    expected = project_np(c["pts3d"], c["K2"], c["R2"], c["T2"], c["d2"])
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-8)


def test_project_points_axis_angle(camera_pair):
    c = camera_pair
    rvec = Rotation.from_matrix(c["R2"]).as_rotvec()
    got = np.array(
        project_points(c["pts3d"], c["K2"], rvec, c["T2"], dist_coeffs=c["d2"])
    )
    expected = project_np(c["pts3d"], c["K2"], c["R2"], c["T2"], c["d2"])
    np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-6)


def test_project_points_no_distortion(camera_pair):
    c = camera_pair
    got = np.array(
        project_points(c["pts3d"], c["K1"], c["R1"], c["T1"], dist_coeffs=c["d1"], ignore_distortions=True)
    )
    expected = project_np(c["pts3d"], c["K1"], c["R1"], c["T1"], None)
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_project_points_batched_shapes(camera_pair):
    c = camera_pair
    pts = c["pts3d"].reshape(5, 12, 3)
    got = project_points(pts, c["K2"], c["R2"], c["T2"], dist_coeffs=c["d2"])
    assert got.shape == (5, 12, 2)


def test_rodrigues_gradient_finite_at_zero():
    """Regression: the origin camera's rvec is exactly 0; norm()'s NaN
    gradient there used to poison global-norm clipping for ALL params."""
    import jax
    import jax.numpy as jnp

    from multi_camera_3d_pose_estimation_tpu.ops import rodrigues_matrix

    J = jax.jacrev(rodrigues_matrix)(jnp.zeros(3))
    assert bool(jnp.isfinite(J).all())
    # The limit is the skew generator: dR/drvec_k = d[r]x/dr_k at r=0.
    expect = np.zeros((3, 3, 3))
    # [r]x = [[0,-rz,ry],[rz,0,-rx],[-ry,rx,0]]
    expect[0, 1, 2] = -1.0
    expect[0, 2, 1] = 1.0
    expect[1, 0, 2] = 1.0
    expect[1, 2, 0] = -1.0
    expect[2, 0, 1] = -1.0
    expect[2, 1, 0] = 1.0
    np.testing.assert_allclose(np.asarray(J), expect, atol=1e-6)

    # And gradients THROUGH a projection at rvec=0 stay finite.
    from multi_camera_3d_pose_estimation_tpu.ops import project_points

    def loss(rv):
        p = project_points(
            jnp.asarray([[0.0, 0.0, 100.0]]),
            jnp.eye(3) * 100.0,
            rv,
            jnp.zeros(3),
        )
        return jnp.sum(p)

    g = jax.grad(loss)(jnp.zeros(3))
    assert bool(jnp.isfinite(g).all())
