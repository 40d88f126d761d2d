"""Numerical parity vs OpenCV — the reference's actual C++ kernels.

SURVEY.md §7 "hard parts" requires bit-parity with OpenCV semantics inside
<1 mm MPJPE.  cv2 is available in this environment, so parity is tested
DIRECTLY against the same calls the reference makes:

- projection: `project_points` vs `cv.projectPoints` (utils.py:451)
- rotation:   `rodrigues_*` vs `cv.Rodrigues` (utils.py:448)
- undistort:  `undistort_points` vs `cv.undistortPoints` (utils.py:1314)
- triangulation: `triangulate_points` vs the reference's exact pipeline
  (cv.undistortPoints + cv.triangulatePoints, utils.py:1277-1336)
- calibration: `calibrate_camera` vs `cv.calibrateCamera` RMSE/K
- PnP:        `solve_pnp` vs `cv.solvePnP`
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax.numpy as jnp

from multi_camera_3d_pose_estimation_tpu.calib import (
    board_object_points,
    calibrate_camera,
    solve_pnp,
)
from multi_camera_3d_pose_estimation_tpu.ops import (
    project_points,
    rodrigues_matrix,
    rodrigues_vector,
    triangulate_points,
    undistort_points,
)
from tests.conftest import project_np


@pytest.fixture
def cam():
    K = np.array([[800.0, 0, 320.0], [0, 790.0, 240.0], [0, 0, 1.0]])
    dist = np.array([-0.21, 0.05, 0.0008, -0.0011, 0.01])
    rvec = np.array([0.2, -0.35, 0.15])
    R, _ = cv2.Rodrigues(rvec)
    T = np.array([3.0, -2.0, 5.0])
    return K, dist, R, T, rvec


def test_rodrigues_parity(rng):
    for _ in range(20):
        rvec = rng.normal(0, 1.2, 3)
        R_cv, _ = cv2.Rodrigues(rvec)
        R_us = np.asarray(rodrigues_matrix(jnp.asarray(rvec)))
        np.testing.assert_allclose(R_us, R_cv, atol=1e-12)
        # Matrix -> vector roundtrip against cv2.
        v_cv, _ = cv2.Rodrigues(R_cv)
        v_us = np.asarray(rodrigues_vector(jnp.asarray(R_cv)))
        np.testing.assert_allclose(v_us, v_cv.ravel(), atol=1e-9)


def test_project_points_parity(cam, rng):
    K, dist, R, T, rvec = cam
    pts = rng.uniform([-30, -30, 200], [30, 30, 400], (200, 3))
    cv_pts, _ = cv2.projectPoints(pts.reshape(-1, 1, 3), rvec, T, K, dist)
    us = np.asarray(project_points(jnp.asarray(pts), K, R, T, dist_coeffs=dist))
    np.testing.assert_allclose(us, cv_pts.reshape(-1, 2), atol=1e-8)


def test_undistort_points_parity(cam, rng):
    K, dist, R, T, _ = cam
    pts3d = rng.uniform([-30, -30, 200], [30, 30, 400], (150, 3))
    pix = project_np(pts3d, K, R, T, dist)
    cv_und = cv2.undistortPoints(
        pix.reshape(-1, 1, 2).astype(np.float64), K, dist, None, K
    ).reshape(-1, 2)
    us = np.asarray(undistort_points(jnp.asarray(pix), K, dist, P=jnp.asarray(K)))
    # OpenCV stops its fixed-point iteration early; both must agree to well
    # under a hundredth of a pixel on realistic distortion.
    np.testing.assert_allclose(us, cv_und, atol=5e-3)


def test_triangulate_points_parity_and_accuracy(camera_pair, rng):
    """Our batched DLT vs the reference's exact cv2 pipeline AND vs truth."""
    c = camera_pair
    pts3d = c["pts3d"]
    p1 = project_np(pts3d, c["K1"], c["R1"], c["T1"], c["d1"])
    p2 = project_np(pts3d, c["K2"], c["R2"], c["T2"], c["d2"])

    # Reference pipeline (utils.py:1277-1336): undistort w/ P=K, build
    # P = K[R|T], cv.triangulatePoints, dehomogenize.
    u1 = cv2.undistortPoints(p1.reshape(-1, 1, 2), c["K1"], c["d1"], None, c["K1"]).reshape(-1, 2)
    u2 = cv2.undistortPoints(p2.reshape(-1, 1, 2), c["K2"], c["d2"], None, c["K2"]).reshape(-1, 2)
    P1 = c["K1"] @ np.column_stack([c["R1"], np.asarray(c["T1"]).reshape(3, 1)])
    P2 = c["K2"] @ np.column_stack([c["R2"], np.asarray(c["T2"]).reshape(3, 1)])
    h = cv2.triangulatePoints(P1, P2, u1.T, u2.T)
    cv_3d = (h[:3] / h[3]).T

    kpts = np.stack([p1, p2], axis=-2)  # (N, 2 views, 2)
    us_3d = np.asarray(
        triangulate_points(
            jnp.asarray(kpts),
            c["K1"], c["d1"], c["R1"], c["T1"],
            c["K2"], c["d2"], c["R2"], c["T2"],
        )
    )
    # Sub-millimeter agreement with OpenCV's result AND the true points
    # (scene units are cm → 1e-1 atol ≈ 1 mm; achieved ≈ 1e-4).
    np.testing.assert_allclose(us_3d, cv_3d, atol=1e-2)
    np.testing.assert_allclose(us_3d, pts3d, atol=1e-2)
    mpjpe_mm = np.linalg.norm(us_3d - cv_3d, axis=-1).mean() * 10
    assert mpjpe_mm < 1.0, f"MPJPE vs OpenCV = {mpjpe_mm} mm"


def test_calibrate_camera_parity(rng):
    K_true = np.array([[620.0, 0, 320.0], [0, 615.0, 240.0], [0, 0, 1.0]])
    dist_true = np.array([-0.1, 0.02, 0.0005, -0.0004, 0.0])
    obj = board_object_points(5, 7, 3.0).astype(np.float32)
    objs, imgs = [], []
    for _ in range(10):
        rv = rng.uniform(-0.3, 0.3, 3)
        R, _ = cv2.Rodrigues(rv)
        t = np.array([rng.uniform(-5, 5), rng.uniform(-4, 4), rng.uniform(45, 80)])
        img = project_np(obj.astype(np.float64), K_true, R, t, dist_true)
        img = img + rng.normal(0, 0.1, img.shape)
        objs.append(obj)
        imgs.append(img.astype(np.float32))
    rmse_cv, K_cv, d_cv, _, _ = cv2.calibrateCamera(
        objs, imgs, (640, 480), None, None
    )
    rmse_us, K_us, d_us, _, _ = calibrate_camera(
        np.stack(objs).astype(np.float64), np.stack(imgs).astype(np.float64)
    )
    # Same data, same model — estimates agree to a fraction of a percent.
    np.testing.assert_allclose(K_us[0, 0], K_cv[0, 0], rtol=5e-3)
    np.testing.assert_allclose(K_us[1, 1], K_cv[1, 1], rtol=5e-3)
    np.testing.assert_allclose(K_us[:2, 2], K_cv[:2, 2], rtol=1e-2)
    assert abs(rmse_us - rmse_cv) < 0.05, (rmse_us, rmse_cv)


def test_solve_pnp_parity(cam, rng):
    K, dist, R, T, rvec_true = cam
    obj = board_object_points(5, 7, 3.0)
    img = project_np(obj, K, R, T, dist)
    ok, rv_cv, tv_cv = cv2.solvePnP(obj, img.reshape(-1, 1, 2), K, dist)
    assert ok
    rv_us, tv_us = solve_pnp(obj, img, K, dist)
    np.testing.assert_allclose(np.asarray(rv_us), rv_cv.ravel(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tv_us), tv_cv.ravel(), atol=1e-5)
