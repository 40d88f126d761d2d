"""Triangulation + undistortion vs synthetic known-3D oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from multi_camera_3d_pose_estimation_tpu.ops import (
    triangulate_dlt,
    triangulate_points,
    triangulate_top2,
    undistort_points,
    projection_matrix,
)
from tests.conftest import project_np


def scalar_dlt(P1, P2, p1, p2):
    """Float64 scalar oracle (spec: reference utils.py:19-34)."""
    A = np.array(
        [
            p1[1] * P1[2] - P1[1],
            P1[0] - p1[0] * P1[2],
            p2[1] * P2[2] - P2[1],
            P2[0] - p2[0] * P2[2],
        ]
    )
    _, _, Vh = np.linalg.svd(A.T @ A)
    return Vh[3, :3] / Vh[3, 3]


def test_undistort_inverts_distortion(camera_pair):
    c = camera_pair
    px = project_np(c["pts3d"], c["K2"], c["R2"], c["T2"], c["d2"])
    und = np.array(undistort_points(px, c["K2"], c["d2"], P=c["K2"], n_iter=20))
    ideal = project_np(c["pts3d"], c["K2"], c["R2"], c["T2"], None)
    np.testing.assert_allclose(und, ideal, atol=1e-5)


def test_undistort_zero_dist_identity(camera_pair):
    c = camera_pair
    px = project_np(c["pts3d"], c["K1"], c["R1"], c["T1"], None)
    und = np.array(undistort_points(px, c["K1"], np.zeros(5), P=c["K1"]))
    np.testing.assert_allclose(und, px, atol=1e-9)


def test_triangulate_dlt_matches_scalar_oracle(camera_pair):
    c = camera_pair
    P1 = np.array(projection_matrix(c["K1"], c["R1"], c["T1"]))
    P2 = np.array(projection_matrix(c["K2"], c["R2"], c["T2"]))
    p1 = project_np(c["pts3d"], c["K1"], c["R1"], c["T1"], None)
    p2 = project_np(c["pts3d"], c["K2"], c["R2"], c["T2"], None)

    got = np.array(triangulate_dlt(p1, p2, P1, P2))
    oracle = np.array([scalar_dlt(P1, P2, a, b) for a, b in zip(p1, p2)])
    np.testing.assert_allclose(got, oracle, atol=1e-6)
    # And both must recover the true 3D points.
    np.testing.assert_allclose(got, c["pts3d"], atol=1e-5)


def test_triangulate_points_with_distortion(camera_pair):
    """Full reference-compatible path: distorted pixels in, 3D out."""
    c = camera_pair
    p1 = project_np(c["pts3d"], c["K1"], c["R1"], c["T1"], c["d1"])
    p2 = project_np(c["pts3d"], c["K2"], c["R2"], c["T2"], c["d2"])
    kpts = np.stack([p1, p2], axis=1)  # (N, 2 views, 2)

    got = np.array(
        triangulate_points(
            kpts, c["K1"], c["d1"], c["R1"], c["T1"], c["K2"], c["d2"], c["R2"], c["T2"],
            n_undistort_iter=25,
        )
    )
    # Sub-0.01mm at this synthetic scale — well inside the <1mm MPJPE budget.
    np.testing.assert_allclose(got, c["pts3d"], atol=1e-2)


def test_triangulate_nan_passthrough(camera_pair):
    c = camera_pair
    p1 = project_np(c["pts3d"], c["K1"], c["R1"], c["T1"], None)
    p2 = project_np(c["pts3d"], c["K2"], c["R2"], c["T2"], None)
    p1[3] = np.nan
    p2[7, 0] = np.nan
    P1 = np.array(projection_matrix(c["K1"], c["R1"], c["T1"]))
    P2 = np.array(projection_matrix(c["K2"], c["R2"], c["T2"]))
    got = np.array(triangulate_dlt(p1, p2, P1, P2))
    assert np.all(np.isnan(got[3]))
    assert np.all(np.isnan(got[7]))
    assert np.all(np.isfinite(np.delete(got, [3, 7], axis=0)))


def test_triangulate_batched_leading_dims(camera_pair):
    c = camera_pair
    p1 = project_np(c["pts3d"], c["K1"], c["R1"], c["T1"], None).reshape(5, 12, 2)
    p2 = project_np(c["pts3d"], c["K2"], c["R2"], c["T2"], None).reshape(5, 12, 2)
    kpts = np.stack([p1, p2], axis=-2)  # (5,12,2 views,2)
    got = np.array(
        triangulate_points(
            kpts, c["K1"], np.zeros(5), c["R1"], c["T1"], c["K2"], np.zeros(5), c["R2"], c["T2"]
        )
    )
    assert got.shape == (5, 12, 3)
    np.testing.assert_allclose(got, c["pts3d"].reshape(5, 12, 3), atol=1e-5)


def test_triangulate_top2_selects_best_views(camera_pair, rng):
    """4 cameras; the two noisy-confidence losers must be excluded."""
    c = camera_pair
    # Build 4 cameras: the two real ones + two rotated copies.
    th = np.deg2rad(-20.0)
    R3 = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]])
    T3 = np.array([90.0, -10.0, 30.0])
    R4 = np.eye(3)
    T4 = np.array([0.0, 80.0, 10.0])
    Ks = np.stack([c["K1"], c["K2"], c["K1"], c["K2"]])
    dists = np.zeros((4, 5))
    Rs = np.stack([c["R1"], c["R2"], R3, R4])
    Ts = np.stack([c["T1"], c["T2"], T3, T4])

    pts3d = c["pts3d"][:20]
    pix = np.stack(
        [project_np(pts3d, Ks[i], Rs[i], Ts[i], None) for i in range(4)], axis=1
    )  # (N, 4, 2)
    # Corrupt cameras 2,3 *pixels* badly, but give them low confidence.
    pix_bad = pix.copy()
    pix_bad[:, 2] += 500.0
    pix_bad[:, 3] -= 300.0
    conf = np.tile(np.array([0.9, 0.8, 0.1, 0.2]), (20, 1))

    got = np.array(triangulate_top2(pix_bad, conf, Ks, dists, Rs, Ts))
    np.testing.assert_allclose(got, pts3d, atol=1e-4)


def test_triangulate_top2_jit_and_tie_stability(camera_pair):
    c = camera_pair
    pts3d = c["pts3d"][:8]
    Ks = np.stack([c["K1"], c["K2"]])
    dists = np.stack([c["d1"], c["d2"]])
    Rs = np.stack([c["R1"], c["R2"]])
    Ts = np.stack([c["T1"], c["T2"]])
    pix = np.stack(
        [project_np(pts3d, Ks[i], Rs[i], Ts[i], dists[i]) for i in range(2)], axis=1
    )
    conf = np.full((8, 2), 0.5)  # ties: stable sort keeps order [0,1]

    fn = jax.jit(lambda k, cf: triangulate_top2(k, cf, Ks, dists, Rs, Ts, n_undistort_iter=25))
    got = np.array(fn(pix, conf))
    np.testing.assert_allclose(got, pts3d, atol=1e-2)


def test_get_pose_3d_reference_layout(rng, camera_pair):
    """get_pose_3D-compat entry consumes the (T, K, 3, C) wire layout."""
    from multi_camera_3d_pose_estimation_tpu.ops import get_pose_3d
    from tests.conftest import project_np

    c = camera_pair
    T, K = 6, 17
    pts3d = rng.uniform([-40, -40, 260], [40, 40, 420], size=(T, K, 3))
    proj1 = project_np(pts3d.reshape(-1, 3), c["K1"], c["R1"], c["T1"], c["d1"]).reshape(T, K, 2)
    proj2 = project_np(pts3d.reshape(-1, 3), c["K2"], c["R2"], c["T2"], c["d2"]).reshape(T, K, 2)
    # (T, K, 3, C) with rows x, y, conf — camera-last wire layout.
    kpts_2d = np.stack(
        [
            np.stack([proj1[..., 0], proj2[..., 0]], axis=-1),
            np.stack([proj1[..., 1], proj2[..., 1]], axis=-1),
            np.ones((T, K, 2)),
        ],
        axis=2,
    )
    cams = {
        "a": [c["K1"], c["R1"], c["T1"], c["d1"]],
        "b": [c["K2"], c["R2"], c["T2"], c["d2"]],
    }
    p3 = np.asarray(get_pose_3d(kpts_2d, cams))
    assert p3.shape == (T, K, 3)
    np.testing.assert_allclose(p3, pts3d, atol=1e-3)

    # World-rotation post-multiply (reference :60-62).
    th = np.deg2rad(30)
    R_W0 = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    p3_rot = np.asarray(get_pose_3d(kpts_2d, cams, world_trans_rot=(R_W0, np.zeros(3))))
    np.testing.assert_allclose(p3_rot, pts3d @ np.linalg.inv(R_W0).T, atol=1e-3)


def test_triangulate_top2_rejects_single_camera():
    import pytest
    from multi_camera_3d_pose_estimation_tpu.ops import triangulate_top2

    with pytest.raises(ValueError, match=">= 2 camera"):
        triangulate_top2(
            np.zeros((3, 17, 1, 2)), np.ones((3, 17, 1)),
            np.eye(3)[None], np.zeros((1, 5)), np.eye(3)[None], np.zeros((1, 3)),
        )


def _nview_rig(n_cams=4, n_pts=80, seed=3, dist=False):
    """n-camera ring rig + points + exact projections."""
    rng = np.random.default_rng(seed)
    Ks, Rs, Ts, ds = [], [], [], []
    for c in range(n_cams):
        Ks.append(np.array([[900.0 + 5 * c, 0, 640.0],
                            [0, 905.0 - 4 * c, 360.0], [0, 0, 1.0]]))
        th = np.deg2rad(-30.0 + 60.0 * c / max(n_cams - 1, 1))
        Rs.append(np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                            [-np.sin(th), 0, np.cos(th)]]))
        Ts.append(np.array([60.0 * c - 30.0 * (n_cams - 1), 3.0 * c, 15.0 * c]))
        ds.append(np.array([-0.1 + 0.04 * c, 0.02, 0.0004, -0.0006, 0.002])
                  if dist else np.zeros(5))
    pts3d = rng.uniform([-100, -100, 2800], [100, 100, 3400], (n_pts, 3))
    kpts = np.stack(
        [project_np(pts3d, Ks[c], Rs[c], Ts[c], ds[c] if dist else None)
         for c in range(n_cams)], axis=1,
    )  # (n_pts, C, 2)
    return (np.stack(Ks), np.stack(ds), np.stack(Rs), np.stack(Ts),
            pts3d, kpts, rng)


def test_triangulate_nview_clean_matches_truth():
    """All-view weighted DLT on exact projections (with distortion) recovers
    the points as well as top2."""
    Ks, ds, Rs, Ts, pts3d, kpts, rng = _nview_rig(n_cams=4, dist=True)
    conf = rng.uniform(0.5, 1.0, kpts.shape[:-1])
    from multi_camera_3d_pose_estimation_tpu.ops import triangulate_nview

    p_nv = np.asarray(triangulate_nview(kpts, conf, Ks, ds, Rs, Ts))
    np.testing.assert_allclose(p_nv, pts3d, atol=1e-2)
    p_t2 = np.asarray(triangulate_top2(kpts, conf, Ks, ds, Rs, Ts))
    assert np.abs(p_nv - pts3d).max() <= np.abs(p_t2 - pts3d).max() + 1e-2


def test_triangulate_nview_rejects_corrupted_confident_view():
    """VERDICT r4 #3 scenario: an occluder corrupts ONE view per point and
    the corrupted view carries the HIGHEST confidence — top2 has no
    third-view recourse, the n-view rejection pass does."""
    from multi_camera_3d_pose_estimation_tpu.ops import triangulate_nview

    Ks, ds, Rs, Ts, pts3d, kpts, rng = _nview_rig(n_cams=4)
    kpts = kpts + rng.normal(0, 0.5, kpts.shape)  # mild honest 2D noise
    conf = rng.uniform(0.5, 0.8, kpts.shape[:-1])
    corrupt = rng.integers(0, 4, len(pts3d))
    idx = np.arange(len(pts3d))
    kpts[idx, corrupt] += rng.normal(0, 5.0, (len(pts3d), 2)) + 60.0
    conf[idx, corrupt] = 0.99  # the occluder looks like a great detection

    err_t2 = np.linalg.norm(
        np.asarray(triangulate_top2(kpts, conf, Ks, ds, Rs, Ts)) - pts3d, axis=-1)
    err_nv = np.linalg.norm(
        np.asarray(triangulate_nview(kpts, conf, Ks, ds, Rs, Ts)) - pts3d, axis=-1)
    # top2 always includes the corrupted view (it has max conf);
    # nview's residual pass throws it out.
    assert np.median(err_nv) < 0.25 * np.median(err_t2), (
        np.median(err_nv), np.median(err_t2))
    assert err_nv.mean() < 0.25 * err_t2.mean()


def test_triangulate_nview_nan_semantics():
    """<2 finite views -> NaN; exactly 2 of 4 finite -> solved from those."""
    from multi_camera_3d_pose_estimation_tpu.ops import triangulate_nview

    Ks, ds, Rs, Ts, pts3d, kpts, rng = _nview_rig(n_cams=4, n_pts=6)
    conf = np.full(kpts.shape[:-1], 0.9)
    kpts[0, 1:] = np.nan          # one finite view
    kpts[1, :] = np.nan           # zero finite views
    kpts[2, 2:] = np.nan          # two finite views
    conf[3, 0] = np.nan           # NaN conf invalidates the view

    out = np.asarray(triangulate_nview(kpts, conf, Ks, ds, Rs, Ts))
    assert np.isnan(out[0]).all() and np.isnan(out[1]).all()
    np.testing.assert_allclose(out[2], pts3d[2], atol=1e-2)
    np.testing.assert_allclose(out[3], pts3d[3], atol=1e-2)  # 3 views left
    np.testing.assert_allclose(out[4:], pts3d[4:], atol=1e-2)


def test_triangulate_nview_min_views_guard_two_cams():
    """With only 2 cameras the rejection pass can never drop below
    min_views: even a huge-residual view is kept (fall back to pass-1
    weights), output stays finite."""
    from multi_camera_3d_pose_estimation_tpu.ops import triangulate_nview

    Ks, ds, Rs, Ts, pts3d, kpts, rng = _nview_rig(n_cams=2, n_pts=10)
    kpts[:, 0] += 80.0  # view 0 wildly off -> would be rejected with >2 views
    conf = np.full(kpts.shape[:-1], 0.9)
    out = np.asarray(triangulate_nview(kpts, conf, Ks, ds, Rs, Ts))
    assert np.isfinite(out).all()


def test_get_pose_3d_nview_method(rng, camera_pair):
    """get_pose_3d(method='nview') equals top2 on a clean 2-cam scene and
    rejects unknown methods."""
    import pytest

    from multi_camera_3d_pose_estimation_tpu.ops import get_pose_3d

    c = camera_pair
    pts3d = c["pts3d"][:20]
    proj1 = project_np(pts3d, c["K1"], c["R1"], c["T1"], c["d1"])
    proj2 = project_np(pts3d, c["K2"], c["R2"], c["T2"], c["d2"])
    kpts_2d = np.stack(
        [
            np.stack([proj1[..., 0], proj2[..., 0]], axis=-1),
            np.stack([proj1[..., 1], proj2[..., 1]], axis=-1),
            np.ones((20, 2)),
        ],
        axis=1,
    )[None]  # (1, 20, 3, 2)
    cams = {
        "a": [c["K1"], c["R1"], c["T1"], c["d1"]],
        "b": [c["K2"], c["R2"], c["T2"], c["d2"]],
    }
    p_nv = np.asarray(get_pose_3d(kpts_2d, cams, method="nview"))
    np.testing.assert_allclose(p_nv[0], pts3d, atol=1e-3)
    with pytest.raises(ValueError, match="unknown triangulation method"):
        get_pose_3d(kpts_2d, cams, method="svd")
