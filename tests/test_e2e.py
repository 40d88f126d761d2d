"""Full-pipeline test: synthetic videos → estimation entry → artifacts.

The minimum end-to-end slice of SURVEY.md §7 as one test: camera params on
disk, multi-camera videos through the native decoder, the jitted
crop→model→decode→triangulate pipeline, npy artifacts with the reference's
wire shapes, then the refinement CLI consuming them.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from multi_camera_3d_pose_estimation_tpu.cli import estimate_pose_from_video
from multi_camera_3d_pose_estimation_tpu.io import (
    read_recording_log,
    save_camera_intrinsics,
    save_extrinsic_calibration_parameters,
    save_camera_names,
    write_recording_log,
)


@pytest.fixture
def project(tmp_path, rng):
    """2 cameras with params on disk + 8-frame synced videos."""
    K = np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1]])
    for c, name in enumerate(("left", "right")):
        save_camera_intrinsics(K, np.zeros((1, 5)), name, root_path=str(tmp_path))
        th = np.deg2rad(-10 + 20 * c)
        R = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
        )
        T = np.array([20.0 * c - 10, 0.0, 5.0 * c]).reshape(3, 1)
        save_extrinsic_calibration_parameters(R, T, name, root_dir=str(tmp_path))
    save_camera_names({0: "left", 1: "right"}, "left", str(tmp_path))

    rec_dir = tmp_path / "recordings"
    rec_dir.mkdir()
    paths = []
    for name in ("left", "right"):
        p = str(rec_dir / f"{name}_synced.mp4")
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 15.0, (160, 120))
        for i in range(8):
            frame = (rng.uniform(0, 255, (120, 160, 3))).astype(np.uint8)
            vw.write(frame)
        vw.release()
        paths.append(p)
    return tmp_path, paths


def test_estimate_pose_from_video_artifacts(project):
    tmp_path, paths = project
    kpts_2d, heatmaps, kpts_3d = estimate_pose_from_video(
        paths,
        project_dir=str(tmp_path),
        pose_estimation_model="test_tiny",
        block_size=4,
        conf_threshold=-1.0,  # random weights: keep every joint
    )
    # Reference wire shapes (SURVEY.md §1).
    assert kpts_2d.shape == (8, 17, 3, 2)
    assert heatmaps.shape == (8, 2, 17, 6)
    assert kpts_3d.shape == (8, 17, 3)
    rec_dir = os.path.dirname(paths[0])
    for name in ("kpts_2d.npy", "heatmaps_2d.npy", "kpts_3d.npy"):
        assert os.path.exists(os.path.join(rec_dir, name))

    # Artifact reuse path (reference reuse-or-recompute, pose_estimation.py:286).
    k2_again, _, _ = estimate_pose_from_video(
        paths, project_dir=str(tmp_path), pose_estimation_model="test_tiny"
    )
    np.testing.assert_array_equal(k2_again, kpts_2d)

    # Manifest round-trip.
    log_path = write_recording_log(rec_dir, paths, "test_tiny", "full_frame")
    log = read_recording_log(log_path)
    assert log["estimator_model"] == "test_tiny"
    assert log["kpts_2d"].endswith("kpts_2d.npy")


def test_record_and_estimate_orchestrator_with_prerecorded(tmp_path, rng):
    """Full L4 orchestration with prerecorded clips: configure (manual
    extrinsics) -> skip recording -> skip sync -> estimate -> manifest,
    using the reference's configurations/<n>/ directory layout."""
    from multi_camera_3d_pose_estimation_tpu.cli import record_and_estimate_pose

    project = str(tmp_path)
    K = np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1]])
    for name in ("left", "right"):
        save_camera_intrinsics(K, np.zeros((1, 5)), name, root_path=project)

    rec_dir = tmp_path / "clips"
    rec_dir.mkdir()
    paths = []
    for name in ("left", "right"):
        p = str(rec_dir / f"{name}_synced.mp4")
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 15.0, (160, 120))
        for _ in range(6):
            vw.write(rng.integers(0, 255, (120, 160, 3), dtype=np.uint8).copy())
        vw.release()
        paths.append(p)

    kpts_2d, heatmaps, kpts_3d = record_and_estimate_pose(
        camera_names=["left", "right"],
        estimator_model="test_tiny",
        recording_paths=paths,
        synchronize_video=False,
        project_dir=project,
        manual_measurements={"right": ([50.0, 0.0, 10.0], 3.0, 4.0)},
        conf_threshold=-1.0,
    )
    assert kpts_2d.shape == (6, 17, 3, 2)
    assert kpts_3d.shape == (6, 17, 3)
    log_path = os.path.join(str(rec_dir), "recording_log.yaml")
    assert os.path.exists(log_path)
    log = read_recording_log(log_path)
    assert log["estimator_model"] == "test_tiny"


def test_nan_missing_data_flows_through_all_stages(rng):
    """SURVEY.md §5: low-confidence joints become NaN and flow through
    triangulation, interpolation, and refinement without poisoning
    neighbouring joints or the optimizer."""
    import jax.numpy as jnp

    from multi_camera_3d_pose_estimation_tpu.ops import triangulate_top2
    from multi_camera_3d_pose_estimation_tpu.refine import (
        PoseRefiner,
        linear_interpolation,
    )
    from tests.conftest import project_np

    T, J, C = 12, 5, 2
    K = np.array([[400.0, 0, 160.0], [0, 400.0, 120.0], [0, 0, 1]])
    Rs, Ts = [], []
    for c in range(C):
        th = np.deg2rad(-15 + 30 * c)
        Rs.append(np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                            [-np.sin(th), 0, np.cos(th)]]))
        Ts.append(np.array([30.0 * c - 15, 0.0, 5.0 * c]))
    t = np.linspace(0, 2 * np.pi, T)[:, None, None]
    traj = rng.uniform([-20, -20, 280], [20, 20, 340], (1, J, 3)) + 5 * np.sin(t)

    kpts = np.stack(
        [project_np(traj.reshape(-1, 3), K, Rs[c], Ts[c]).reshape(T, J, 2)
         for c in range(C)], axis=2,
    )  # (T, J, C, 2)
    conf = np.ones((T, J, C))
    # Joint 2 lost in BOTH views at frames 4-6 → NaN 3D there.
    kpts[4:7, 2] = np.nan
    conf[4:7, 2] = np.nan

    k3d = np.asarray(triangulate_top2(
        jnp.asarray(kpts), jnp.asarray(conf),
        np.stack([K] * C), np.zeros((C, 5)), np.stack(Rs), np.stack(Ts),
    ))
    assert np.isnan(k3d[4:7, 2]).all()
    assert np.isfinite(np.delete(k3d, [4, 5, 6], axis=0)).all()

    # Interpolation: the NaN gap's neighbours fill from clean stats; the
    # corrupted rows keep original (NaN) values under default fallback.
    smoothed = np.asarray(linear_interpolation(k3d))
    assert np.isfinite(smoothed[:3]).all()

    # Refinement: NaN-initialized rows would poison Adam (NaN grads touch
    # everything via clipping), so init from the interpolated trajectory
    # with NaNs replaced — the likelihood's nan_mean tolerates remaining
    # NaN observations.
    gauss = np.zeros((T, C, J, 6))
    for c in range(C):
        gauss[:, c, :, :2] = kpts[:, :, c]
        gauss[:, c, :, 2] = 9.0
        gauss[:, c, :, 5] = 9.0
    init = np.where(np.isfinite(smoothed), smoothed, np.nanmean(traj, axis=(0, 1)))
    cams = {c: [K, Rs[c], Ts[c], np.zeros(5)] for c in range(C)}
    ref = PoseRefiner(gauss, init, cams)
    res = ref.sgd_optimize(lr=0.02, max_iter=60, patience=60,
                           lambda_smooth=0.0, lambda_body_length=0.0)
    assert np.isfinite(res.trajectory).all()
    assert np.isfinite(res.cost_history["total_cost"]).all()


def test_live_preview_hook_writes_overlays(project, tmp_path_factory):
    """The streaming driver's live-preview hook (reference
    pose_estimation.py:125,145-149): overlay jpgs are written per drained
    block without perturbing the artifact outputs."""
    tmp_path, paths = project
    prev_dir = str(tmp_path_factory.mktemp("preview"))
    kpts_2d, heatmaps, kpts_3d = estimate_pose_from_video(
        paths,
        project_dir=str(tmp_path),
        pose_estimation_model="test_tiny",
        block_size=4,
        conf_threshold=-1.0,
        overwrite=True,
        live_preview_dir=prev_dir,
    )
    assert kpts_3d.shape == (8, 17, 3)
    import glob

    written = sorted(glob.glob(os.path.join(prev_dir, "preview_*.jpg")))
    # every=8 by default -> one preview frame per 8, x 2 cameras
    assert len(written) >= 2, written
    img = cv2.imread(written[0])
    assert img is not None and img.shape == (120, 160, 3)
