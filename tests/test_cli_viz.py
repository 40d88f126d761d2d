"""CLI + viz end-to-end tests on synthetic artifacts (headless Agg)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from multi_camera_3d_pose_estimation_tpu.cli import (
    calibrate_intrinsics_from_images,
    configure_cameras,
)
from multi_camera_3d_pose_estimation_tpu.cli.refine import build_parser, run_refinement
from multi_camera_3d_pose_estimation_tpu.io import (
    read_camera_parameters,
    read_rotation_translation,
    save_camera_intrinsics,
    save_extrinsic_calibration_parameters,
    save_camera_names,
)
from multi_camera_3d_pose_estimation_tpu.models import resolve_model_name, MODEL_REGISTRY
from multi_camera_3d_pose_estimation_tpu.viz import (
    calculate_plot_lims,
    create_heatmap_animation,
    visualize_2d,
    visualize_3d,
)
from multi_camera_3d_pose_estimation_tpu.calib import (
    board_object_points,
    create_checkerboard_image,
)
from multi_camera_3d_pose_estimation_tpu.ops import rodrigues_matrix
from tests.conftest import project_np


def render_board_views(rng, K, n_views=6, rows=5, cols=7):
    """Warped checkerboard photos + truth for the configure_cameras flow."""
    board, k = create_checkerboard_image(rows + 1, cols + 1, 1200, 900, border_px=6)
    y0 = (900 - (rows + 1) * k) // 2
    x0 = (1200 - (cols + 1) * k) // 2
    images = []
    for _ in range(n_views):
        rvec = rng.uniform(-0.25, 0.25, 3)
        tvec = np.array(
            [rng.uniform(-120, 40), rng.uniform(-100, 30), rng.uniform(2000, 2800)]
        )
        R = np.asarray(rodrigues_matrix(rvec))
        Rt = np.column_stack(
            [R[:, 0], R[:, 1], R @ np.array([-(x0 + k), -(y0 + k), 0.0]) + tvec]
        )
        H = K @ Rt
        images.append(
            cv2.warpPerspective(
                board, H / H[2, 2], (640, 480), flags=cv2.INTER_LINEAR, borderValue=255
            )
        )
    return images, k


def test_registry_names():
    assert resolve_model_name("coco_rtmpose-t") == "coco_rtmpose-t"
    assert resolve_model_name("coco_swin_b") in MODEL_REGISTRY
    with pytest.raises(KeyError):
        resolve_model_name("nope")


@pytest.mark.slow
def test_calibrate_intrinsics_from_images(rng):
    K = np.array([[620.0, 0, 320.0], [0, 620.0, 240.0], [0, 0, 1]])
    images, k = render_board_views(rng, K)
    rmse, K_est, dist, n_used = calibrate_intrinsics_from_images(
        images, 5, 7, square_size=float(k)
    )
    assert n_used >= 4
    assert rmse < 1.0
    assert abs(K_est[0, 0] - 620.0) < 20


def test_configure_cameras_with_existing_intrinsics(tmp_path, rng):
    """Headless configure: pre-existing intrinsics + manual extrinsics."""
    project = str(tmp_path)
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1]])
    for name in ("camA", "camB"):
        save_camera_intrinsics(K, np.zeros((1, 5)), name, root_path=project)
    num = configure_cameras(
        camera_names={0: "camA", 1: "camB"},
        project_dir=project,
        origin_camera="camA",
        manual_measurements={"camB": ([100.0, 0.0, 50.0], 3.0, 4.0)},
    )
    config_dir = os.path.join(project, "configurations", str(num))
    extr = os.path.join(config_dir, "extrinsic_camera_parameters")
    R_a, T_a = read_rotation_translation("camA", params_dir=extr)
    np.testing.assert_allclose(R_a, np.eye(3))
    np.testing.assert_allclose(T_a, 0.0)
    R_b, T_b = read_rotation_translation("camB", params_dir=extr)
    np.testing.assert_allclose(R_b @ R_b.T, np.eye(3), atol=1e-9)


def make_refinement_artifacts(tmp_path, rng, T=10, J=17, C=2):
    run = tmp_path / "run"
    run.mkdir()
    t = np.linspace(0, 2 * np.pi, T)[:, None, None]
    base = rng.uniform([-30, -30, 280], [30, 30, 360], size=(1, J, 3))
    traj = base + 8 * np.stack(
        [np.sin(t[..., 0]), np.cos(t[..., 0]), 0.3 * np.sin(2 * t[..., 0])], -1
    )
    gauss = np.zeros((T, C, J, 6))
    cam_lists = {}
    project = tmp_path
    for c in range(C):
        K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]])
        th = np.deg2rad(-15 + 30 * c)
        R = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
        )
        Tv = np.array([30.0 * c - 15, 0.0, 10.0 * c])
        proj = project_np(traj.reshape(-1, 3), K, R, Tv).reshape(T, J, 2)
        gauss[:, c, :, :2] = proj
        gauss[:, c, :, 2] = 16.0
        gauss[:, c, :, 5] = 16.0
        name = f"cam{c}"
        save_camera_intrinsics(K, np.zeros((1, 5)), name, root_path=str(project))
        save_extrinsic_calibration_parameters(
            R, Tv.reshape(3, 1), name, root_dir=str(project)
        )
        cam_lists[c] = name
    save_camera_names({i: cam_lists[i] for i in cam_lists}, "cam0", str(project))
    noisy = traj + rng.normal(0, 2.0, traj.shape)
    np.save(run / "kpts_3d.npy", noisy)
    np.save(run / "heatmaps_2d.npy", gauss)
    return run, project, traj, noisy


def test_refine_cli_linear_and_sgd(tmp_path, rng, monkeypatch):
    run, project, traj, noisy = make_refinement_artifacts(tmp_path, rng)
    import yaml

    params = {
        "SGD": {
            "lr": 0.05,
            "max_iter": 100,
            "patience": 100,
            "lambda_smooth": 0.0,
            "lambda_body_length": 0.0,
        }
    }
    params_yaml = str(tmp_path / "refine.yaml")
    with open(params_yaml, "w") as f:
        yaml.dump(params, f)

    monkeypatch.chdir(tmp_path)
    args = build_parser().parse_args(
        [
            "--run_path", str(run),
            "--refinement_types", "linear_interpolation", "SGD",
            "--kpts_3d", str(run / "kpts_3d.npy"),
            "--heatmaps_2d", str(run / "heatmaps_2d.npy"),
            "--extrinsic_params_dir", str(project / "extrinsic_camera_parameters"),
            "--intrinsic_params_dir", str(project / "intrinsic_camera_parameters"),
            "--refinement_params_yaml", params_yaml,
            "--ignore_body_lengths",
        ]
    )
    results = run_refinement(args)
    assert os.path.exists(run / "kpts_3d_linear_interpolation.npy")
    assert os.path.exists(run / "kpts_3d_SGD.npy")
    refined = results["SGD"]
    e0 = np.linalg.norm(noisy - traj, axis=-1).mean()
    e1 = np.linalg.norm(refined - traj, axis=-1).mean()
    assert e1 < e0, (e0, e1)


def test_calculate_plot_lims_homogeneous(rng):
    dat = rng.normal(0, [1.0, 10.0, 100.0], size=(500, 3))
    lims = calculate_plot_lims(dat)
    spans = [hi - lo for lo, hi in lims]
    assert max(spans) - min(spans) < 1e-9  # homogenized


def test_visualize_3d_saves_gif(tmp_path, rng):
    traj = rng.normal(0, 10, (4, 17, 3)) + np.array([0, 0, 300.0])
    ani = visualize_3d(traj)
    out = str(tmp_path / "pose.gif")
    ani.save(out, fps=5)
    assert os.path.getsize(out) > 1000


def test_visualize_2d_and_heatmap_animation(tmp_path, rng):
    kpts_2d = rng.uniform(0, 100, (3, 17, 3, 2))
    ani = visualize_2d(kpts_2d)
    out = str(tmp_path / "k2d.gif")
    ani.save(out, fps=5)
    assert os.path.getsize(out) > 1000

    heat = np.zeros((3, 2, 17, 6))
    heat[..., :2] = rng.uniform(10, 50, (3, 2, 17, 2))
    heat[..., 2] = 4.0
    heat[..., 5] = 4.0
    frames = [
        [np.zeros((60, 60, 3), np.uint8) for _ in range(2)] for _ in range(3)
    ]
    out2 = str(tmp_path / "heat.gif")
    create_heatmap_animation(heat, frames, out_path=out2, fps=5)
    assert os.path.getsize(out2) > 1000


def test_interactive_viewer_headless(rng, tmp_path):
    from multi_camera_3d_pose_estimation_tpu.viz import interactive_3d_pose_animation

    traj = rng.normal(0, 10, (3, 17, 3)) + np.array([0, 0, 300.0])
    ani = interactive_3d_pose_animation(traj)
    out = str(tmp_path / "interactive.gif")
    ani.save(out, fps=5)
    assert os.path.getsize(out) > 500


def test_animate_trackpoints_over_video(tmp_path, rng):
    import cv2
    from multi_camera_3d_pose_estimation_tpu.viz import animate_trackpoints

    p = str(tmp_path / "track.mp4")
    vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    for _ in range(4):
        vw.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8).copy())
    vw.release()
    pts = rng.uniform(5, 40, (4, 3, 2))
    ani = animate_trackpoints(pts, p, labels=["a", "b", "c"])
    out = str(tmp_path / "track.gif")
    ani.save(out, fps=5)
    assert os.path.getsize(out) > 500


def test_visualize_3d_with_camera_strips(tmp_path, rng):
    import cv2
    from multi_camera_3d_pose_estimation_tpu.viz import visualize_3d

    paths = []
    for c in range(2):
        p = str(tmp_path / f"strip{c}.mp4")
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
        for _ in range(5):
            vw.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8).copy())
        vw.release()
        paths.append(p)
    traj = rng.normal(0, 10, (4, 17, 3)) + np.array([0, 0, 300.0])
    ani = visualize_3d(traj, recording_paths=paths)
    out = str(tmp_path / "with_strips.gif")
    ani.save(out, fps=5)
    assert os.path.getsize(out) > 1000


def test_main_dispatcher(capsys):
    import pytest
    from multi_camera_3d_pose_estimation_tpu.__main__ import main

    with pytest.raises(SystemExit) as e:
        main([])
    assert e.value.code == 0
    assert "refine" in capsys.readouterr().out
    with pytest.raises(SystemExit) as e:
        main(["bogus"])
    assert e.value.code == 2


def test_configure_cameras_reference_display_yaml(tmp_path):
    """The checkerboard display YAML (reference schema: r/c/boarder/width_mm)
    produces the board image and derives the physical square size."""
    project = str(tmp_path)
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1]])
    for name in ("cA", "cB"):
        save_camera_intrinsics(K, np.zeros((1, 5)), name, root_path=project)
    num = configure_cameras(
        camera_names={0: "cA", 1: "cB"},
        project_dir=project,
        origin_camera="cA",
        checkerboard_display_parameter_yaml="examples/checkerboard_display_parameters.yaml",
        manual_measurements={"cB": ([100.0, 0.0, 50.0], 3.0, 4.0)},
    )
    board = os.path.join(project, "configurations", str(num), "checkerboard.jpg")
    assert os.path.exists(board)
    img = cv2.imread(board)
    assert img.shape[:2] == (2160, 3840)


def test_doctor_cli_healthy_without_device():
    """`doctor --no_device` must pass on this rig (imports, native media
    runtime, virtual CPU mesh) and exit 0; with --require_device and a
    tiny probe timeout it must exit nonzero when no healthy backend
    answers that fast (covers the bounded-probe path both ways)."""
    import pytest

    from multi_camera_3d_pose_estimation_tpu.cli import doctor

    with pytest.raises(SystemExit) as e:
        doctor.main(["--no_device"])
    assert e.value.code == 0
