"""Whole-pipeline artifact A/B against the imported reference (VERDICT r4 #2).

One fixture project dir (cached ``kpts_2d.npy``/``heatmaps_2d.npy`` + camera
``.dat``/``.pkl`` params in the reference's on-disk layout); the reference's
own ``pose_estimation.get_pose_3D`` (pose_estimation.py:11-65) and its
``pose_refinement`` ``__main__`` path (pose_refinement.py:1099-1256, run as a
subprocess) produce ``kpts_3d.npy`` → ``kpts_3d_linear_interpolation.npy`` →
``kpts_3d_SGD.npy``; our ``cli/estimate.py`` (triangulate-from-cached-2D
reuse path) and ``cli/refine.py`` consume the same fixture.  All three
artifacts must agree to <1 mm MPJPE — the BASELINE.md north-star clause,
measured as one number instead of inferred from piecewise parity.

Two refinement YAMLs with identical hyperparameters; ours additionally sets
``camera0_gaussians_compat: true`` (the reference indexes camera 0's
Gaussians for every view, pose_refinement.py:885 — compat mode reproduces
that objective exactly) and ``auto_gate: false`` (our noise-floor gate is a
deliberate deviation, off for reference-exact runs).
"""

import os
import subprocess
import sys
import types

import numpy as np
import pytest
import yaml

REF = "/root/reference"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree not mounted", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

# pose_estimation.py imports mmpose at module scope (mmpose_pose_estimation
# :5-8, unavailable here); get_pose_3D itself needs only numpy + utils, so
# stub the import surface before loading the module.
if "mmpose_pose_estimation" not in sys.modules:
    _stub = types.ModuleType("mmpose_pose_estimation")
    _stub.PoseEstimator = type("PoseEstimator", (), {})
    sys.modules["mmpose_pose_estimation"] = _stub

import pose_estimation as ref_pe  # noqa: E402
import utils as ref_utils  # noqa: E402

from multi_camera_3d_pose_estimation_tpu.io import (  # noqa: E402
    save_camera_intrinsics,
    save_extrinsic_calibration_parameters,
    save_camera_names,
)
from tests.conftest import project_np  # noqa: E402

T, J, C = 12, 17, 3


@pytest.fixture
def fixture_project(tmp_path, rng):
    """Reference-layout project dir with cached 2D artifacts.

    configurations-root layout: ``{intrinsic,extrinsic}_camera_parameters/``
    at the root, run artifacts in ``recordings/0/`` two levels down (the
    reference's default extrinsic backtrack, pose_refinement.py:1127-1129).
    """
    root = tmp_path
    run_dir = root / "recordings" / "0"
    run_dir.mkdir(parents=True)

    names = {0: "camA", 1: "camB", 2: "camC"}
    cams = {}
    for c in range(C):
        K = np.array([[900.0 + 7 * c, 0, 640.0], [0, 905.0 - 3 * c, 360.0],
                      [0, 0, 1.0]])
        d = np.array([-0.12 + 0.05 * c, 0.03, 0.0005, -0.0008, 0.004])
        th = np.deg2rad(-24.0 + 22.0 * c)
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        Tv = np.array([45.0 * c - 45.0, 3.0 * c, 20.0 * c])
        cams[c] = [K, R, Tv, d]
        save_camera_intrinsics(K, d.reshape(1, 5), names[c], root_path=str(root))
        save_extrinsic_calibration_parameters(
            R, Tv.reshape(3, 1), names[c], root_dir=str(root)
        )
    save_camera_names(names, "camA", str(root))

    # Smooth trajectory, mm-scale coordinates; distinct per-view confidences
    # so the top-2 selection is genuinely exercised at every joint.
    t = np.linspace(0, 2 * np.pi, T)[:, None, None]
    traj = rng.uniform([-200, -200, 2800], [200, 200, 3400], (1, J, 3)) + 80 * np.stack(
        [np.sin(t[..., 0]), np.cos(t[..., 0]), 0.4 * np.sin(2 * t[..., 0])], -1
    )
    kpts_2d = np.zeros((T, J, 3, C))
    heatmaps = np.zeros((T, C, J, 6))
    for c in range(C):
        K, R, Tv, d = cams[c]
        proj = project_np(traj.reshape(-1, 3), K, R, Tv, d).reshape(T, J, 2)
        kpts_2d[:, :, :2, c] = proj
        kpts_2d[:, :, 2, c] = rng.uniform(0.55, 0.99, (T, J))
        heatmaps[:, c, :, :2] = proj + rng.normal(0, 1.5, (T, J, 2))
        heatmaps[:, c, :, 2] = 9.0
        heatmaps[:, c, :, 5] = 9.0

    np.save(run_dir / "kpts_2d.npy", kpts_2d)
    np.save(run_dir / "heatmaps_2d.npy", heatmaps)
    (run_dir / "recording_log.yaml").write_text(
        yaml.safe_dump({"model": "coco_hrnet_w32", "detector_model": "full_frame"})
    )
    # The reference builds its body-length vector unconditionally
    # (pose_refinement.py:966->:770) and crashes on body_lengths=None, so
    # both sides get a real lengths YAML; lambda_body_length=0 keeps the
    # cost out of the objective.
    (root / "body_part_lengths.yaml").write_text(
        yaml.safe_dump({"my_lengths": {"left_shoulder_left_elbow": 38.0,
                                       "right_shoulder_right_elbow": 38.0}})
    )
    return dict(root=root, run_dir=run_dir, names=names, cams=cams, traj=traj,
                kpts_2d=kpts_2d, heatmaps=heatmaps)


def _mpjpe(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.nanmean(np.linalg.norm(a - b, axis=-1)))


@pytest.mark.slow
def test_whole_pipeline_artifacts_match_reference(fixture_project):
    fx = fixture_project
    root, run_dir = fx["root"], fx["run_dir"]
    intr = os.path.join(str(root), "intrinsic_camera_parameters")
    extr = os.path.join(str(root), "extrinsic_camera_parameters")

    # ---- Stage 1: kpts_3d from cached kpts_2d -------------------------
    # Reference: get_pose_3D over get_params_from_name-loaded params
    # (the estimate_pose_from_video reuse branch, pose_estimation.py:318-325).
    ref_params = {}
    for c, name in fx["names"].items():
        _P, plist = ref_utils.get_params_from_name(
            name, intrinsic_params_dir=intr, extrinsic_params_dir=extr
        )
        ref_params[c] = plist
    ref_k3d = ref_pe.get_pose_3D(ref_params, fx["kpts_2d"])

    # Ours: the estimate CLI's reuse path (cached 2D present, 3D absent).
    from multi_camera_3d_pose_estimation_tpu.cli import estimate_pose_from_video

    fake_paths = [str(run_dir / f"{n}_synced.mp4") for n in fx["names"].values()]
    k2, hm, our_k3d = estimate_pose_from_video(
        fake_paths, project_dir=str(root),
        camera_names=list(fx["names"].values()),
    )
    np.testing.assert_array_equal(k2, fx["kpts_2d"])  # untouched cache
    d_tri = _mpjpe(our_k3d, ref_k3d)
    assert d_tri < 1.0, f"kpts_3d delta {d_tri} mm"
    # and both actually solved the scene
    assert _mpjpe(our_k3d, fx["traj"]) < 1.0

    # ---- Stage 2+3: refinement artifacts ------------------------------
    sgd_common = {
        "lr": 0.1, "max_iter": 60, "patience": 10**6,
        "tolerance": 0.0, "lambda_smooth": 1.0, "lambda_body_length": 0.0,
        "time_interval": [0, T], "print_frequency": 10**9,
    }
    params_yaml_ref = str(root / "refinement_params_ref.yaml")
    with open(params_yaml_ref, "w") as f:
        yaml.safe_dump({"linear_interpolation": {}, "SGD": sgd_common}, f)
    params_yaml_ours = str(root / "refinement_params_ours.yaml")
    with open(params_yaml_ours, "w") as f:
        yaml.safe_dump({
            "linear_interpolation": {},
            # identical hyperparameters + the reference-exact-mode switches
            "SGD": {**sgd_common, "camera0_gaussians_compat": True,
                    "auto_gate": False},
        }, f)

    ref_out = root / "ref_out"
    our_out = root / "our_out"
    ref_out.mkdir()
    our_out.mkdir()

    # Reference side: its own __main__ (pose_refinement.py:1099-1256) as a
    # subprocess, cwd pinned to an empty dir so no stray
    # ./body_part_lengths.yaml is picked up (=> body_lengths None).
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REF, "pose_refinement.py"),
         "--run_path", str(run_dir),
         "--save_path", str(ref_out),
         "--refinement_types", "linear_interpolation", "SGD",
         "--kpts_3d", str(run_dir / "kpts_3d.npy"),
         "--heatmaps_2d", str(run_dir / "heatmaps_2d.npy"),
         "--kpts_2d", str(run_dir / "kpts_2d.npy"),
         "--extrinsic_params_dir", extr,
         "--intrinsic_params_dir", intr,
         "--body_part_lengths_yaml", str(root / "body_part_lengths.yaml"),
         "--refinement_params_yaml", params_yaml_ref],
        cwd=str(ref_out), env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    # Our side: the refine CLI on the identical fixture + YAML.
    from multi_camera_3d_pose_estimation_tpu.cli.refine import (
        build_parser,
        run_refinement,
    )

    args = build_parser().parse_args([
        "--run_path", str(run_dir),
        "--save_path", str(our_out),
        "--refinement_types", "linear_interpolation", "SGD",
        "--kpts_3d", str(run_dir / "kpts_3d.npy"),
        "--heatmaps_2d", str(run_dir / "heatmaps_2d.npy"),
        "--extrinsic_params_dir", extr,
        "--intrinsic_params_dir", intr,
        "--refinement_params_yaml", params_yaml_ours,
        "--body_part_lengths_yaml", str(root / "body_part_lengths.yaml"),
    ])
    run_refinement(args)

    for artifact in ("kpts_3d_linear_interpolation.npy", "kpts_3d_SGD.npy"):
        ref_a = np.load(ref_out / artifact)
        our_a = np.load(our_out / artifact)
        d = _mpjpe(our_a, ref_a)
        assert d < 1.0, f"{artifact} delta {d} mm"

    # The SGD leg must have genuinely moved the trajectory (otherwise the
    # <1 mm bound would be vacuous).
    moved = _mpjpe(np.load(ref_out / "kpts_3d_SGD.npy"),
                   np.load(run_dir / "kpts_3d.npy"))
    assert moved > 1.0, f"SGD barely moved the trajectory ({moved} mm)"
