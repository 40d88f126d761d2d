"""IO compat: .dat formats, manifests, config system, skeleton metadata."""

import os

import numpy as np
import yaml

from multi_camera_3d_pose_estimation_tpu.io import (
    save_camera_intrinsics,
    read_camera_parameters,
    save_extrinsic_calibration_parameters,
    read_rotation_translation,
    get_params_from_name,
    stack_camera_params,
    create_new_numbered_folder,
    write_recording_log,
    read_recording_log,
    save_camera_names,
    load_camera_names,
    load_config,
    prepare_kwargs,
)
from multi_camera_3d_pose_estimation_tpu.utils import (
    CONNECTIVITY_DICT,
    POINT_INFO,
    BODYPARTS,
    generate_connectivity_names,
    get_body_part_lengths,
    body_length_edges,
)


def test_intrinsics_roundtrip(tmp_path):
    K = np.array([[920.5, 0.0, 640.25], [0.0, 910.125, 360.0], [0.0, 0.0, 1.0]])
    dist = np.array([[-0.2, 0.05, 0.001, -0.002, 0.01]])
    save_camera_intrinsics(K, dist, "camA", root_path=str(tmp_path))
    K2, d2 = read_camera_parameters("camA", params_dir=str(tmp_path / "intrinsic_camera_parameters"))
    np.testing.assert_allclose(K2, K)
    np.testing.assert_allclose(d2, dist)


def test_intrinsics_reference_format(tmp_path):
    """The .dat layout must match the reference writer line-for-line."""
    K = np.eye(3)
    save_camera_intrinsics(K, np.zeros((1, 5)), "cam", root_path=str(tmp_path))
    text = (tmp_path / "intrinsic_camera_parameters" / "cam.dat").read_text()
    lines = text.splitlines()
    assert lines[0] == "intrinsic:"
    assert lines[4] == "distortion:"
    assert len(lines[1].split()) == 3
    assert len(lines[5].split()) == 5


def test_extrinsics_roundtrip(tmp_path):
    R = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    T = np.array([[10.5], [-3.25], [99.0]])
    save_extrinsic_calibration_parameters(R, T, "camB", root_dir=str(tmp_path))
    R2, T2 = read_rotation_translation("camB", params_dir=str(tmp_path / "extrinsic_camera_parameters"))
    np.testing.assert_allclose(R2, R)
    np.testing.assert_allclose(T2, T)


def test_get_params_from_name(tmp_path):
    K = np.array([[900.0, 0, 640], [0, 900.0, 360], [0, 0, 1]])
    dist = np.zeros((1, 5))
    R = np.eye(3)
    T = np.zeros((3, 1))
    save_camera_intrinsics(K, dist, "camC", root_path=str(tmp_path))
    save_extrinsic_calibration_parameters(R, T, "camC", root_dir=str(tmp_path))
    P, params = get_params_from_name(
        "camC",
        intrinsic_params_dir=str(tmp_path / "intrinsic_camera_parameters"),
        extrinsic_params_dir=str(tmp_path / "extrinsic_camera_parameters"),
    )
    expected_P = K @ np.hstack([R, T])
    np.testing.assert_allclose(P, expected_P)
    assert len(params) == 4
    # Missing camera -> Nones, no raise.
    P2, params2 = get_params_from_name(
        "nope",
        intrinsic_params_dir=str(tmp_path),
        extrinsic_params_dir=str(tmp_path),
    )
    assert P2 is None and params2 == [None, None, None, None]


def test_stack_camera_params():
    K = np.eye(3)
    cams = {
        0: [K, np.eye(3), np.zeros((3, 1)), np.zeros((1, 5))],
        1: [K * 2, np.eye(3), np.ones(3), None],
    }
    s = stack_camera_params(cams)
    assert s["K"].shape == (2, 3, 3)
    assert s["R"].shape == (2, 3, 3)
    assert s["T"].shape == (2, 3)
    assert s["dist"].shape == (2, 5)
    np.testing.assert_allclose(s["T"][1], np.ones(3))


def test_numbered_folders(tmp_path):
    base = str(tmp_path / "runs")
    assert create_new_numbered_folder(base) == 0
    assert create_new_numbered_folder(base) == 1
    os.makedirs(os.path.join(base, "7"))
    assert create_new_numbered_folder(base) == 8


def test_recording_log_roundtrip(tmp_path):
    p = write_recording_log(str(tmp_path), ["a.mp4", "b.mp4"], "coco_base", "coco_base")
    log = read_recording_log(p)
    assert log["recording_paths"] == ["a.mp4", "b.mp4"]
    assert log["kpts_2d"].endswith("kpts_2d.npy")
    assert log["heatmaps_2d"].endswith("heatmaps_2d.npy")
    assert log["kpts_3d"].endswith("kpts_3d.npy")
    assert log["estimator_model"] == "coco_base"


def test_camera_names_pickle_roundtrip(tmp_path):
    cams = {0: "left", 2: "right"}
    save_camera_names(cams, 0, str(tmp_path))
    loaded, origin = load_camera_names(str(tmp_path / "extrinsic_camera_parameters"))
    assert loaded == cams and origin == 0


def test_prepare_kwargs_yaml_semantics(tmp_path):
    def fn(a=1, b=2.0, max_iter=100, betas=(0.9, 0.999)):
        return a

    cfg = tmp_path / "p.yaml"
    cfg.write_text(yaml.dump({"SGD": {"b": 5.0, "max_iter": ".inf", "betas": [0.5, 0.9]}}))
    params = load_config(str(cfg))
    kw = prepare_kwargs(fn, params.get("SGD"))
    assert kw["a"] == 1
    assert kw["b"] == 5.0
    assert kw["max_iter"] == np.inf
    assert kw["betas"] == (0.5, 0.9)


def test_skeleton_metadata_schema():
    assert len(CONNECTIVITY_DICT["coco"]) == 16
    names = generate_connectivity_names(CONNECTIVITY_DICT["coco"], POINT_INFO["coco"])
    # These names are the body_part_lengths.yaml schema.
    for expected in [
        "left_shoulder_left_elbow", "left_elbow_left_wrist",
        "right_shoulder_right_elbow", "left_hip_right_hip",
        "left_shoulder_right_shoulder",
    ]:
        assert expected in names.values()
    assert set(BODYPARTS["coco"]) == {"torso", "armr", "arml", "legr", "legl"}


def test_body_part_lengths():
    pose = np.zeros((4, 17, 3))
    pose[:, 5] = [0, 0, 0]
    pose[:, 7] = [3, 4, 0]  # left_shoulder -> left_elbow length 5
    lengths = get_body_part_lengths(pose)
    np.testing.assert_allclose(np.array(lengths["left_shoulder_left_elbow"]), 5.0)
    assert np.array(lengths["left_hip_right_hip"]).shape == (4,)


def test_body_length_edges_compiles_yaml_order():
    targets = {"left_hip_right_hip": 31.0, "left_shoulder_left_elbow": 38.0}
    s, e, t = body_length_edges(targets)
    assert list(t) == [31.0, 38.0]
    assert (s[0], e[0]) == (11, 12)
    assert (s[1], e[1]) == (5, 7)


def test_keypoint_convert_coco_to_h36m():
    """convert_keypoint_definition parity sanity: COCO->H36M remap."""
    import numpy as np
    from multi_camera_3d_pose_estimation_tpu.utils import convert_keypoint_definition

    rng = np.random.default_rng(0)
    kpts = rng.uniform(0, 100, (17, 3))
    out = convert_keypoint_definition(
        kpts, "TopDownCocoDataset", "Body3DH36MDataset"
    )
    assert out.shape == (17, 3)
    # The mapped set must contain pelvis (mid-hips) and thorax
    # (mid-shoulders) rows regardless of the post-mapping permutation.
    mid_hips = (kpts[11] + kpts[12]) / 2
    mid_shoulders = (kpts[5] + kpts[6]) / 2
    assert any(np.allclose(row, mid_hips) for row in out)
    assert any(np.allclose(row, mid_shoulders) for row in out)


def test_step_timer_report(capsys):
    import time as _time

    from multi_camera_3d_pose_estimation_tpu.utils import StepTimer

    timer = StepTimer(block_jax=False)
    with timer.stage("decode"):
        _time.sleep(0.01)
    with timer.stage("model"):
        _time.sleep(0.02)
    with timer.stage("model"):
        _time.sleep(0.02)
    report = timer.report()
    assert "model" in report and "decode" in report
    assert timer.counts["model"] == 2
    assert timer.totals["model"] > timer.totals["decode"]
