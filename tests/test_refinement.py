"""Refinement convergence tests on synthetic Gaussians (SURVEY.md §4).

A known smooth 3D trajectory is projected into synthetic cameras; per-joint
Gaussians are centered on the true projections.  The refiner must pull a
noise-corrupted initialization back toward the truth, and the extrinsic
refiner must recover a perturbed camera pose.
"""

import numpy as np
import pytest

from multi_camera_3d_pose_estimation_tpu.refine import (
    PoseRefiner,
    ExtrinsicRefiner,
)
from tests.conftest import project_np


def make_scene(rng, T=24, J=5, n_cams=2, sigma=4.0):
    """Smooth trajectory + cameras + Gaussians centered on true projections."""
    t = np.linspace(0, 2 * np.pi, T)[:, None, None]
    base = rng.uniform([-30, -30, 280], [30, 30, 360], size=(1, J, 3))
    traj = base + 10.0 * np.stack(
        [np.sin(t[..., 0]), np.cos(t[..., 0]), 0.5 * np.sin(2 * t[..., 0])], axis=-1
    )

    cams = {}
    gauss = np.zeros((T, n_cams, J, 6))
    for c in range(n_cams):
        K = np.array([[900.0 + 10 * c, 0, 640.0], [0, 905.0 - 5 * c, 360.0], [0, 0, 1]])
        th = np.deg2rad(-20.0 + 25.0 * c)
        R = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
        )
        Tv = np.array([40.0 * c - 20.0, 2.0 * c, 25.0 * c])
        dist = np.zeros(5)
        cams[c] = [K, R, Tv, dist]
        proj = project_np(traj.reshape(-1, 3), K, R, Tv).reshape(T, J, 2)
        gauss[:, c, :, :2] = proj
        gauss[:, c, :, 2] = sigma**2
        gauss[:, c, :, 5] = sigma**2
    return traj, cams, gauss


def test_trajectory_refinement_reduces_error(rng):
    traj, cams, gauss = make_scene(rng)
    noisy = traj + rng.normal(0, 3.0, traj.shape)
    ref = PoseRefiner(gauss, noisy, cams)
    res = ref.sgd_optimize(
        lr=0.05, max_iter=300, patience=50, lambda_smooth=0.01,
        lambda_body_length=0.0,
    )
    err0 = np.linalg.norm(noisy - traj, axis=-1).mean()
    err1 = np.linalg.norm(res.trajectory - traj, axis=-1).mean()
    assert err1 < 0.5 * err0, (err0, err1)
    assert res.n_iter > 0
    assert "likelihood_cost" in res.cost_history
    assert len(res.cost_history["total_cost"]) == res.n_iter


def test_refinement_early_stops(rng):
    traj, cams, gauss = make_scene(rng, T=12, J=3)
    ref = PoseRefiner(gauss, traj.copy(), cams)
    res = ref.sgd_optimize(
        lr=1e-4, max_iter=5000, patience=5, lambda_smooth=0.0, lambda_body_length=0.0
    )
    assert res.n_iter < 5000  # patience must trigger well before max_iter


def test_refinement_batched_windows(rng):
    traj, cams, gauss = make_scene(rng, T=32, J=4)
    noisy = traj + rng.normal(0, 2.0, traj.shape)
    ref = PoseRefiner(gauss, noisy, cams)
    res = ref.sgd_optimize(
        lr=0.05, max_iter=200, patience=40, batch_size=16,
        lambda_smooth=0.01, lambda_body_length=0.0,
    )
    err0 = np.linalg.norm(noisy - traj, axis=-1).mean()
    err1 = np.linalg.norm(res.trajectory - traj, axis=-1).mean()
    assert err1 < 0.7 * err0


def test_body_length_cost_drives_proportions(rng):
    # COCO-17 joints so body_part_lengths names resolve.
    traj, cams, gauss = make_scene(rng, T=10, J=17, sigma=50.0)
    body = {"left_shoulder_left_elbow": 30.0, "right_shoulder_right_elbow": 30.0}
    noisy = traj + rng.normal(0, 2.0, traj.shape)
    ref = PoseRefiner(gauss, noisy, cams, body_lengths=body)
    # sigma=50 Gaussians put the ±2.0 init inside the 2D noise floor,
    # where the full-freeze auto-gate would (correctly) skip the window;
    # this test isolates the body-length term, so gate off.
    res = ref.sgd_optimize(
        lr=0.05, max_iter=150, patience=150, lambda_smooth=0.0,
        lambda_body_length=5.0, auto_gate=False,
    )
    assert "body_length_cost" in res.cost_history
    hist = res.cost_history["body_length_cost"]
    assert hist[-1] < hist[0]


def test_time_interval_and_smoothness(rng):
    traj, cams, gauss = make_scene(rng, T=30, J=4)
    noisy = traj + rng.normal(0, 2.0, traj.shape)
    ref = PoseRefiner(gauss, noisy, cams)
    res = ref.sgd_optimize(
        lr=0.02, max_iter=100, patience=100, time_interval=(0, 20),
        lambda_smooth=1.0, lambda_body_length=0.0,
    )
    assert res.trajectory.shape == (20, 4, 3)
    assert "smoothness_cost" in res.cost_history


def test_extrinsic_refiner_recovers_pose(rng):
    traj, cams, gauss = make_scene(rng, T=16, J=6, n_cams=3, sigma=2.0)
    true_R = cams[2][1].copy()
    true_T = cams[2][2].copy()
    # Perturb camera 2's pose.
    dth = np.deg2rad(3.0)
    dR = np.array(
        [[np.cos(dth), -np.sin(dth), 0], [np.sin(dth), np.cos(dth), 0], [0, 0, 1]]
    )
    cams_bad = {k: [p.copy() for p in v] for k, v in cams.items()}
    cams_bad[2][1] = dR @ true_R
    cams_bad[2][2] = true_T + np.array([4.0, -3.0, 5.0])

    ref = ExtrinsicRefiner(gauss, cams_bad, N_sample_points=30)
    R_opt, T_opt = ref.optimize(learning_rate=0.01, max_iter=800, patience=60)

    # Orthonormality preserved by the SVD projection.
    np.testing.assert_allclose(R_opt @ R_opt.T, np.eye(3), atol=1e-5)
    err_r0 = np.linalg.norm(cams_bad[2][1] - true_R)
    err_r1 = np.linalg.norm(R_opt - true_R)
    assert err_r1 < err_r0, (err_r0, err_r1)
    # T alone is only weakly observable (depth ambiguity along the optical
    # axis), so assert the observable quantity: reprojection error of the
    # true trajectory into camera 2 must drop substantially.
    K = cams[2][0]
    flat = traj.reshape(-1, 3)
    obs = gauss[:, 2, :, :2].reshape(-1, 2)

    def reproj(R, Tv):
        return np.linalg.norm(project_np(flat, K, R, Tv) - obs, axis=-1).mean()

    e_bad = reproj(cams_bad[2][1], cams_bad[2][2])
    e_opt = reproj(R_opt, T_opt)
    assert e_opt < 0.5 * e_bad, (e_bad, e_opt)


@pytest.mark.slow
def test_unified_optimizer_learns_extrinsics_from_samples(rng):
    traj, cams, gauss = make_scene(rng, T=12, J=6, n_cams=3, sigma=2.0)
    true_R = cams[2][1].copy()
    true_T = cams[2][2].copy()
    dth = np.deg2rad(2.0)
    dR = np.array(
        [[np.cos(dth), -np.sin(dth), 0], [np.sin(dth), np.cos(dth), 0], [0, 0, 1]]
    )
    cams_bad = {k: [p.copy() for p in v] for k, v in cams.items()}
    cams_bad[2][1] = dR @ true_R
    cams_bad[2][2] = true_T + np.array([3.0, -2.0, 3.0])

    ref = PoseRefiner(gauss, traj, cams_bad)
    res = ref.sgd_optimize(
        extrinsic_optimization_IDs=[2],
        GT_camera_IDs=[0, 1],
        optimize_trajectory=False,
        lr=0.01, max_iter=500, patience=60,
        lambda_smooth=0.0, lambda_body_length=0.0,
        N_sample_points=30,
    )
    assert "extrinsic_param_sample_cost" in res.cost_history
    R_opt = res.cam_params[2][1]
    T_opt = res.cam_params[2][2]
    K = cams[2][0]
    flat = traj.reshape(-1, 3)
    obs = gauss[:, 2, :, :2].reshape(-1, 2)

    def reproj(R, Tv):
        return np.linalg.norm(project_np(flat, K, R, Tv) - obs, axis=-1).mean()

    assert reproj(R_opt, T_opt) < 0.6 * reproj(cams_bad[2][1], cams_bad[2][2])


@pytest.mark.slow
def test_use_nn_path_runs(rng):
    traj, cams, gauss = make_scene(rng, T=10, J=4, n_cams=3)
    ref = PoseRefiner(gauss, traj, cams)
    res = ref.sgd_optimize(
        use_NN=True, lr=0.01, max_iter=20, patience=20,
        lambda_smooth=0.1, lambda_body_length=0.0,
    )
    assert res.trajectory.shape == traj.shape
    assert np.isfinite(res.cost_history["total_cost"]).all()


def test_checkpoint_resume(tmp_path, rng):
    """Interrupted refinement resumes from the npz state checkpoint."""
    traj, cams, gauss = make_scene(rng, T=16, J=4)
    noisy = traj + rng.normal(0, 2.0, traj.shape)
    common = dict(lr=0.05, patience=10**6, lambda_smooth=0.0,
                  lambda_body_length=0.0, checkpoint_every=10)

    # Uninterrupted run: 60 epochs.
    ref_a = PoseRefiner(gauss, noisy, {k: [p.copy() for p in v] for k, v in cams.items()})
    res_a = ref_a.sgd_optimize(max_iter=59, **common)

    # Interrupted at 30 epochs, then resumed to 60.
    ckpt = str(tmp_path)
    ref_b = PoseRefiner(gauss, noisy, {k: [p.copy() for p in v] for k, v in cams.items()})
    ref_b.sgd_optimize(max_iter=29, checkpoint_dir=ckpt, **common)
    import os
    assert os.path.exists(os.path.join(ckpt, "refine_state.npz"))
    res_b = ref_b.sgd_optimize(max_iter=59, checkpoint_dir=ckpt, resume=True, **common)

    assert res_b.n_iter == res_a.n_iter
    np.testing.assert_allclose(res_b.trajectory, res_a.trajectory, rtol=1e-4, atol=1e-5)


def test_verbose_progress_prints(rng, capsys):
    traj, cams, gauss = make_scene(rng, T=10, J=3)
    ref = PoseRefiner(gauss, traj + rng.normal(0, 1, traj.shape), cams)
    ref.sgd_optimize(lr=0.01, max_iter=25, patience=10**6, verbose=True,
                     print_frequency=10, lambda_smooth=0.0, lambda_body_length=0.0)
    out = capsys.readouterr().out
    assert "Iteration" in out and "total_cost" in out


def test_cli_gate_report_prints(tmp_path, rng, capsys):
    """VERDICT r4 #6: the refine CLI must surface the auto-gate tally and a
    reference-compat notice whenever the gate froze windows."""
    import os

    import yaml
    from multi_camera_3d_pose_estimation_tpu.cli.refine import (
        build_parser,
        run_refinement,
    )
    from multi_camera_3d_pose_estimation_tpu.io import (
        save_camera_intrinsics,
        save_extrinsic_calibration_parameters,
        save_camera_names,
    )

    # Initial trajectory exactly at the truth + observations scattered by
    # the claimed sigma -> every window sits below the noise floor and the
    # gate freezes them all (same construction as the gate unit test).
    traj, cams, gauss = make_scene(rng, T=12, J=4, sigma=4.0)
    noisy = gauss.copy()
    noisy[..., :2] += rng.normal(0, 4.0, noisy[..., :2].shape)
    names = {0: "left", 1: "right"}
    for c, name in names.items():
        K, R, Tv, dist = cams[c]
        save_camera_intrinsics(K, np.zeros((1, 5)), name, root_path=str(tmp_path))
        save_extrinsic_calibration_parameters(
            R, Tv.reshape(3, 1), name, root_dir=str(tmp_path)
        )
    save_camera_names(names, "left", str(tmp_path))
    np.save(tmp_path / "kpts_3d.npy", traj)
    np.save(tmp_path / "heatmaps_2d.npy", noisy)
    params_yaml = tmp_path / "refinement_params.yaml"
    params_yaml.write_text(yaml.safe_dump({
        "SGD": {"lr": 0.05, "max_iter": 20, "patience": 20,
                "lambda_smooth": 0.0, "lambda_body_length": 0.0},
    }))

    args = build_parser().parse_args([
        "--run_path", str(tmp_path),
        "--refinement_types", "SGD",
        "--kpts_3d", str(tmp_path / "kpts_3d.npy"),
        "--heatmaps_2d", str(tmp_path / "heatmaps_2d.npy"),
        "--refinement_params_yaml", str(params_yaml),
        "--extrinsic_params_dir",
        os.path.join(str(tmp_path), "extrinsic_camera_parameters"),
        "--intrinsic_params_dir",
        os.path.join(str(tmp_path), "intrinsic_camera_parameters"),
        "--ignore_body_lengths",
    ])
    results = run_refinement(args)
    out = capsys.readouterr().out
    import re

    m = re.search(r"auto-gate report: (\d+)/(\d+) windows frozen", out)
    assert m, out
    assert int(m.group(1)) == int(m.group(2)) > 0, out  # all below the floor
    assert "deviates from the reference" in out
    assert "auto_gate: false" in out
    # Frozen windows keep the initial trajectory (float32 round-trip only).
    np.testing.assert_allclose(results["SGD"], traj, atol=1e-3)

    # Reference-compat run: auto_gate off -> no gate report at all.
    params_yaml.write_text(yaml.safe_dump({
        "SGD": {"lr": 0.05, "max_iter": 20, "patience": 20,
                "lambda_smooth": 0.0, "lambda_body_length": 0.0,
                "auto_gate": False},
    }))
    run_refinement(args)
    out = capsys.readouterr().out
    assert "auto-gate report" not in out


def test_body_length_cost_gradient_finite_on_coincident_joints():
    """sqrt'(0) is NaN: coincident joints (degenerate init) must not poison
    the gradient."""
    import jax
    import jax.numpy as jnp

    from multi_camera_3d_pose_estimation_tpu.refine.costs import body_length_cost

    traj = jnp.zeros((4, 3, 3))  # ALL joints coincide
    e_s = jnp.asarray([0, 1])
    e_e = jnp.asarray([1, 2])
    tgt = jnp.asarray([30.0, 40.0])
    g = jax.grad(lambda t: body_length_cost(t, e_s, e_e, tgt))(traj)
    assert bool(jnp.isfinite(g).all())


def test_huber_likelihood_bounds_outlier_pull(rng):
    """Huberized likelihood: a confidently-wrong 2D mode must not drag the
    refined joint as far as the pure Gaussian objective does (VERDICT r3
    #3a)."""
    traj, cams, gauss = make_scene(rng, T=10, J=4, sigma=2.0)
    # Corrupt one camera's mean for one joint across all frames: a
    # persistent wrong mode 80 px away.
    bad = gauss.copy()
    bad[:, 0, 2, 0] += 80.0
    init = traj.copy()

    def run(**kw):
        ref = PoseRefiner(bad, init.copy(), cams)
        res = ref.sgd_optimize(
            lr=0.05, max_iter=300, patience=300, lambda_smooth=0.0,
            lambda_body_length=0.0, auto_gate=False, **kw,
        )
        return np.linalg.norm(res.trajectory - traj, axis=-1).mean()

    err_gauss = run()
    err_huber = run(huber_delta=2.0)
    assert err_huber < err_gauss, (err_huber, err_gauss)


def test_gaussian_log_likelihood_huber_values():
    """Value pin: quadratic inside delta, linear beyond, tempered by tau."""
    from multi_camera_3d_pose_estimation_tpu.refine.costs import (
        gaussian_log_likelihood,
    )

    ci = np.eye(2)[None]
    mean = np.zeros((1, 2))
    inside = np.asarray([[1.0, 0.0]])   # m = 1 <= delta
    outside = np.asarray([[5.0, 0.0]])  # m = 5 > delta = 2
    g_in = float(gaussian_log_likelihood(inside, mean, cov_inv=ci,
                                         huber_delta=2.0)[0])
    g_out = float(gaussian_log_likelihood(outside, mean, cov_inv=ci,
                                          huber_delta=2.0)[0])
    assert abs(g_in - (-0.5)) < 1e-6
    assert abs(g_out - (-(2.0 * (5.0 - 1.0)))) < 1e-6  # -delta*(m - delta/2)
    g_temp = float(gaussian_log_likelihood(outside, mean, cov_inv=ci,
                                           temperature=4.0)[0])
    assert abs(g_temp - (-0.5 * 25.0 / 4.0)) < 1e-5


def test_auto_gate_skips_below_noise_floor(rng):
    """Auto-gate (VERDICT r3 #3b): initial trajectory already at the truth,
    observations scattered by exactly the claimed covariance -> every
    window is below the 2D noise floor, the likelihood is gated off, and
    the trajectory must NOT be degraded.  The ungated control drifts."""
    traj, cams, gauss = make_scene(rng, T=16, J=4, sigma=4.0)
    # Observation noise consistent with the claimed sigma: the means move
    # off the true projections by ~sigma, so the MLE pull is pure variance.
    noisy_gauss = gauss.copy()
    noisy_gauss[..., :2] += rng.normal(0, 4.0, noisy_gauss[..., :2].shape)

    def run(auto_gate):
        ref = PoseRefiner(noisy_gauss, traj.copy(), cams)
        res = ref.sgd_optimize(
            lr=0.05, max_iter=200, patience=200, lambda_smooth=0.0,
            lambda_body_length=0.0, auto_gate=auto_gate,
        )
        return res, np.linalg.norm(res.trajectory - traj, axis=-1).mean()

    res_gated, err_gated = run(True)
    assert res_gated.gate_weights is not None
    assert (res_gated.gate_weights == 0).all(), res_gated.gate_weights
    # "Untouched" up to the refiner's float32 round-trip of the float64
    # input (~eps * |z| ~ 2e-5); optimization-driven drift is 100x that.
    assert err_gated < 5e-5

    res_free, err_free = run(False)
    assert res_free.gate_weights is None
    assert err_free > 10 * max(err_gated, 1e-5)  # the pull the gate prevents

    # Noisy-init control: residuals far above the floor -> gate must NOT
    # fire, refinement must still do its job.
    bad_init = traj + rng.normal(0, 5.0, traj.shape)
    ref = PoseRefiner(gauss, bad_init, cams)
    res = ref.sgd_optimize(
        lr=0.05, max_iter=200, patience=200, lambda_smooth=0.0,
        lambda_body_length=0.0,
    )
    assert (res.gate_weights == 1).all(), res.gate_weights
    err0 = np.linalg.norm(bad_init - traj, axis=-1).mean()
    err1 = np.linalg.norm(res.trajectory - traj, axis=-1).mean()
    assert err1 < err0


def test_simcc_axis_variance_recovers_known_sigma():
    """SimCC covariance path: factorized Gaussian logits -> per-axis
    softmax variance == sigma_bin^2, and under SimCC's p(x,y)=p(x)p(y)
    factorization Cov[x,y]=0 is EXACT (models/topdown.py)."""
    import jax.numpy as jnp

    from multi_camera_3d_pose_estimation_tpu.models.topdown import (
        _simcc_axis_var,
    )

    n = 384  # 192 px crop * split_ratio 2
    sigma_bins = 6.0
    mu = 200.0
    coords = np.arange(n)
    logits = -((coords - mu) ** 2) / (2 * sigma_bins**2)
    var = float(_simcc_axis_var(jnp.asarray(logits[None, None]))[0, 0])
    assert abs(var - sigma_bins**2) / sigma_bins**2 < 1e-3
    # crop-pixel conversion used by _predict: /split_ratio^2
    assert abs(var / 4.0 - (sigma_bins / 2.0) ** 2) < 1e-6


def test_refinement_on_simcc_vs_heatmap_gaussians(rng):
    """Refinement MPJPE pin on SimCC-style Gaussians (diagonal,
    anisotropic, zero cross-term) vs heatmap-moment Gaussians (isotropic
    here): both must converge, within 2x of each other (VERDICT r3 #7)."""
    traj, cams, gauss_hm = make_scene(rng, T=16, J=4, sigma=2.0)
    # SimCC-style: same means, anisotropic diagonal covariance.
    gauss_sc = gauss_hm.copy()
    gauss_sc[..., 2] = 1.5**2  # var_x
    gauss_sc[..., 5] = 3.0**2  # var_y
    gauss_sc[..., 3] = gauss_sc[..., 4] = 0.0  # exact under factorization
    noisy = traj + rng.normal(0, 4.0, traj.shape)

    def run(g):
        ref = PoseRefiner(g, noisy.copy(), cams)
        res = ref.sgd_optimize(
            lr=0.05, max_iter=250, patience=250, lambda_smooth=0.0,
            lambda_body_length=0.0, auto_gate=False,
        )
        return np.linalg.norm(res.trajectory - traj, axis=-1).mean()

    err0 = np.linalg.norm(noisy - traj, axis=-1).mean()
    err_hm = run(gauss_hm)
    err_sc = run(gauss_sc)
    assert err_hm < 0.5 * err0
    assert err_sc < 0.5 * err0
    assert err_sc < 2.0 * err_hm and err_hm < 2.0 * err_sc, (err_hm, err_sc)
