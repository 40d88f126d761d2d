"""Test config: CPU backend with 8 virtual devices, float64 enabled.

Multi-chip sharding tests run on a virtual CPU mesh per SURVEY.md §4
("XLA_FLAGS=--xla_force_host_platform_device_count=N").  x64 is enabled so
numpy float64 oracles can be compared at tight tolerances; library code uses
explicit dtypes and must remain correct in float32.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize hook forces jax_platforms=axon (the tunneled TPU)
# before conftest runs, so the env var alone is not enough — override the
# live config to pin tests to the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache — the test box has a single CPU core, so repeated
# XLA compiles dominate wall time without this.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    # Markers are declared in pyproject.toml ([tool.pytest.ini_options]),
    # which also sets the default tier to `-m 'not slow'` so the default
    # `pytest tests/` stays under the ~8-minute budget on a 1-core box
    # (VERDICT r4 #7).  Re-declared here for direct-invocation robustness.
    config.addinivalue_line(
        "markers", "slow: long-running convergence/training tests "
        "(excluded by default; run with -m slow, or everything with "
        "-m 'slow or not slow')"
    )
    config.addinivalue_line(
        "markers", "smoke: fast CI tier — at least one test per subsystem, "
        "< 3 min total on a 1-core box (select with -m smoke)"
    )


# One representative fast test per subsystem (VERDICT r3 #8).  Centralized
# here (applied in pytest_collection_modifyitems) so the tier's total budget
# can be tuned in one place; membership is asserted by
# tests/test_packaging.py::test_smoke_tier_covers_subsystems.
SMOKE_TESTS = {
    # core math
    "test_triangulation.py::test_triangulate_dlt_matches_scalar_oracle",
    "test_geometry.py::test_project_points_matches_oracle",
    "test_decode.py::test_moments_match_oracle",
    # calibration
    "test_calibration.py::test_solve_pnp",
    "test_opencv_parity.py::test_rodrigues_parity",
    # refinement
    "test_interpolation.py::test_matches_oracle_default",
    "test_refinement.py::test_refinement_early_stops",
    # models + converter
    "test_models.py::test_topdown_estimator_heatmap_path",
    "test_torch_parity.py::test_rtmpose_converter_missing_keys_raise",
    "test_detector_e2e.py::test_build_detector_full_frame_registry",
    # pallas kernels
    "test_pallas_decode.py::test_fused_matches_jnp_pair",
    "test_pallas_window_attention.py::test_kernel_window_batching_mask_phase",
    # parallel / sharding
    "test_parallel.py::test_mesh_creation",
    # io / media / sync / acquisition
    "test_io.py::test_intrinsics_roundtrip",
    "test_media.py::test_native_library_builds",
    "test_live_capture.py::test_sync_picker_headless_passthrough",
    # training
    "test_training.py::test_heatmap_targets_peak_and_mask",
    # cli / viz / packaging
    "test_cli_viz.py::test_main_dispatcher",
    "test_packaging.py::test_pyproject_parses",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        rel = item.nodeid.split("/")[-1]
        base = rel.split("[")[0]
        if rel in SMOKE_TESTS or base in SMOKE_TESTS:
            item.add_marker(_pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def camera_pair(rng):
    """Two synthetic calibrated cameras with mild distortion + 3D points."""
    K1 = np.array([[920.0, 0.0, 640.0], [0.0, 910.0, 360.0], [0.0, 0.0, 1.0]])
    K2 = np.array([[880.0, 0.0, 620.0], [0.0, 885.0, 380.0], [0.0, 0.0, 1.0]])
    d1 = np.array([-0.21, 0.05, 0.0008, -0.0011, 0.01])
    d2 = np.array([0.12, -0.03, -0.0006, 0.0009, 0.002])
    R1 = np.eye(3)
    T1 = np.zeros(3)
    # Camera 2: rotated ~25 deg about Y, translated.
    th = np.deg2rad(25.0)
    R2 = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
    )
    T2 = np.array([-120.0, 5.0, 40.0])
    pts3d = rng.uniform([-50, -50, 250], [50, 50, 450], size=(60, 3))
    return dict(K1=K1, K2=K2, d1=d1, d2=d2, R1=R1, T1=T1, R2=R2, T2=T2, pts3d=pts3d)


def project_np(pts3d, K, R, T, dist=None):
    """Float64 numpy oracle: pinhole + 5-coeff distortion projection."""
    cam = pts3d @ R.T + T
    x = cam[:, 0] / cam[:, 2]
    y = cam[:, 1] / cam[:, 2]
    if dist is not None:
        k1, k2, p1, p2, k3 = dist
        r2 = x * x + y * y
        radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
        xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        x, y = xd, yd
    u = K[0, 0] * x + K[0, 1] * y + K[0, 2]
    v = K[1, 1] * y + K[1, 2]
    return np.stack([u, v], axis=-1)
