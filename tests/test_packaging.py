"""Packaging sanity: pyproject metadata and the console entry point.

The reference ships as a clone-and-run repo with a conda env spec; a
standalone framework must additionally be installable (PEP 517).  These
checks keep the wheel surface honest without touching the network:
metadata parses, the package-data globs still match the native runtime
sources (which self-build on first import — native/__init__.py), and
the console script resolves to the CLI dispatcher.
"""

import os

try:
    import tomllib  # Python 3.11+
except ImportError:  # pragma: no cover - 3.10 fallback (tomli in the test extra)
    import tomli as tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PYPROJECT = os.path.join(REPO, "pyproject.toml")


@pytest.fixture(scope="module")
def project():
    with open(PYPROJECT, "rb") as f:
        return tomllib.load(f)


def test_pyproject_parses(project):
    assert project["project"]["name"] == "multi-camera-3d-pose-estimation-tpu"
    assert project["build-system"]["build-backend"] == "setuptools.build_meta"


def test_native_sources_ship_as_package_data(project):
    globs = project["tool"]["setuptools"]["package-data"][
        "multi_camera_3d_pose_estimation_tpu.native"
    ]
    native = os.path.join(REPO, "multi_camera_3d_pose_estimation_tpu", "native")
    import fnmatch

    files = os.listdir(native)
    for required in ("mediadec.cpp", "Makefile"):
        assert any(
            fnmatch.fnmatch(required, g) for g in globs
        ), f"{required} not covered by package-data globs {globs}"
        assert required in files


def test_console_script_resolves(project):
    target = project["project"]["scripts"]["mc3d-pose-tpu"]
    mod_name, func_name = target.split(":")
    import importlib

    mod = importlib.import_module(mod_name)
    fn = getattr(mod, func_name)
    assert callable(fn)
    # The dispatcher exits 0 on --help and 2 on an unknown command.
    with pytest.raises(SystemExit) as e:
        fn(["--help"])
    assert e.value.code == 0
    with pytest.raises(SystemExit) as e:
        fn(["not_a_command"])
    assert e.value.code == 2


def test_version_single_source(project):
    """pyproject declares version dynamic from __version__ (ADVICE r3)."""
    assert "version" in project["project"]["dynamic"]
    attr = project["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    assert attr == "multi_camera_3d_pose_estimation_tpu.__version__"
    import multi_camera_3d_pose_estimation_tpu as pkg

    parts = pkg.__version__.split(".")
    assert len(parts) >= 2 and all(p.isdigit() for p in parts)


def test_smoke_tier_covers_subsystems():
    """Every smoke-tier node exists (collection drift breaks the CI tier
    silently otherwise) and the tier touches each major subsystem."""
    from tests.conftest import SMOKE_TESTS

    files = {t.split("::")[0] for t in SMOKE_TESTS}
    for subsystem_file in (
        "test_triangulation.py", "test_geometry.py", "test_calibration.py",
        "test_refinement.py", "test_models.py", "test_parallel.py",
        "test_io.py", "test_media.py", "test_training.py", "test_cli_viz.py",
    ):
        assert subsystem_file in files, f"smoke tier lost {subsystem_file}"
