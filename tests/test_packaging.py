"""Packaging sanity: pyproject metadata and the console entry point.

The reference ships as a clone-and-run repo with a conda env spec; a
standalone framework must additionally be installable (PEP 517).  These
checks keep the wheel surface honest without touching the network:
metadata parses, the package-data globs still match the native runtime
sources (which self-build on first import — native/__init__.py), and
the console script resolves to the CLI dispatcher.
"""

import os
import tomllib

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
