"""Camera-parameter persistence — byte-format-compatible `.dat` files.

Wire-format parity with the reference so its artifacts are directly
consumable (SURVEY.md §1 dataflow table):

- ``intrinsic_camera_parameters/<name>.dat``: "intrinsic:" header, 3 rows of
  K, "distortion:" header, one row of 5 coefficients
  (writer utils.py:204-228, reader utils.py:750-770).
- ``extrinsic_camera_parameters/rot_trans_<name>.dat``: "R:" 3 rows,
  "T:" 3 rows (writer utils.py:720-747, reader utils.py:772-793).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..ops.geometry import projection_matrix as _projection_matrix

__all__ = [
    "save_camera_intrinsics",
    "read_camera_parameters",
    "save_extrinsic_calibration_parameters",
    "read_rotation_translation",
    "get_params_from_name",
    "CameraParams",
    "stack_camera_params",
]


def _write_rows(f, rows) -> None:
    for row in np.atleast_2d(np.asarray(rows)):
        f.write(" ".join(str(v) for v in row) + " \n")


def save_camera_intrinsics(camera_matrix, distortion_coefs, camera_name, root_path=None) -> str:
    """Write ``<root>/intrinsic_camera_parameters/<name>.dat``."""
    root_path = root_path or os.getcwd()
    folder = os.path.join(root_path, "intrinsic_camera_parameters")
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, camera_name + ".dat")
    dist = np.asarray(distortion_coefs).reshape(1, -1)
    with open(path, "w") as f:
        f.write("intrinsic:\n")
        _write_rows(f, camera_matrix)
        f.write("distortion:\n")
        _write_rows(f, dist)
    return path


def read_camera_parameters(camera_name: str, params_dir: str = ""):
    """Read K (3,3) and distortion (1,k) from ``<dir>/<name>.dat``."""
    params_dir = params_dir or os.getcwd()
    path = os.path.join(params_dir, camera_name + ".dat")
    with open(path) as f:
        lines = [ln.split() for ln in f.read().splitlines() if ln.strip()]
    # lines[0] == ['intrinsic:'], rows 1-3 == K, row 4 == ['distortion:'], row 5 == dist
    cmtx = np.array([[float(v) for v in lines[i]] for i in (1, 2, 3)])
    dist = np.array([[float(v) for v in lines[5]]])
    return cmtx, dist


def save_extrinsic_calibration_parameters(R, T, camera_name, root_dir=None):
    """Write ``<root>/extrinsic_camera_parameters/rot_trans_<name>.dat``."""
    root_dir = root_dir or os.getcwd()
    folder = os.path.join(root_dir, "extrinsic_camera_parameters")
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, f"rot_trans_{camera_name}.dat")
    with open(path, "w") as f:
        f.write("R:\n")
        _write_rows(f, R)
        f.write("T:\n")
        _write_rows(f, np.asarray(T).reshape(3, 1))
    return R, T


def read_rotation_translation(camera_name: str, params_dir: str = ""):
    """Read R (3,3), T (3,1) from ``<dir>/rot_trans_<name>.dat``."""
    params_dir = params_dir or os.getcwd()
    path = os.path.join(params_dir, "rot_trans_" + camera_name + ".dat")
    with open(path) as f:
        lines = [ln.split() for ln in f.read().splitlines() if ln.strip()]
    rot = np.array([[float(v) for v in lines[i]] for i in (1, 2, 3)])
    trans = np.array([[float(v) for v in lines[i]] for i in (5, 6, 7)])
    return rot, trans


@dataclass
class CameraParams:
    """One camera's full parameter set (K, R, T, dist)."""

    K: np.ndarray
    R: np.ndarray | None
    T: np.ndarray | None
    dist: np.ndarray | None

    @property
    def P(self) -> np.ndarray | None:
        if self.K is None or self.R is None or self.T is None:
            return None
        return np.asarray(_projection_matrix(self.K, self.R, self.T))

    def as_list(self):
        """Reference layout [cmtx, rvec(R), tvec(T), dist] (utils.py:807-828)."""
        return [self.K, self.R, self.T, self.dist]


def get_params_from_name(camera_name, intrinsic_params_dir="", extrinsic_params_dir=""):
    """Load a camera's parameters and projection matrix by name.

    Returns ``(P, [cmtx, R, T, dist])`` like reference utils.py:807-828
    (missing files yield None entries rather than raising).
    """
    intrinsic_params_dir = intrinsic_params_dir or os.path.join(
        os.getcwd(), "intrinsic_camera_parameters"
    )
    extrinsic_params_dir = extrinsic_params_dir or os.path.join(
        os.getcwd(), "extrinsic_camera_parameters"
    )
    cmtx = dist = R = T = None
    try:
        cmtx, dist = read_camera_parameters(camera_name, params_dir=intrinsic_params_dir)
    except OSError:
        pass
    try:
        R, T = read_rotation_translation(camera_name, params_dir=extrinsic_params_dir)
    except OSError:
        pass
    cam = CameraParams(cmtx, R, T, dist)
    return cam.P, cam.as_list()


def stack_camera_params(cams: dict | list) -> dict[str, np.ndarray]:
    """Stack per-camera [K, R, T, dist] lists into jit-ready arrays.

    Input: dict (ordered by key) or list of ``[K, R, T, dist]``.
    Output: {"K": (n,3,3), "R": (n,3,3), "T": (n,3), "dist": (n,5)} —
    the layout the batched triangulation/projection kernels consume.
    """
    if isinstance(cams, dict):
        items = [cams[k] for k in sorted(cams.keys())]
    else:
        items = list(cams)
    Ks, Rs, Ts, ds = [], [], [], []
    for K, R, T, dist in items:
        Ks.append(np.asarray(K, np.float64))
        Rs.append(np.asarray(R, np.float64).reshape(3, 3))
        Ts.append(np.asarray(T, np.float64).reshape(3))
        d = np.zeros(5) if dist is None else np.asarray(dist, np.float64).reshape(-1)
        if d.size < 5:
            d = np.pad(d, (0, 5 - d.size))
        ds.append(d[:5])
    return {
        "K": np.stack(Ks),
        "R": np.stack(Rs),
        "T": np.stack(Ts),
        "dist": np.stack(ds),
    }
