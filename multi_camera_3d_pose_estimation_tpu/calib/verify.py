"""Calibration verification: world-axis overlays + world-origin anchoring.

Headless re-design of the reference's verification tooling:
- `check_calibration` (utils.py:464-552): project shifted world axes into
  both cameras' frames and draw them — here onto provided images (or blank
  canvases), returning/saving the overlays instead of live cv.imshow.
- `get_world_space_origin` (utils.py:639-664): anchor the world frame to a
  checkerboard photographed by the origin camera via our jitted planar PnP
  (replacing cv.solvePnP).
- `get_cam1_to_world_transforms` (utils.py:666-700): compose the stereo
  pose with the world anchor and draw axes in both views.
"""

from __future__ import annotations

import numpy as np

from ..ops.geometry import project_points, rodrigues_matrix
from .checkerboard import board_object_points
from .corners import find_checkerboard_corners
from .pnp import solve_pnp

__all__ = [
    "draw_world_axes",
    "check_calibration",
    "get_world_space_origin",
    "get_cam1_to_world_transforms",
]

_AXIS_COLORS = [(0, 0, 255), (0, 255, 0), (255, 0, 0)]  # BGR for XYZ


def draw_world_axes(frame, K, R, T, dist=None, axis_length: float = 5.0,
                    origin_shift=(0.0, 0.0, 0.0)):
    """Draw the projected world X/Y/Z axes onto ``frame`` (in place copy).

    Returns (frame_with_axes, axis_points_2d (4, 2)).
    """
    pts3d = axis_length * np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float64
    ) + np.asarray(origin_shift, np.float64)
    pts2d = np.asarray(project_points(pts3d, K, R, np.asarray(T).reshape(3),
                                      dist_coeffs=dist))
    out = np.ascontiguousarray(np.asarray(frame).copy())
    try:
        import cv2

        origin = tuple(np.round(pts2d[0]).astype(int))
        for color, p in zip(_AXIS_COLORS, pts2d[1:]):
            cv2.line(out, origin, tuple(np.round(p).astype(int)), color, 2)
    except ImportError:
        pass
    return out, pts2d


def check_calibration(camera0_name, camera0_data, camera1_name, camera1_data,
                      frames=None, z_shift: float = 50.0, save_dir=None):
    """Project shifted world axes into both cameras; return overlay frames.

    ``camera*_data``: [K, dist, R, T] (the reference's layout at
    utils.py:466-474).  ``frames``: optional (frame0, frame1); blank
    canvases otherwise.  With ``save_dir`` the overlays are written as
    ``check_calibration_<name>.png``.
    """
    K0, d0, R0, T0 = camera0_data
    K1, d1, R1, T1 = camera1_data
    if frames is None:
        frames = (np.zeros((720, 1280, 3), np.uint8),) * 2
    shift = (0.0, 0.0, float(z_shift))
    out0, pts0 = draw_world_axes(frames[0], K0, R0, T0, d0, origin_shift=shift)
    out1, pts1 = draw_world_axes(frames[1], K1, R1, T1, d1, origin_shift=shift)
    if save_dir:
        import os

        import cv2

        cv2.imwrite(os.path.join(save_dir, f"check_calibration_{camera0_name}.png"), out0)
        cv2.imwrite(os.path.join(save_dir, f"check_calibration_{camera1_name}.png"), out1)
    return (out0, out1), (pts0, pts1)


def get_world_space_origin(K, dist, image, rows: int, columns: int,
                           square_size: float = 1.0):
    """(R, T) anchoring the world frame to a photographed checkerboard."""
    found, corners = find_checkerboard_corners(image, rows, columns)
    if not found:
        raise RuntimeError("checkerboard not found in world-origin image")
    obj = board_object_points(rows, columns, square_size)
    rvec, tvec = solve_pnp(obj, corners.astype(np.float64), K, dist)
    return np.asarray(rodrigues_matrix(rvec)), np.asarray(tvec).reshape(3, 1)


def get_cam1_to_world_transforms(K0, dist0, R_W0, T_W0, K1, dist1, R_01, T_01,
                                 frame0=None, frame1=None, axis_length: float = 5.0,
                                 save_dir=None):
    """Compose world anchor with the stereo pose; draw axes in both views.

    Returns ``(R_W1, T_W1, (overlay0, overlay1))``.
    """
    R_W0 = np.asarray(R_W0)
    T_W0 = np.asarray(T_W0).reshape(3, 1)
    R_01 = np.asarray(R_01)
    T_01 = np.asarray(T_01).reshape(3, 1)
    R_W1 = R_01 @ R_W0
    T_W1 = R_01 @ T_W0 + T_01

    if frame0 is None:
        frame0 = np.zeros((720, 1280, 3), np.uint8)
    if frame1 is None:
        frame1 = np.zeros((720, 1280, 3), np.uint8)
    out0, _ = draw_world_axes(frame0, K0, R_W0, T_W0, dist0, axis_length)
    out1, _ = draw_world_axes(frame1, K1, R_W1, T_W1, dist1, axis_length)
    if save_dir:
        import os

        import cv2

        cv2.imwrite(os.path.join(save_dir, "world_axes_cam0.png"), out0)
        cv2.imwrite(os.path.join(save_dir, "world_axes_cam1.png"), out1)
    return R_W1, T_W1, (out0, out1)
