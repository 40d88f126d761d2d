"""Camera calibration: Zhang intrinsics, stereo extrinsics, PnP — jitted LM.

From-scratch replacements for the reference's OpenCV C++ calibration
boundary (SURVEY.md §2.2): `cv.calibrateCamera`, `cv.stereoCalibrate`,
`cv.solvePnP`, plus checkerboard tooling and manual-measurement extrinsics.
"""

from .lm import levenberg_marquardt
from .homography import find_homography
from .intrinsic import (
    calibrate_camera,
    zhang_intrinsics_init,
    extrinsics_from_homography,
)
from .pnp import solve_pnp
from .stereo import stereo_calibrate, mean_rotation
from .manual import compute_extrinsic_from_measurements
from .checkerboard import (
    create_checkerboard_image,
    checkerboard_square_size_cm,
    board_object_points,
)
from .corners import find_checkerboard_corners, refine_corners_subpixel
from .verify import (
    draw_world_axes,
    check_calibration,
    get_world_space_origin,
    get_cam1_to_world_transforms,
)

__all__ = [
    "levenberg_marquardt",
    "find_homography",
    "calibrate_camera",
    "zhang_intrinsics_init",
    "extrinsics_from_homography",
    "solve_pnp",
    "stereo_calibrate",
    "mean_rotation",
    "compute_extrinsic_from_measurements",
    "create_checkerboard_image",
    "checkerboard_square_size_cm",
    "board_object_points",
    "find_checkerboard_corners",
    "refine_corners_subpixel",
    "draw_world_axes",
    "check_calibration",
    "get_world_space_origin",
    "get_cam1_to_world_transforms",
]
