"""Pure-jnp camera geometry and decode ops (all vmappable, static shapes)."""

from .geometry import (
    make_homogeneous_rep_matrix,
    projection_matrix,
    rodrigues_matrix,
    rodrigues_vector,
    rotation_conversion,
    project_points,
    distort_normalized,
)
from .undistort import undistort_points
from .triangulation import (
    triangulate_dlt,
    triangulate_points,
    triangulate_nview,
    triangulate_top2,
    get_pose_3d,
)
from .moments import heatmap_moments
from .simcc import simcc_decode
from .heatmap_decode import heatmap_argmax_decode, heatmap_dark_decode

__all__ = [
    "make_homogeneous_rep_matrix",
    "projection_matrix",
    "rodrigues_matrix",
    "rodrigues_vector",
    "rotation_conversion",
    "project_points",
    "distort_normalized",
    "undistort_points",
    "triangulate_dlt",
    "triangulate_points",
    "triangulate_nview",
    "triangulate_top2",
    "get_pose_3d",
    "heatmap_moments",
    "simcc_decode",
    "heatmap_argmax_decode",
    "heatmap_dark_decode",
]
