"""CLI entry points with the reference's flag + YAML surface (L4)."""

from .configure import (
    configure_cameras,
    calibrate_intrinsics_from_images,
    calibrate_stereo_from_images,
)
from .estimate import estimate_pose_from_video, run_pipeline_on_videos
from .record_and_estimate import record_and_estimate_pose
from . import plot, refine

__all__ = [
    "configure_cameras",
    "calibrate_intrinsics_from_images",
    "calibrate_stereo_from_images",
    "estimate_pose_from_video",
    "run_pipeline_on_videos",
    "record_and_estimate_pose",
    "plot",
    "refine",
]
