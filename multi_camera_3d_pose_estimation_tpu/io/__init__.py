"""Artifact-compatible IO: camera params, manifests, configs, frames."""

from .camera_params import (
    save_camera_intrinsics,
    read_camera_parameters,
    save_extrinsic_calibration_parameters,
    read_rotation_translation,
    get_params_from_name,
    CameraParams,
    stack_camera_params,
)
from .manifest import (
    create_new_numbered_folder,
    load_if_exists,
    write_recording_log,
    read_recording_log,
    save_camera_names,
    load_camera_names,
)
from .config import load_config, get_function_defaults, prepare_kwargs
from .frames import (
    VideoReader,
    frame_generator,
    load_frames,
    load_image_frames,
    write_keypoints_to_disk,
    BatchedFramePipeline,
)

__all__ = [
    "save_camera_intrinsics",
    "read_camera_parameters",
    "save_extrinsic_calibration_parameters",
    "read_rotation_translation",
    "get_params_from_name",
    "CameraParams",
    "stack_camera_params",
    "create_new_numbered_folder",
    "load_if_exists",
    "write_recording_log",
    "read_recording_log",
    "save_camera_names",
    "load_camera_names",
    "load_config",
    "VideoReader",
    "frame_generator",
    "load_frames",
    "load_image_frames",
    "write_keypoints_to_disk",
    "BatchedFramePipeline",
    "get_function_defaults",
    "prepare_kwargs",
]
