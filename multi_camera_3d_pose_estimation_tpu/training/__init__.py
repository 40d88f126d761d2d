"""Training subsystem for the 2D models (heatmap / SimCC / detector).

The reference consumes pretrained MMPose/MMDetection checkpoints
(mmpose_pose_estimation.py:98-109); this framework's models are
from-scratch, so training is a first-class capability instead of an
external dependency: supervised target rendering, losses, augmentation,
and jitted data-parallel train steps over a device mesh.
"""

from .targets import (render_heatmap_targets, render_simcc_targets,
                      render_centernet_targets)
from .losses import heatmap_mse_loss, simcc_kl_loss, centernet_focal_loss
from .augment import random_flip_pose, random_affine_params
from .loop import make_train_step, TrainState
from .data import parse_coco_keypoints, KeypointBatcher, make_crop_batch
from .synthetic import (SyntheticSceneConfig, coco17_pose, make_rig,
                        make_scaled_scene, project_oracle, write_coco_dataset)
from .harness import (run_accuracy_harness, train_synthetic_detector,
                      train_synthetic_pose, train_synthetic_simcc)

__all__ = [
    "render_heatmap_targets",
    "render_simcc_targets",
    "render_centernet_targets",
    "heatmap_mse_loss",
    "simcc_kl_loss",
    "centernet_focal_loss",
    "random_flip_pose",
    "random_affine_params",
    "make_train_step",
    "TrainState",
    "parse_coco_keypoints",
    "KeypointBatcher",
    "make_crop_batch",
    "SyntheticSceneConfig",
    "coco17_pose",
    "make_rig",
    "make_scaled_scene",
    "project_oracle",
    "write_coco_dataset",
    "run_accuracy_harness",
    "train_synthetic_detector",
    "train_synthetic_pose",
    "train_synthetic_simcc",
]
