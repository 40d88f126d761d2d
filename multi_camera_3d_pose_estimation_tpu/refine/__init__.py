"""Trajectory refinement: interpolation + jitted MLE optimization."""

from .interpolation import linear_interpolation
from .costs import (
    gaussian_log_likelihood,
    smoothness_cost,
    body_length_cost,
    precompute_cov_inverse,
)
from .optimizer import PoseRefiner, RefineConfig
from .extrinsics import ExtrinsicRefiner

__all__ = [
    "linear_interpolation",
    "gaussian_log_likelihood",
    "smoothness_cost",
    "body_length_cost",
    "precompute_cov_inverse",
    "PoseRefiner",
    "RefineConfig",
    "ExtrinsicRefiner",
]
