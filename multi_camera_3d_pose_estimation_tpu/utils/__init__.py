"""Skeleton metadata, keypoint-schema conversion, misc helpers."""

from .skeleton import (
    CONNECTIVITY_DICT,
    POINT_INFO,
    BODYPARTS,
    generate_connectivity_names,
    get_body_part_vects,
    get_body_part_lengths,
    body_length_edges,
    change_origin,
)
from .keypoint_convert import convert_keypoint_definition
from .profiling import StepTimer, trace, profile_refinement_costs

__all__ = [
    "CONNECTIVITY_DICT",
    "POINT_INFO",
    "BODYPARTS",
    "generate_connectivity_names",
    "get_body_part_vects",
    "get_body_part_lengths",
    "body_length_edges",
    "change_origin",
    "convert_keypoint_definition",
    "StepTimer",
    "trace",
    "profile_refinement_costs",
]
