"""Skeleton metadata, keypoint-schema conversion, misc helpers."""

from .skeleton import (
    CONNECTIVITY_DICT,
    POINT_INFO,
    BODYPARTS,
    generate_connectivity_names,
    get_body_part_vects,
    get_body_part_lengths,
    body_length_edges,
)
from .keypoint_convert import convert_keypoint_definition

__all__ = [
    "CONNECTIVITY_DICT",
    "POINT_INFO",
    "BODYPARTS",
    "generate_connectivity_names",
    "get_body_part_vects",
    "get_body_part_lengths",
    "body_length_edges",
    "convert_keypoint_definition",
]
