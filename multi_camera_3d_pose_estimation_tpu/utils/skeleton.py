"""Skeleton metadata: edge lists, joint info, body-part groups.

Data-compatible with the reference's public config surface
(utils.py:1067-1171): the `<start>_<end>` edge naming defined by
`generate_connectivity_names` is the schema of `body_part_lengths.yaml`
(examples/body_part_lengths.yaml), so these tables must match exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "CONNECTIVITY_DICT",
    "POINT_INFO",
    "BODYPARTS",
    "generate_connectivity_names",
    "get_body_part_vects",
    "get_body_part_lengths",
    "body_length_edges",
    "change_origin",
]

# Edge lists per skeleton convention (reference utils.py:1068-1074).
CONNECTIVITY_DICT = {
    "cmu": [
        (0, 2), (0, 9), (1, 0), (1, 17), (2, 12), (3, 0), (4, 3), (5, 4),
        (6, 2), (7, 6), (8, 7), (9, 10), (10, 11), (12, 13), (13, 14),
        (15, 1), (16, 15), (17, 18),
    ],
    "coco": [
        (0, 1), (0, 2), (1, 3), (2, 4), (5, 7), (7, 9), (6, 8), (8, 10),
        (11, 13), (13, 15), (12, 14), (14, 16), (5, 6), (5, 11), (6, 12),
        (11, 12),
    ],
    "mpii": [
        (0, 1), (1, 2), (2, 6), (5, 4), (4, 3), (3, 6), (6, 7), (7, 8),
        (8, 9), (8, 12), (8, 13), (10, 11), (11, 12), (13, 14), (14, 15),
    ],
    "human36m": [
        (0, 1), (1, 2), (2, 6), (5, 4), (4, 3), (3, 6), (6, 7), (7, 8),
        (8, 9), (9, 16), (8, 12), (11, 12), (10, 11), (8, 13), (13, 14),
        (14, 15),
    ],
    "kth": [
        (0, 1), (1, 2), (5, 4), (4, 3), (6, 7), (7, 8), (11, 10), (10, 9),
        (2, 3), (3, 9), (2, 8), (9, 12), (8, 12), (12, 13),
    ],
}

# COCO-17 joint table (name, color, upper/lower, left/right swap partner) —
# data parity with reference utils.py:1077-1161.
_COCO_JOINTS = [
    ("nose", [51, 153, 255], "upper", ""),
    ("left_eye", [51, 153, 255], "upper", "right_eye"),
    ("right_eye", [51, 153, 255], "upper", "left_eye"),
    ("left_ear", [51, 153, 255], "upper", "right_ear"),
    ("right_ear", [51, 153, 255], "upper", "left_ear"),
    ("left_shoulder", [0, 255, 0], "upper", "right_shoulder"),
    ("right_shoulder", [255, 128, 0], "upper", "left_shoulder"),
    ("left_elbow", [0, 255, 0], "upper", "right_elbow"),
    ("right_elbow", [255, 128, 0], "upper", "left_elbow"),
    ("left_wrist", [0, 255, 0], "upper", "right_wrist"),
    ("right_wrist", [255, 128, 0], "upper", "left_wrist"),
    ("left_hip", [0, 255, 0], "lower", "right_hip"),
    ("right_hip", [255, 128, 0], "lower", "left_hip"),
    ("left_knee", [0, 255, 0], "lower", "right_knee"),
    ("right_knee", [255, 128, 0], "lower", "left_knee"),
    ("left_ankle", [0, 255, 0], "lower", "right_ankle"),
    ("right_ankle", [255, 128, 0], "lower", "left_ankle"),
]

POINT_INFO = {
    "coco": {
        i: {"name": n, "id": i, "color": c, "type": t, "swap": s}
        for i, (n, c, t, s) in enumerate(_COCO_JOINTS)
    }
}

# Body-part groups for plotting (reference utils.py:1165-1171).
BODYPARTS = {
    "coco": {
        "torso": [[11, 12]],
        "armr": [[6, 8], [8, 10]],
        "arml": [[5, 7], [7, 9]],
        "legr": [[11, 13], [13, 15]],
        "legl": [[12, 14], [14, 16]],
    }
}


def generate_connectivity_names(connectivity_list, point_names) -> dict[int, str]:
    """Edge index -> "<start_name>_<end_name>" (reference utils.py:1175-1181)."""
    return {
        idx: f"{point_names[a]['name']}_{point_names[b]['name']}"
        for idx, (a, b) in enumerate(connectivity_list)
    }


def get_body_part_vects(pose: jax.Array, connectivity_type: str = "coco") -> dict[str, jax.Array]:
    """Per-edge vectors: pose (..., J, D) -> {edge_name: (..., D)}.

    Matches reference utils.py:1185-1194 semantics (end - start).
    """
    pose = jnp.asarray(pose)
    info = POINT_INFO[connectivity_type]
    edges = CONNECTIVITY_DICT[connectivity_type]
    names = generate_connectivity_names(edges, info)
    return {
        names[i]: pose[..., b, :] - pose[..., a, :] for i, (a, b) in enumerate(edges)
    }


def get_body_part_lengths(pose: jax.Array, connectivity_type: str = "coco") -> dict[str, jax.Array]:
    """Per-edge Euclidean lengths: {edge_name: (...,)} (utils.py:1197-1208)."""
    vects = get_body_part_vects(pose, connectivity_type)
    return {k: jnp.linalg.norm(v, axis=-1) for k, v in vects.items()}


def body_length_edges(
    target_lengths: dict[str, float], connectivity_type: str = "coco"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compile a body-length YAML dict into jit-ready index arrays.

    Returns (start_idx (E,), end_idx (E,), target (E,)) ordered by the dict's
    key order (the order the reference's `create_body_length_vect` uses,
    pose_refinement.py:768-781).  Host-side helper: the dict of names stays
    outside jit; the cost kernel consumes only these static arrays.
    """
    info = POINT_INFO[connectivity_type]
    edges = CONNECTIVITY_DICT[connectivity_type]
    names = generate_connectivity_names(edges, info)
    by_name = {v: edges[k] for k, v in names.items()}
    starts, ends, targets = [], [], []
    for name, length in target_lengths.items():
        if name not in by_name:
            raise KeyError(
                f"unknown body segment '{name}'; valid names: {sorted(by_name)}"
            )
        a, b = by_name[name]
        starts.append(a)
        ends.append(b)
        targets.append(float(length))
    return np.array(starts, np.int32), np.array(ends, np.int32), np.array(targets, np.float64)


def change_origin(points, height):
    """Flip the pixel y-origin (top-left ↔ bottom-left) for (..., 2) points.

    Behaviour parity with the onepose y-flip helper at
    setup_camera_configuration.py:129-132.
    """
    points = jnp.asarray(points)
    return points.at[..., 1].set(height - points[..., 1])
