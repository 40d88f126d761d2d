"""Synthetic COCO-17 scene generator for accuracy validation.

Zero-egress stand-in for real footage + checkpoints: an animated 3D
stick person with COCO-17 topology, projected into a calibrated
multi-camera rig and rendered as joint disks + limb segments.  Used by
the model-level accuracy harness (tests/test_accuracy_harness.py,
examples/accuracy_harness.py) to produce MPJPE numbers from TRAINED
weights — the validation the reference gets for free from the MMPose
model zoo (mmpose_pose_estimation.py:98-109).

Rendering rules chosen so top-down conventions transfer:
- left/right joint pairs share a colour (appearance is mirror-symmetric,
  so flip-test TTA semantics match real imagery: a mirrored left shoulder
  looks like a right shoulder);
- the person occupies a sub-region of the frame and translates over time,
  so the person detector does real work (crop ≠ full frame).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "coco17_pose",
    "make_rig",
    "project_oracle",
    "render_frame",
    "person_bbox",
    "SyntheticSceneConfig",
    "make_scaled_scene",
    "write_coco_dataset",
]

# COCO-17 order: 0 nose, 1/2 l/r eye, 3/4 l/r ear, 5/6 l/r shoulder,
# 7/8 l/r elbow, 9/10 l/r wrist, 11/12 l/r hip, 13/14 l/r knee,
# 15/16 l/r ankle.
_LIMBS = [
    (5, 7), (7, 9), (6, 8), (8, 10),       # arms
    (11, 13), (13, 15), (12, 14), (14, 16),  # legs
    (5, 6), (11, 12), (5, 11), (6, 12),     # torso
    (0, 1), (0, 2), (1, 3), (2, 4),         # face
]

# Colour per joint TYPE — left/right pairs share it (see module docstring).
_TYPE_COLORS = {
    "nose": (250, 250, 250),
    "eye": (250, 210, 60),
    "ear": (80, 200, 250),
    "shoulder": (250, 80, 80),
    "elbow": (80, 250, 80),
    "wrist": (250, 80, 250),
    "hip": (80, 80, 250),
    "knee": (250, 150, 60),
    "ankle": (60, 250, 200),
}
_JOINT_TYPES = ["nose", "eye", "eye", "ear", "ear", "shoulder", "shoulder",
                "elbow", "elbow", "wrist", "wrist", "hip", "hip",
                "knee", "knee", "ankle", "ankle"]


def coco17_pose(t: float, origin=(0.0, 0.0, 300.0), scale: float = 1.0):
    """A walking 17-joint skeleton at phase ``t`` (radians); world units cm.

    Y grows downward (image-like convention shared with the projector).
    """
    s, c = np.sin(t), np.cos(t)
    swing = 18.0 * s
    p = np.zeros((17, 3))
    # torso anchors
    p[5] = [-16, -55, 0]   # l shoulder
    p[6] = [16, -55, 0]    # r shoulder
    p[11] = [-11, -5, 0]   # l hip
    p[12] = [11, -5, 0]    # r hip
    # head
    p[0] = [0, -74, -6]
    p[1] = [-4, -78, -4]
    p[2] = [4, -78, -4]
    p[3] = [-8, -76, 2]
    p[4] = [8, -76, 2]
    # arms (counter-swing)
    p[7] = p[5] + [-4, 26, -swing * 0.5]
    p[8] = p[6] + [4, 26, swing * 0.5]
    p[9] = p[7] + [-2, 25, -swing]
    p[10] = p[8] + [2, 25, swing]
    # legs (swing)
    p[13] = p[11] + [0, 40, swing * 0.6]
    p[14] = p[12] + [0, 40, -swing * 0.6]
    p[15] = p[13] + [0, 40, swing]
    p[16] = p[14] + [0, 40, -swing]
    # bob + lean
    p[:, 1] += 2.0 * np.abs(c)
    return p * scale + np.asarray(origin)


def make_rig(n_cams: int = 2, width: int = 256, height: int = 256,
             focal: float = 300.0, spread_deg: float = 50.0,
             baseline: float = 260.0):
    """Calibrated ring of cameras aimed at the working volume.

    Returns a list of [K, R, T, dist] (the `io.stack_camera_params` input
    layout).  Zero distortion — the oracle projector stays closed-form.
    """
    cams = []
    for c in range(n_cams):
        K = np.array([[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1.0]])
        frac = c / max(n_cams - 1, 1)
        th = np.deg2rad(-spread_deg / 2 + spread_deg * frac)
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        pos = np.array([-baseline / 2 + baseline * frac, 0.0, -20.0])
        T = -R @ pos
        cams.append([K, R, T, np.zeros(5)])
    return cams


def project_oracle(pts3d: np.ndarray, K, R, T, dist=None) -> np.ndarray:
    """Float64 pinhole projection (..., 3) → (..., 2); no distortion."""
    shape = pts3d.shape[:-1]
    cam = pts3d.reshape(-1, 3) @ np.asarray(R).T + np.asarray(T).reshape(3)
    xy = cam[:, :2] / cam[:, 2:3]
    u = K[0, 0] * xy[:, 0] + K[0, 2]
    v = K[1, 1] * xy[:, 1] + K[1, 2]
    return np.stack([u, v], -1).reshape(*shape, 2)


def render_frame(proj2d: np.ndarray, width: int, height: int,
                 rng: np.random.Generator, noise: int = 45,
                 radius: int = 3) -> np.ndarray:
    """Render one camera view of the person; uint8 (H, W, 3).

    Dark noise background, grey limb segments, joint-type-coloured disks.
    """
    import cv2

    frame = rng.integers(0, noise, (height, width, 3)).astype(np.uint8)
    pts = np.round(proj2d).astype(int)
    for a, b in _LIMBS:
        cv2.line(frame, tuple(pts[a]), tuple(pts[b]), (120, 120, 120), 1)
    for j in range(17):
        color = _TYPE_COLORS[_JOINT_TYPES[j]]
        cv2.circle(frame, tuple(pts[j]), radius, color, -1)
    return frame


def person_bbox(proj2d: np.ndarray, width: int, height: int,
                margin: float = 8.0) -> np.ndarray:
    """Tight joint bbox + margin, clipped to the frame; (4,) xyxy."""
    x0 = max(float(proj2d[:, 0].min()) - margin, 0.0)
    y0 = max(float(proj2d[:, 1].min()) - margin, 0.0)
    x1 = min(float(proj2d[:, 0].max()) + margin, float(width))
    y1 = min(float(proj2d[:, 1].max()) + margin, float(height))
    return np.array([x0, y0, x1, y1], np.float32)


class SyntheticSceneConfig:
    """Scene sampler: moving person + rig; yields frames/labels on demand."""

    def __init__(self, n_cams: int = 2, width: int = 256, height: int = 256,
                 seed: int = 0, scale: float = 0.8):
        self.width, self.height = width, height
        self.cams = make_rig(n_cams, width, height)
        self.rng = np.random.default_rng(seed)
        self.scale = scale

    def trajectory(self, n_frames: int):
        """(T, 17, 3) world trajectory: walk cycle + lateral drift."""
        traj = np.zeros((n_frames, 17, 3))
        for i in range(n_frames):
            t = 2.0 * np.pi * i / max(n_frames / 3, 1)
            ox = 60.0 * np.sin(2 * np.pi * i / max(n_frames, 1))
            oz = 320.0 + 40.0 * np.sin(2 * np.pi * i / max(n_frames * 2, 1))
            traj[i] = coco17_pose(t, origin=(ox, 10.0, oz), scale=self.scale)
        return traj

    def render_views(self, pts3d: np.ndarray):
        """One timestep → (frames (C,H,W,3) uint8, proj (C,17,2), boxes (C,4))."""
        frames, projs, boxes = [], [], []
        for K, R, T, _ in self.cams:
            proj = project_oracle(pts3d, K, R, T)
            frames.append(render_frame(proj, self.width, self.height, self.rng))
            projs.append(proj)
            boxes.append(person_bbox(proj, self.width, self.height))
        return np.stack(frames), np.stack(projs), np.stack(boxes)

    def sample_pose(self):
        """Random standalone pose for training batches: (17,3) world."""
        t = self.rng.uniform(0, 2 * np.pi)
        ox = self.rng.uniform(-70, 70)
        oy = self.rng.uniform(-10, 25)
        oz = self.rng.uniform(270, 380)
        return coco17_pose(t, origin=(ox, oy, oz), scale=self.scale)


def make_scaled_scene(width: int, height: int, seed: int = 0,
                      n_cams: int = 1) -> "SyntheticSceneConfig":
    """A scene whose rig is re-framed for the given resolution.

    The default rig frames the person for 256px images; scaling the focal
    length with the frame keeps every joint in view at any resolution
    (the train/eval contract `write_coco_dataset` and the convergence
    benchmarks share).
    """
    scene = SyntheticSceneConfig(n_cams=n_cams, width=width, height=height,
                                 seed=seed)
    scene.cams = make_rig(n_cams=n_cams, width=width, height=height,
                          focal=300.0 * min(width, height) / 256.0)
    return scene


def write_coco_dataset(out_dir, n_images: int = 128, width: int = 256,
                       height: int = 256, seed: int = 0):
    """Render a synthetic COCO person_keypoints dataset to disk.

    Produces the exact input surface `cli/train.py` consumes
    (`training.data.parse_coco_keypoints`): an ``images/`` directory of
    PNGs plus a ``person_keypoints.json`` with per-instance bbox
    (COCO xywh) and flattened (x, y, v) keypoints.  This closes the
    train-CLI loop on generated data with no downloads: the reference's
    MMPose-zoo training capability (SURVEY.md §2.2 rows 8-9) exercised
    end to end in a zero-egress environment.

    Returns ``(annotations_json_path, images_dir)``.
    """
    import json
    import os

    import cv2

    scene = make_scaled_scene(width, height, seed=seed)
    K, R, T, _ = scene.cams[0]
    images_dir = os.path.join(str(out_dir), "images")
    os.makedirs(images_dir, exist_ok=True)

    images, annotations = [], []
    for i in range(n_images):
        pts3d = scene.sample_pose()
        proj = project_oracle(pts3d, K, R, T)
        frame = render_frame(proj, width, height, scene.rng)
        fname = f"img{i:05d}.png"
        # Frames are RGB in memory; cv2 writes BGR files, and the loader
        # (KeypointBatcher._load_record) flips imread's BGR back to RGB.
        cv2.imwrite(os.path.join(images_dir, fname), frame[..., ::-1])
        x0, y0, x1, y1 = person_bbox(proj, width, height)
        kps = []
        for j in range(17):
            kps += [float(proj[j, 0]), float(proj[j, 1]), 2]
        images.append({"id": i, "file_name": fname,
                       "width": width, "height": height})
        annotations.append({
            "id": i, "image_id": i, "category_id": 1, "iscrowd": 0,
            "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
            "keypoints": kps, "num_keypoints": 17,
        })

    ann_path = os.path.join(str(out_dir), "person_keypoints.json")
    with open(ann_path, "w") as f:
        json.dump({
            "images": images,
            "annotations": annotations,
            "categories": [{"id": 1, "name": "person",
                            "keypoints": _JOINT_TYPES}],
        }, f)
    return ann_path, images_dir
