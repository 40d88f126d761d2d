"""Training data: COCO-keypoints parsing + batched crop loader.

Host glue (no downloads — the parser consumes a local COCO
person_keypoints JSON + image directory):

- `parse_coco_keypoints`: JSON → per-instance records (image path, bbox,
  (K, 3) keypoints with COCO visibility).
- `KeypointBatcher`: background-threaded loader producing fixed-shape
  batches: images decoded on the host (cv2/imageio), crops + targets built
  ON DEVICE through the SAME `models.preprocess_crops` the inference path
  uses (train/deploy consistency), with optional flip augmentation.
"""

from __future__ import annotations

import json
import os
import threading
from queue import Queue

import jax
import jax.numpy as jnp
import numpy as np

from ..models.topdown import preprocess_crops
from .augment import flip_permutation, random_flip_pose
from .targets import render_heatmap_targets, render_simcc_targets

__all__ = ["parse_coco_keypoints", "KeypointBatcher", "make_crop_batch"]


def parse_coco_keypoints(
    annotations_json: str,
    images_dir: str,
    min_keypoints: int = 1,
):
    """COCO person_keypoints JSON → list of instance records.

    Record: {"image_path", "bbox" (x0, y0, x1, y1), "keypoints" (K, 2),
    "visibility" (K,)}.  Crowd annotations and instances with fewer than
    ``min_keypoints`` labeled joints are dropped.
    """
    with open(annotations_json) as f:
        coco = json.load(f)
    images = {img["id"]: img for img in coco.get("images", [])}
    records = []
    for ann in coco.get("annotations", []):
        if ann.get("iscrowd", 0):
            continue
        kp = np.asarray(ann.get("keypoints", []), np.float32).reshape(-1, 3)
        if (kp[:, 2] > 0).sum() < min_keypoints:
            continue
        img = images.get(ann["image_id"])
        if img is None:
            continue
        x, y, w, h = ann["bbox"]
        records.append(
            {
                "image_path": os.path.join(images_dir, img["file_name"]),
                "bbox": np.asarray([x, y, x + w, y + h], np.float32),
                "keypoints": kp[:, :2],
                "visibility": kp[:, 2],
            }
        )
    return records


def make_crop_batch(
    images: np.ndarray,  # (B, H, W, 3) float [0,1] (same-size originals)
    bboxes: np.ndarray,  # (B, 4)
    keypoints: np.ndarray,  # (B, K, 2) image pixels
    visibility: np.ndarray,  # (B, K)
    input_size=(192, 256),
    target: str = "heatmap",
    heatmap_stride: int = 4,
    sigma: float = 2.0,
    simcc_split_ratio: float = 2.0,
    flip_key=None,
    connectivity_type: str = "coco",
):
    """Device-side batch assembly through the inference preprocessing.

    Returns a dict ready for `training.make_train_step` loss closures:
    heatmap → {"images", "targets", "weights"}; simcc → {"images", "lx",
    "ly", "w"}.
    """
    crops, scale, offset = preprocess_crops(
        jnp.asarray(images), jnp.asarray(bboxes), input_size
    )
    kp_crop = (jnp.asarray(keypoints) - offset[:, None]) * scale[:, None]
    vis = jnp.asarray(visibility)

    if flip_key is not None:
        perm = flip_permutation(connectivity_type)
        crops, kp_crop, vis = random_flip_pose(flip_key, crops, kp_crop, vis, perm)

    in_w, in_h = input_size
    if target == "heatmap":
        hm_size = (in_h // heatmap_stride, in_w // heatmap_stride)
        targets, w = render_heatmap_targets(
            kp_crop / heatmap_stride, vis, hm_size, sigma=sigma
        )
        return {"images": crops, "targets": targets, "weights": w}
    if target == "simcc":
        lx, ly, w = render_simcc_targets(
            kp_crop, vis, input_size, split_ratio=simcc_split_ratio
        )
        return {"images": crops, "lx": lx, "ly": ly, "w": w}
    raise ValueError(f"unknown target '{target}'")


class KeypointBatcher:
    """Background host loader: records → device-ready training batches.

    Decodes images with cv2 (resized to a common ``image_size`` so batch
    shapes stay static), shuffles per epoch, and assembles batches with
    `make_crop_batch` while the previous batch trains.
    """

    def __init__(
        self,
        records,
        batch_size: int = 32,
        input_size=(192, 256),
        image_size=(512, 512),  # (W, H) common decode size
        target: str = "heatmap",
        seed: int = 0,
        augment: bool = True,
        queue_depth: int = 2,
        **batch_kwargs,
    ):
        if not records:
            raise ValueError("no training records")
        self.records = list(records)
        self.batch_size = batch_size
        self.input_size = tuple(input_size)
        self.image_size = tuple(image_size)
        self.target = target
        self.augment = augment
        self.batch_kwargs = batch_kwargs
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        self._q: Queue = Queue(maxsize=queue_depth)
        self._stop = False
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _load_record(self, rec):
        import cv2

        img = cv2.imread(rec["image_path"])
        if img is None:
            raise FileNotFoundError(rec["image_path"])
        H0, W0 = img.shape[:2]
        Wt, Ht = self.image_size
        sx, sy = Wt / W0, Ht / H0
        img = cv2.resize(img, (Wt, Ht))[..., ::-1]  # BGR → RGB
        bbox = rec["bbox"] * np.asarray([sx, sy, sx, sy], np.float32)
        kp = rec["keypoints"] * np.asarray([sx, sy], np.float32)
        return img.astype(np.float32) / 255.0, bbox, kp, rec["visibility"]

    def _producer(self):
        B = self.batch_size
        while not self._stop:
            order = self._rng.permutation(len(self.records))
            for start in range(0, len(order) - B + 1, B):
                if self._stop:
                    return
                imgs, boxes, kps, vises = [], [], [], []
                for idx in order[start : start + B]:
                    img, bbox, kp, vis = self._load_record(self.records[idx])
                    imgs.append(img)
                    boxes.append(bbox)
                    kps.append(kp)
                    vises.append(vis)
                if self.augment:
                    self._key, sub = jax.random.split(self._key)
                else:
                    sub = None
                batch = make_crop_batch(
                    np.stack(imgs), np.stack(boxes), np.stack(kps),
                    np.stack(vises), input_size=self.input_size,
                    target=self.target, flip_key=sub, **self.batch_kwargs,
                )
                self._q.put(batch)

    def __iter__(self):
        while True:
            yield self._q.get()

    def close(self):
        self._stop = True
        try:
            self._q.get_nowait()  # unblock the producer if it's waiting
        except Exception:
            pass
