"""Person detection for the top-down pipeline.

TPU-native replacement of the reference's MMDetection person detector
(RTMDet-m / YOLOX-tiny loaded at mmpose_pose_estimation.py:98 and used at
:236-250: keep label==person & score>bbox_thr, take the top-1 box).  Two
paths, matching SURVEY.md §2.2's allowance:

- ``full_frame_bboxes``: the zero-cost fallback — the whole frame as the
  person box (the reference's own failure path when no box survives,
  mmpose_pose_estimation.py:246-250, just made the default instead of an
  exception handler).  For the single-person recordings this pipeline
  targets, the top-down crop + heatmap confidence already does the
  localization work.

- ``CenterNetDetector``: a from-scratch single-class centre-point detector
  (CenterNet-style: stride-16 backbone → centre heatmap + size + offset
  heads).  Fully batched decode: the argmax of the centre heatmap is the
  top-1 person (exactly the reference's "assume one person" semantics at
  mmpose_pose_estimation.py:243-247) — no NMS needed, static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["full_frame_bboxes", "CenterNetDetector", "SinglePersonDetector"]


def full_frame_bboxes(frames: jax.Array) -> jax.Array:
    """(B, H, W, 3) → (B, 4) boxes covering the whole frame."""
    B, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
    return jnp.tile(jnp.asarray([0.0, 0.0, float(W), float(H)], jnp.float32), (B, 1))


class _ConvBNReLU(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        return nn.relu(x)


class CenterNetDetector(nn.Module):
    """Single-class centre-point detector; returns per-pixel head maps.

    Input (B, H, W, 3) float — output dict at stride 16:
    ``center`` (B, H/16, W/16) logits, ``wh`` (B, H/16, W/16, 2) sizes in
    input pixels, ``offset`` (B, H/16, W/16, 2) sub-stride offsets.
    """

    width: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        w = self.width
        x = _ConvBNReLU(w, 2, self.dtype)(x, train)  # /2
        x = _ConvBNReLU(w, 1, self.dtype)(x, train)
        x = _ConvBNReLU(w * 2, 2, self.dtype)(x, train)  # /4
        x = _ConvBNReLU(w * 2, 1, self.dtype)(x, train)
        x = _ConvBNReLU(w * 4, 2, self.dtype)(x, train)  # /8
        x = _ConvBNReLU(w * 4, 1, self.dtype)(x, train)
        x = _ConvBNReLU(w * 8, 2, self.dtype)(x, train)  # /16
        x = _ConvBNReLU(w * 8, 1, self.dtype)(x, train)
        head = _ConvBNReLU(w * 4, 1, self.dtype)(x, train)
        center = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(head)
        wh = nn.Conv(2, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(head)
        offset = nn.Conv(2, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(head)
        return {
            "center": center[..., 0].astype(jnp.float32),
            "wh": nn.softplus(wh.astype(jnp.float32)),
            "offset": offset.astype(jnp.float32),
        }


def decode_top1(outputs: dict, stride: int = 16) -> tuple[jax.Array, jax.Array]:
    """Head maps → top-1 box (B, 4) + score (B,).  One argmax, no NMS."""
    center = outputs["center"]  # (B, h, w)
    B, h, w = center.shape
    flat = center.reshape(B, h * w)
    idx = jnp.argmax(flat, axis=-1)
    score = jax.nn.sigmoid(jnp.take_along_axis(flat, idx[:, None], axis=-1)[:, 0])
    cy = (idx // w).astype(jnp.float32)
    cx = (idx % w).astype(jnp.float32)
    gather = lambda m: jnp.take_along_axis(
        m.reshape(B, h * w, 2), idx[:, None, None].repeat(2, -1), axis=1
    )[:, 0]
    wh = gather(outputs["wh"])
    off = gather(outputs["offset"])
    cxy = (jnp.stack([cx, cy], axis=-1) + off) * stride
    half = wh * 0.5
    boxes = jnp.concatenate([cxy - half, cxy + half], axis=-1)
    return boxes, score


class SinglePersonDetector:
    """Reference-shaped wrapper: frames → top-1 person box or full frame.

    ``bbox_thr`` mirrors mmpose_pose_estimation.py:85 (default 0.3): below
    it the detector output is discarded and the full frame is used —
    matching the reference's None-bbox fallback, but shape-static (the
    choice is a `jnp.where`, not Python control flow).
    """

    def __init__(self, model: CenterNetDetector | None = None, variables=None,
                 bbox_thr: float = 0.3):
        self.model = model
        self.variables = variables
        self.bbox_thr = float(bbox_thr)
        if model is not None and variables is not None:
            self._run = jax.jit(partial(_detect, model, self.bbox_thr))

    def detect(self, frames) -> jax.Array:
        frames = jnp.asarray(frames)
        if frames.dtype == jnp.uint8:
            frames = frames.astype(jnp.float32) / 255.0
        if self.model is None or self.variables is None:
            return full_frame_bboxes(frames)
        return self._run(self.variables, frames)


def _detect(model, bbox_thr, variables, frames):
    outputs = model.apply(variables, frames)
    boxes, score = decode_top1(outputs)
    fallback = full_frame_bboxes(frames)
    keep = (score > bbox_thr)[:, None]
    H, W = frames.shape[1], frames.shape[2]
    boxes = jnp.clip(boxes, 0.0, jnp.asarray([W, H, W, H], jnp.float32))
    return jnp.where(keep, boxes, fallback)
