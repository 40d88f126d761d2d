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
import numpy as np

__all__ = [
    "full_frame_bboxes",
    "CenterNetDetector",
    "SinglePersonDetector",
    "decode_topk",
    "select_consistent_boxes",
]


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
    """Head maps → top-1 box (B, 4) + score (B,).  One argmax, no NMS.

    Accepts either CenterNet head maps (``center``/``wh``/``offset``) or
    the YOLOX flat candidate set (``boxes_all``/``scores_all``,
    models/yolox.py) — both are probability-scored, so downstream
    thresholds compare identically.
    """
    if "boxes_all" in outputs:
        scores = outputs["scores_all"]  # (B, N), already sigmoided
        idx = jnp.argmax(scores, axis=-1)
        score = jnp.take_along_axis(scores, idx[:, None], axis=-1)[:, 0]
        boxes = jnp.take_along_axis(
            outputs["boxes_all"], idx[:, None, None].repeat(4, -1), axis=1
        )[:, 0]
        return boxes, score
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


def decode_topk(outputs: dict, k: int, stride: int = 16
                ) -> tuple[jax.Array, jax.Array]:
    """Head maps → top-k peak boxes (B, k, 4) + scores (B, k), sorted.

    CenterNet's NMS-free candidate decode: a 3×3 local-max suppression
    on the centre heatmap (so the k candidates are k distinct blobs,
    not k pixels of the same blob), then `lax.top_k`.  Static shapes,
    one reduce_window + one top_k — no data-dependent control flow.

    YOLOX candidates (``boxes_all``/``scores_all``) take a plain top-k
    (no blob suppression — neighbouring anchors of one person can occupy
    several slots; `select_consistent_boxes`'s cross-view/temporal
    utility tolerates duplicates).
    """
    if "boxes_all" in outputs:
        vals, idx = jax.lax.top_k(outputs["scores_all"], k)  # (B, k)
        boxes = jnp.take_along_axis(
            outputs["boxes_all"], idx[..., None].repeat(4, -1), axis=1
        )
        return boxes, vals
    center = outputs["center"]  # (B, h, w)
    B, h, w = center.shape
    pooled = jax.lax.reduce_window(
        center, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME"
    )
    peaks = jnp.where(center >= pooled, center, -jnp.inf)
    vals, idx = jax.lax.top_k(peaks.reshape(B, h * w), k)  # (B, k)
    score = jax.nn.sigmoid(vals)
    cy = (idx // w).astype(jnp.float32)
    cx = (idx % w).astype(jnp.float32)
    gather = lambda m: jnp.take_along_axis(
        m.reshape(B, h * w, 2), idx[..., None].repeat(2, -1), axis=1
    )  # (B, k, 2)
    wh = gather(outputs["wh"])
    off = gather(outputs["offset"])
    cxy = (jnp.stack([cx, cy], axis=-1) + off) * stride
    half = wh * 0.5
    boxes = jnp.concatenate([cxy - half, cxy + half], axis=-1)  # (B, k, 4)
    return boxes, score


def select_consistent_boxes(
    boxes: jax.Array,
    scores: jax.Array,
    cam: dict,
    *,
    det_thr: float = 0.3,
    frame_wh: tuple[float, float] | None = None,
    window: int = 9,
    n_rounds: int = 2,
    lam: float = 4.0,
) -> tuple[jax.Array, jax.Array]:
    """Multi-person-robust box selection: pick, per frame per camera, the
    candidate most consistent with the subject's cross-view, temporally
    smooth 3D centre.

    The reference keeps the top-1 detector box and assumes one person
    (mmpose_pose_estimation.py:242-248); under a distractor person the
    top-1 occasionally jumps to the wrong body and the error is carried
    all the way into triangulation.  This selector uses the two signals
    the distractor cannot fake at once: (a) the subject's centre
    triangulates to the SAME 3D point across views, and (b) that 3D
    point moves smoothly over time, while spurious picks scatter.

    Fully batched, static-shape, jit-friendly — the whole thing is a few
    gathers, one 1-point-per-frame DLT triangulation, and a sliding
    nanmedian over time (tiny next to the pose-model forward):

    1. initial pick = top score (the reference's own semantics);
    2. triangulate the picked centres (one "joint" per frame) → (T, 3);
    3. temporal nanmedian over ``window`` frames → a robust anchor
       trajectory (wrong picks are the minority within a window, so the
       median lands on the subject);
    4. re-pick per camera: utility = score − ``lam``·(centre distance to
       the anchor's projection)/(candidate box diagonal, OKS-style object
       normalization); repeat from 2.

    Args: ``boxes`` (T, C, k, 4), ``scores`` (T, C, k) from
    `decode_topk`; ``cam`` the `io.stack_camera_params` dict.  Returns
    (boxes (T, C, 4), scores (T, C)) of the selected candidate — the
    caller applies the usual below-``det_thr`` full-frame fallback.
    """
    from ..ops.geometry import project_points
    from ..ops.triangulation import triangulate_top2

    T, C, k = scores.shape
    centers = (boxes[..., :2] + boxes[..., 2:]) * 0.5  # (T, C, k, 2)
    # Distance scale: the candidate's own box diagonal (OKS-style object
    # normalization).  A centre one person-size away from the anchor must
    # be decisively penalized regardless of frame resolution — the frame
    # diagonal is far too lax a scale (a distractor a full body away
    # costs < 0.1 there, less than a typical score gap).  ``frame_wh``
    # caps the scale so a degenerate huge box cannot neutralize its own
    # penalty.
    diag = jnp.linalg.norm(boxes[..., 2:] - boxes[..., :2], axis=-1)
    lo = 32.0
    hi = (0.5 * float(np.hypot(frame_wh[0], frame_wh[1]))
          if frame_wh is not None else jnp.inf)
    diag = jnp.clip(diag, lo, hi)  # (T, C, k)
    offs = np.arange(window) - window // 2
    t_idx = np.clip(np.arange(T)[:, None] + offs[None, :], 0, T - 1)  # (T,w)

    pick = jnp.zeros((T, C), jnp.int32)  # top_k sorts: 0 = top score
    for _ in range(max(n_rounds, 1)):
        sel_c = jnp.take_along_axis(
            centers, pick[..., None, None].repeat(2, -1), axis=2
        )[:, :, 0]  # (T, C, 2)
        sel_s = jnp.take_along_axis(scores, pick[..., None], axis=2)[..., 0]
        # Confidence-gated: a below-floor candidate must not steer the
        # anchor (NaN rides through the DLT's missing-data path).
        sel_xy = jnp.where(sel_s[..., None] > det_thr, sel_c, jnp.nan)
        anchor = triangulate_top2(
            sel_xy[:, None], sel_s[:, None], cam["K"], cam["dist"],
            cam["R"], cam["T"],
        )[:, 0]  # (T, 3)
        smooth = jnp.nanmedian(anchor[t_idx], axis=1)  # (T, 3)
        proj = jnp.stack(
            [
                project_points(smooth, cam["K"][c], cam["R"][c],
                               cam["T"][c], cam["dist"][c])
                for c in range(C)
            ],
            axis=1,
        )  # (T, C, 2)
        d = jnp.linalg.norm(centers - proj[:, :, None, :], axis=-1)
        util = scores - lam * (d / diag)
        # No usable anchor for a frame (too few confident views) →
        # fall back to score ordering for that frame.
        util = jnp.where(jnp.isnan(util), scores, util)
        util = jnp.where(scores > det_thr, util, -1e9)
        pick = jnp.argmax(util, axis=-1).astype(jnp.int32)

    out_boxes = jnp.take_along_axis(
        boxes, pick[..., None, None].repeat(4, -1), axis=2
    )[:, :, 0]
    out_scores = jnp.take_along_axis(scores, pick[..., None], axis=2)[..., 0]
    return out_boxes, out_scores


class SinglePersonDetector:
    """Reference-shaped wrapper: frames → top-1 person box or full frame.

    ``bbox_thr`` mirrors mmpose_pose_estimation.py:85 (default 0.3): below
    it the detector output is discarded and the full frame is used —
    matching the reference's None-bbox fallback, but shape-static (the
    choice is a `jnp.where`, not Python control flow).
    """

    def __init__(self, model: CenterNetDetector | None = None, variables=None,
                 bbox_thr: float = 0.3, select: str = "top1", topk: int = 4,
                 select_window: int = 9, select_lam: float = 4.0):
        if select not in ("top1", "consistent"):
            raise ValueError(f"unknown select mode '{select}'")
        self.model = model
        self.variables = variables
        self.bbox_thr = float(bbox_thr)
        # Selection policy consumed by the PIPELINE (which has the camera
        # rig + time structure `select_consistent_boxes` needs); the
        # standalone `detect()` below is per-frame and always top-1.
        self.select = select
        self.topk = int(topk)
        self.select_window = int(select_window)
        self.select_lam = float(select_lam)
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
