"""Top-down 2D pose pipeline: bbox → crop → model → decode → image space.

TPU-native re-design of the reference's `PoseEstimator`
(mmpose_pose_estimation.py:81-272).  The reference runs MMPose's
`inference_topdown` per frame per camera on the host, then reverts full
heatmaps to image space before compressing them to Gaussian moments.  Here
the whole path is ONE jitted program over a batch of frames (all cameras ×
a time block at once):

    frames (B,H,W,3) → affine crop (scale_and_translate) → HRNet/RTMPose
    forward → fused decode (argmax+subpixel or SimCC) → Gaussian moments
    in crop space → analytic affine pushforward to image space.

The analytic pushforward (mean' = A·mean, cov' = S·cov·Sᵀ with S the 2×2
linear part) replaces the reference's resample-the-heatmap-then-integrate
(mmpose merge_data_samples + get_heatmap_means_cov,
mmpose_pose_estimation.py:163-215) — mathematically the exact transform of
the fitted Gaussian, with no HBM-hungry full-resolution heatmap resample.

Output contract matches the reference wire format (SURVEY.md §1):
keypoints (B, K, 3) = (x_px, y_px, score); gaussians (B, K, 6) =
[mean_x, mean_y, var_x, cov_xy, cov_xy, var_y] in image pixels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.heatmap_decode import heatmap_argmax_decode
from ..ops.moments import heatmap_moments
from ..ops.simcc import simcc_decode

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "center_scale_from_bbox",
    "crop_frames",
    "preprocess_crops",
    "TopDownEstimator",
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def center_scale_from_bbox(
    bboxes: jax.Array, aspect_ratio: float, padding: float = 1.25
) -> tuple[jax.Array, jax.Array]:
    """(x0, y0, x1, y1) boxes (..., 4) → center (..., 2), size (..., 2).

    The box is padded and expanded to the model's input aspect ratio
    (w/h), the standard top-down convention the reference inherits from
    MMPose's `inference_topdown`.
    """
    bboxes = jnp.asarray(bboxes)
    x0, y0, x1, y1 = bboxes[..., 0], bboxes[..., 1], bboxes[..., 2], bboxes[..., 3]
    center = jnp.stack([(x0 + x1) * 0.5, (y0 + y1) * 0.5], axis=-1)
    w = (x1 - x0) * padding
    h = (y1 - y0) * padding
    # Expand the smaller side to match aspect_ratio = w/h.
    w_fit = jnp.maximum(w, h * aspect_ratio)
    h_fit = jnp.maximum(h, w / aspect_ratio)
    return center, jnp.stack([w_fit, h_fit], axis=-1)


def crop_frames(
    frames: jax.Array,  # (B, H, W, 3) float in [0,1]
    center: jax.Array,  # (B, 2)
    size: jax.Array,  # (B, 2) crop (w, h) in source pixels
    out_hw: tuple[int, int],
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Axis-aligned affine crop to (B, out_h, out_w, 3) by bilinear resample.

    Returns (crops, scale (B,2), offset (B,2)) where
    ``img_xy = crop_xy / scale + offset`` maps crop pixels back to source
    pixels (the inverse transform applied to decoded keypoints).
    """
    out_h, out_w = out_hw
    x0 = center[:, 0] - size[:, 0] * 0.5
    y0 = center[:, 1] - size[:, 1] * 0.5
    sx = out_w / size[:, 0]
    sy = out_h / size[:, 1]

    def one(img, sx, sy, x0, y0):
        # scale/translation stay f32: the resample WEIGHTS are computed
        # from them (bf16 here would shift crop placement by ~1 px);
        # only the pixel data follows img.dtype.
        return jax.image.scale_and_translate(
            img,
            (out_h, out_w, img.shape[-1]),
            (0, 1),
            jnp.stack([sy, sx]),
            jnp.stack([-y0 * sy, -x0 * sx]),
            method="linear",
        )

    crops = jax.vmap(one)(frames, sx, sy, x0, y0)
    scale = jnp.stack([sx, sy], axis=-1)
    offset = jnp.stack([x0, y0], axis=-1)
    return crops, scale, offset


class TopDownEstimator:
    """Batched top-down 2D pose estimator (heatmap or SimCC decode).

    Args:
    - ``model``: a flax module — `HRNet` (returns heatmaps) or `RTMPose`
      (returns simcc logits).
    - ``variables``: its params/batch_stats.
    - ``input_size``: (width, height) of the crop fed to the model.
    - ``decode``: "heatmap" | "simcc".
    - ``heatmap_threshold``: the <0.01→0 moment threshold the reference
      applies (mmpose_pose_estimation.py:166) — kept for parity.
    """

    def __init__(
        self,
        model,
        variables,
        input_size: tuple[int, int] = (192, 256),
        decode: str = "heatmap",
        heatmap_threshold: float = 0.01,
        bbox_padding: float = 1.25,
        use_fused_decode: bool = False,
        flip_test: bool = False,
        flip_shift: bool = True,
        decode_mode: str = "default",
        connectivity_type: str = "coco",
        use_pallas_stage1: bool = False,
    ):
        if decode not in ("heatmap", "simcc"):
            raise ValueError(f"unknown decode '{decode}'")
        if decode_mode not in ("default", "dark"):
            raise ValueError(f"unknown decode_mode '{decode_mode}'")
        self.model = model
        self.variables = variables
        self.input_size = tuple(input_size)
        self.decode = decode
        self.heatmap_threshold = float(heatmap_threshold)
        self.bbox_padding = float(bbox_padding)
        # Opt-in single-pass Pallas decode (ops.pallas.fused_heatmap_decode);
        # requires heatmap H*W % 128 == 0 and a TPU whose toolchain compiles
        # Mosaic kernels.  Semantics identical to the jnp pair.
        self.use_fused_decode = bool(use_fused_decode) and decode == "heatmap"
        self.flip_test = bool(flip_test)  # supported for both decode families
        # One-heatmap-pixel right shift of the mirrored map before
        # averaging (MMPose's shift_heatmap for the MSRA x = h·stride
        # convention OUR decode uses: unshifted, the mirrored peak sits
        # (s-1)/s hm-px left of truth; shifted, +1/s px — pinned
        # empirically in tests/test_accuracy_harness.py).
        self.flip_shift = bool(flip_shift)
        self.decode_mode = decode_mode
        if self.flip_test:
            from ..training.augment import flip_permutation

            self._flip_perm = tuple(int(i) for i in flip_permutation(connectivity_type))
            n_joints = getattr(model, "num_joints", None)
            if n_joints is not None and n_joints != len(self._flip_perm):
                raise ValueError(
                    f"flip_test needs the '{connectivity_type}' swap table "
                    f"({len(self._flip_perm)} joints) to match the model "
                    f"({n_joints} joints)"
                )
        else:
            self._flip_perm = None
        # Opt-in Pallas stage-1 Bottleneck fusion (HRNet heatmap family
        # only): fold this estimator's BN stats once and close over the
        # folded weights — they become constants of the jitted program
        # (ops/pallas/bottleneck.py documents the HBM-traffic rationale).
        self._fused_stage1 = None
        if use_pallas_stage1 and decode == "heatmap":
            if "Bottleneck_0" not in self.variables.get("params", {}):
                raise ValueError(
                    "use_pallas_stage1 fuses the HRNet stage-1 Bottleneck "
                    "chain; this model has no Bottleneck_0 (Swin and other "
                    "heatmap backbones are not supported — leave it off)"
                )
            from ..ops.pallas.bottleneck import make_fused_stage1

            self._fused_stage1 = make_fused_stage1(self.variables)
        self._predict = jax.jit(partial(_predict, model, self.input_size, decode,
                                        self.heatmap_threshold, self.bbox_padding,
                                        self.use_fused_decode, self._flip_perm,
                                        self.decode_mode, self.flip_shift,
                                        self._fused_stage1))

    def predict_batch(self, frames, bboxes=None):
        """frames (B,H,W,3) uint8/float, bboxes (B,4) or None (full frame).

        Returns dict with ``keypoints`` (B,K,3) and ``gaussians`` (B,K,6)
        in source-image pixel coordinates.
        """
        frames = jnp.asarray(frames)
        if frames.dtype == jnp.uint8:
            frames = frames.astype(jnp.float32) / 255.0
        B, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
        if bboxes is None:
            bboxes = jnp.tile(
                jnp.asarray([0.0, 0.0, float(W), float(H)], jnp.float32), (B, 1)
            )
        return self._predict(self.variables, frames, jnp.asarray(bboxes, jnp.float32))


def preprocess_crops(frames, bboxes, input_size, bbox_padding: float = 1.25):
    """The exact crop+normalize the inference path feeds the model.

    Exposed so TRAINING pipelines preprocess identically (aspect-fitted
    padded crop, bilinear resample, ImageNet normalization) — train/deploy
    skew here silently destroys accuracy.  Returns
    ``(crops (B, in_h, in_w, 3), scale (B, 2), offset (B, 2))`` with
    ``crop_xy = (img_xy - offset) * scale`` mapping image points (e.g.
    keypoint labels) into crop pixels for target rendering.

    The resample + normalization run in ``frames.dtype`` (the caller's
    compute dtype): the block pipeline feeds bfloat16 — pixel values in
    [0, 1] lose <0.4% to the 8-bit mantissa, irrelevant next to the bf16
    model, while halving the resample/normalize HBM traffic (PROFILE.md
    measured the f32 chain at ~7% of device time); scale/offset stay in
    the frames dtype's f32 promotion for the geometry pushforward.
    """
    in_w, in_h = input_size
    center, size = center_scale_from_bbox(bboxes, in_w / in_h, bbox_padding)
    crops, scale, offset = crop_frames(frames, center, size, (in_h, in_w))
    crops = (crops - jnp.asarray(IMAGENET_MEAN, crops.dtype)) / jnp.asarray(
        IMAGENET_STD, crops.dtype
    )
    return crops, scale, offset


def _predict(model, input_size, decode, hm_threshold, bbox_padding,
             use_fused_decode, flip_perm, decode_mode, flip_shift,
             fused_stage1, variables, frames, bboxes):
    in_w, in_h = input_size
    crops, scale, offset = preprocess_crops(frames, bboxes, input_size, bbox_padding)

    if decode == "heatmap":
        kw = {"fused_stage1": fused_stage1} if fused_stage1 is not None else {}
        heat = model.apply(variables, crops, **kw)  # (B, h/4, w/4, K)
        heat = jnp.moveaxis(heat, -1, 1)  # (B, K, h/4, w/4)
        if flip_perm is not None:
            # Flip-test TTA (MMPose convention): forward the mirrored crop,
            # mirror the heatmaps back, swap left/right joints, average.
            heat_f = model.apply(variables, crops[:, :, ::-1], **kw)
            heat_f = jnp.moveaxis(heat_f, -1, 1)[:, :, :, ::-1]
            heat_f = heat_f[:, jnp.asarray(flip_perm)]
            if flip_shift:
                # Under the x = h·stride decode convention the mirrored
                # peak lands (s-1)/s hm-px left of truth; MMPose's
                # one-pixel right shift is the best integer correction.
                heat_f = jnp.concatenate(
                    [heat_f[..., :1], heat_f[..., :-1]], axis=-1
                )
            heat = 0.5 * (heat + heat_f)
        if use_fused_decode:
            from ..ops.pallas import fused_heatmap_decode

            moments, xy_hm, score = fused_heatmap_decode(
                heat, threshold=hm_threshold
            )
        else:
            if decode_mode == "dark":
                from ..ops.heatmap_decode import heatmap_dark_decode

                xy_hm, score = heatmap_dark_decode(heat)
            else:
                xy_hm, score = heatmap_argmax_decode(heat)
            moments = heatmap_moments(heat, threshold=hm_threshold)
        stride = in_h / heat.shape[-2]
        xy_crop = xy_hm * stride
        mean_crop = moments[..., :2] * stride
        cov_crop = moments[..., 2:] * stride * stride
    else:
        simcc_x, simcc_y = model.apply(variables, crops)
        if flip_perm is not None:
            # SimCC flip-test: mirrored forward, reverse the x-bin axis,
            # swap left/right joints, average in PROBABILITY space (the two
            # softmaxes aren't logit-additive); log(avg) re-enters the
            # softmax decode unchanged since softmax(log p) = p.
            fx, fy = model.apply(variables, crops[:, :, ::-1])
            perm = jnp.asarray(flip_perm)
            px = 0.5 * (
                jax.nn.softmax(simcc_x, axis=-1)
                + jax.nn.softmax(fx, axis=-1)[:, perm, ::-1]
            )
            py = 0.5 * (
                jax.nn.softmax(simcc_y, axis=-1)
                + jax.nn.softmax(fy, axis=-1)[:, perm]
            )
            simcc_x = jnp.log(px + 1e-12)
            simcc_y = jnp.log(py + 1e-12)
        xy_crop, score = simcc_decode(simcc_x, simcc_y)
        # SimCC covariance is EXACT under the head's own model, not a
        # proxy: SimCC factorizes p(x, y) = p(x)·p(y) by construction
        # (two independent per-axis classifiers), and for any product
        # distribution Cov[x, y] = E[xy] − E[x]E[y] = 0 identically.  The
        # per-axis softmax variances are therefore the full second
        # moments; /split_ratio² (= 4) converts bin² to crop px².  The
        # resulting diagonal (generally anisotropic) Gaussian is what the
        # downstream MLE refinement should see — the information SimCC
        # genuinely cannot represent is cross-correlation, and writing 0
        # there is the model's own claim.  Refinement quality on these
        # Gaussians is pinned against heatmap-moment Gaussians in
        # tests/test_refinement.py::test_refinement_on_simcc_vs_heatmap_gaussians.
        var_x = _simcc_axis_var(simcc_x) / 4.0  # split_ratio²
        var_y = _simcc_axis_var(simcc_y) / 4.0
        mean_crop = xy_crop
        zeros = jnp.zeros_like(var_x)
        cov_crop = jnp.stack([var_x, zeros, zeros, var_y], axis=-1)

    # Analytic affine pushforward crop → image.
    inv_scale = 1.0 / scale  # (B, 2)
    xy_img = xy_crop * inv_scale[:, None, :] + offset[:, None, :]
    mean_img = mean_crop * inv_scale[:, None, :] + offset[:, None, :]
    sx = inv_scale[:, 0][:, None]
    sy = inv_scale[:, 1][:, None]
    var_x = cov_crop[..., 0] * sx * sx
    cov_xy = cov_crop[..., 1] * sx * sy
    var_y = cov_crop[..., 3] * sy * sy
    gaussians = jnp.stack(
        [mean_img[..., 0], mean_img[..., 1], var_x, cov_xy, cov_xy, var_y], axis=-1
    )
    keypoints = jnp.concatenate([xy_img, score[..., None]], axis=-1)
    return {"keypoints": keypoints, "gaussians": gaussians}


def _simcc_axis_var(logits):
    """Variance of the per-axis softmax distribution (bin units)."""
    prob = jax.nn.softmax(logits, axis=-1)
    n = logits.shape[-1]
    coords = jnp.arange(n, dtype=prob.dtype)
    mean = jnp.sum(prob * coords, axis=-1)
    return jnp.sum(prob * (coords - mean[..., None]) ** 2, axis=-1)
