"""pjit-sharded batch pipelines: multi-camera inference + DP refinement.

TPU mapping of the reference's latent parallel axes (SURVEY.md §2.3):

- **Inference** (`ShardedPosePipeline`): the reference's per-frame,
  per-camera Python loop (pose_estimation.py:184-194, :88) becomes one
  jitted program over a (T, C, H, W, 3) block with the TIME axis sharded
  over the ``data`` mesh axis.  Cameras fold into the model batch.  The
  only cross-device movement is the implicit all-gather of per-shard
  outputs — triangulation consumes only same-frame data, so it shards
  cleanly with time.

- **Refinement** (`sharded_refine_step`): the reference's serial loop over
  overlapping batch windows (pose_refinement.py:1006-1050) becomes
  synchronous data parallelism: each device computes the cost gradient of
  its shard of windows; the mean reduction makes XLA insert the gradient
  all-reduce over ICI.  (Semantics: one synchronous step over all windows
  per iteration, the standard DP mapping of a serial minibatch loop.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..models.topdown import _predict
from ..ops.triangulation import triangulate_nview, triangulate_top2
from ..refine.costs import likelihood_cost, nan_mean
from .mesh import data_sharding, replicated

__all__ = ["ShardedPosePipeline", "sharded_refine_step", "run_clips_batched"]


class ShardedPosePipeline:
    """End-to-end 2D+3D estimation sharded over time across a device mesh.

    Args:
    - ``estimator``: a `models.TopDownEstimator`.
    - ``cam_stack``: {"K": (C,3,3), "R": (C,3,3), "T": (C,3),
      "dist": (C,5)} from `io.stack_camera_params`.
    - ``mesh``: a 1-D device mesh (`parallel.make_mesh()`); None = single
      device jit.

    ``run(frames)`` with frames (T, C, H, W, 3) returns the reference's
    wire shapes (SURVEY.md §1): kpts_2d (T, K, 3, C), heatmaps (T, C, K, 6),
    kpts_3d (T, K, 3).
    """

    def __init__(self, estimator, cam_stack, mesh=None, conf_threshold: float = 0.3,
                 detector=None, donate_frames: bool = False,
                 triangulation: str = "top2"):
        self.estimator = estimator
        self.mesh = mesh
        self.conf_threshold = float(conf_threshold)
        # Triangulation policy: "top2" = reference parity
        # (pose_estimation.py:35-41); "nview" = robust confidence-weighted
        # all-view DLT with one residual-rejection pass
        # (ops.triangulate_nview, beyond-reference accuracy lever).
        if triangulation not in ("top2", "nview"):
            raise ValueError(f"unknown triangulation '{triangulation}'")
        self.triangulation = triangulation
        # ``donate_frames``: accepted for API compatibility but a NO-OP.
        # History (honest accounting): round 2 donated the block so XLA
        # could recycle its HBM for intermediates, but XLA aliases donated
        # buffers by dtype/layout and the pixel path casts immediately —
        # uint8 blocks (the streaming wire format, 4× less H2D than f32)
        # could never alias, and since the pixel path went bfloat16
        # (PROFILE.md round 3) neither can float32 blocks.  Requesting
        # donation only produced a "Some donated buffers were not usable"
        # warning on every call; HBM headroom is not a constraint at these
        # block sizes, so the request is simply not made.
        self.donate_frames = bool(donate_frames)
        self.cam_stack = {k: jnp.asarray(v, jnp.float32) for k, v in cam_stack.items()}
        # Optional person detector (models.SinglePersonDetector): its
        # CenterNet forward + top-1 decode runs INSIDE the same jitted
        # program as crop/model/triangulate — the reference's separate
        # mmdet inference call (mmpose_pose_estimation.py:236-250) fused
        # away.  A full-frame detector (model=None) adds nothing to the jit.
        det_model = getattr(detector, "model", None)
        det_thr = float(getattr(detector, "bbox_thr", 0.3))
        # Selection policy (models/detector.py::select_consistent_boxes):
        # "top1" = the reference's argmax semantics; "consistent" = top-k
        # decode + cross-view/temporal-consistency re-pick, still inside
        # the same jitted program (VERDICT r3 #2).
        det_select = (
            getattr(detector, "select", "top1"),
            int(getattr(detector, "topk", 4)),
            int(getattr(detector, "select_window", 9)),
            float(getattr(detector, "select_lam", 4.0)),
        )
        self.det_variables = getattr(detector, "variables", None)
        self._has_detector = det_model is not None and self.det_variables is not None

        def make(fn_use_det: bool, donate: bool = False):
            fn = partial(
                _pipeline_fn,
                estimator.model,
                estimator.input_size,
                estimator.decode,
                estimator.heatmap_threshold,
                estimator.bbox_padding,
                getattr(estimator, "use_fused_decode", False),
                getattr(estimator, "_flip_perm", None),
                getattr(estimator, "decode_mode", "default"),
                getattr(estimator, "flip_shift", True),
                getattr(estimator, "_fused_stage1", None),
                self.conf_threshold,
                det_model if fn_use_det else None,
                det_thr,
                det_select,
                self.triangulation,
            )
            donate_nums = (2,) if donate else ()
            if mesh is None:
                return jax.jit(fn, donate_argnums=donate_nums)
            rep = replicated(mesh)
            return jax.jit(
                fn,
                in_shardings=(
                    rep,  # variables
                    rep,  # detector variables (or None pytree)
                    data_sharding(mesh, 5),  # frames (T, C, H, W, 3)
                    data_sharding(mesh, 3),  # bboxes (T, C, 4)
                    rep,  # cam stack
                ),
                donate_argnums=donate_nums,
            )

        self._make = make
        # Executables keyed by (use_detector, donate); built lazily except
        # the common entry.
        self._fns: dict[tuple[bool, bool], object] = {}
        self._fns[(self._has_detector, False)] = make(self._has_detector, False)

    def _fn(self, use_det: bool, donate: bool):
        key = (use_det, donate)
        if key not in self._fns:
            self._fns[key] = self._make(use_det, donate)
        return self._fns[key]

    @property
    def _run_detect(self):
        """The non-donating jitted pipeline fn (bench/entry call this raw)."""
        return self._fn(self._has_detector, False)

    def run(self, frames, bboxes=None):
        # uint8 frames stay uint8 until inside the jitted program (4x less
        # host->device traffic; the /255 cast fuses into the crop resample).
        frames = jnp.asarray(frames)
        T, C, H, W = frames.shape[:4]
        use_detector = bboxes is None and self._has_detector
        donate = False  # see __init__: donation can never alias here
        if bboxes is None:
            bboxes = jnp.tile(
                jnp.asarray([0.0, 0.0, float(W), float(H)], jnp.float32), (T, C, 1)
            )
        fn = self._fn(use_detector, donate)
        det_vars = self.det_variables if use_detector else None
        return fn(self.estimator.variables, det_vars, frames,
                  jnp.asarray(bboxes), self.cam_stack)


def _pipeline_fn(model, input_size, decode, hm_thr, pad, use_fused, flip_perm,
                 decode_mode, flip_shift, fused_stage1, conf_thr, det_model,
                 det_thr, det_select, triangulation, variables, det_variables,
                 frames, bboxes, cam):
    T, C, H, W, _ = frames.shape
    if frames.dtype == jnp.uint8:
        # bf16 is the block pipeline's compute dtype for the whole
        # pixel path (cast, crop resample, ImageNet normalize): pixel
        # values in [0,1] lose <0.4% to the 8-bit mantissa — noise next
        # to the bf16 model — and the f32 chain it replaces measured
        # ~7% of device time (PROFILE.md: resample + broadcast_add +
        # stem input traffic).  Geometry (boxes, decode, triangulation)
        # stays f32.
        frames = frames.astype(jnp.bfloat16) / 255.0
    elif frames.dtype == jnp.float32:
        frames = frames.astype(jnp.bfloat16)
    flat = frames.reshape(T * C, H, W, 3)
    flat_boxes = bboxes.reshape(T * C, 4)
    if det_model is not None:
        # Person detection fused into the same program (reference runs a
        # separate mmdet model per frame, mmpose_pose_estimation.py:236-250).
        # Below-threshold detections fall back to the provided boxes
        # (full frame), matching the reference's None-bbox path.
        from ..models.detector import (decode_top1, decode_topk,
                                       select_consistent_boxes)

        det_out = det_model.apply(det_variables, flat)
        mode, topk, sel_window, sel_lam = det_select
        if mode == "consistent":
            # Top-k candidates re-picked by cross-view triangulation
            # consistency + temporal-median smoothness of the subject's
            # 3D centre (VERDICT r3 #2: robust under a distractor person
            # that the reference's top-1 semantics can latch onto).
            boxes_k, scores_k = decode_topk(det_out, k=topk)
            boxes_k = jnp.clip(
                boxes_k, 0.0, jnp.asarray([W, H, W, H], jnp.float32)
            )
            det_boxes, det_score = select_consistent_boxes(
                boxes_k.reshape(T, C, topk, 4),
                scores_k.reshape(T, C, topk),
                cam, det_thr=det_thr, frame_wh=(W, H),
                window=sel_window, lam=sel_lam,
            )
            det_boxes = det_boxes.reshape(T * C, 4)
            det_score = det_score.reshape(T * C)
        else:
            det_boxes, det_score = decode_top1(det_out)
            det_boxes = jnp.clip(
                det_boxes, 0.0, jnp.asarray([W, H, W, H], jnp.float32)
            )
        keep = (det_score > det_thr)[:, None]
        flat_boxes = jnp.where(keep, det_boxes, flat_boxes)
    out = _predict(model, input_size, decode, hm_thr, pad, use_fused,
                   flip_perm, decode_mode, flip_shift, fused_stage1,
                   variables, flat, flat_boxes)
    kpts = out["keypoints"].reshape(T, C, -1, 3)  # (T, C, K, 3)
    gauss = out["gaussians"].reshape(T, C, -1, 6)

    conf = kpts[..., 2]  # (T, C, K)
    # Low-confidence joints -> NaN, the pipeline's missing-data mechanism
    # (reference pose_estimation.py:117-131).
    xy = jnp.where(conf[..., None] > conf_thr, kpts[..., :2], jnp.nan)
    xy_jc = jnp.swapaxes(xy, 1, 2)  # (T, K, C, 2)
    conf_jc = jnp.swapaxes(conf, 1, 2)  # (T, K, C)
    tri = triangulate_nview if triangulation == "nview" else triangulate_top2
    kpts_3d = tri(
        xy_jc, conf_jc, cam["K"], cam["dist"], cam["R"], cam["T"]
    )  # (T, K, 3)

    # Reference layout: (T, K, 3, C) with (x, y, conf) stacked camera-last
    # (pose_estimation.py:135).
    kpts_2d = jnp.concatenate([xy_jc, conf_jc[..., None]], axis=-1)  # (T,K,C,3)
    kpts_2d = jnp.swapaxes(kpts_2d, -1, -2)  # (T, K, 3, C)
    return {"kpts_2d": kpts_2d, "heatmaps_2d": gauss, "kpts_3d": kpts_3d}


def sharded_refine_step(mesh, lr: float = 1e-3, betas=(0.9, 0.999),
                        lambda_smooth: float = 1.0, grad_clip: float = 1.0):
    """Build (step_fn, tx) for a data-parallel refinement training step.

    ``step_fn(params, opt_state, batch)``:

    - ``params["traj"]`` (N, B, J, 3): trajectory windows — learnable,
      SHARDED over the data axis (each device optimizes its windows).
    - ``params["rvecs"]``/``params["tvecs"]`` (C, 3): camera extrinsics —
      learnable, REPLICATED.  Their gradients depend on every shard's
      windows, so the mean loss makes XLA insert the DP gradient
      all-reduce over ICI (the one collective this workload needs,
      SURVEY.md §2.3); global-norm clipping adds a scalar all-reduce.
    - ``batch``: ``means`` (N, B, C, J, 2) and ``cov_inv``
      (N, B, C, J, 2, 2) sharded with the windows; ``Ks``/``dists``
      replicated.

    Optimizer state shardings are inferred from the params tree (moments
    mirror their parameters: sharded for traj, replicated for extrinsics).
    """
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(b1=betas[0], b2=betas[1]),
        optax.scale(-lr),
    )

    def loss_fn(params, batch):
        def per_window(tw, mw, cw):
            lik = likelihood_cost(tw, mw, cw, batch["Ks"], params["rvecs"],
                                  params["tvecs"], batch["dists"])
            d2 = tw[2:] - 2.0 * tw[1:-1] + tw[:-2]
            smooth = lambda_smooth * nan_mean(jnp.sum(d2 * d2, axis=(-2, -1)))
            return lik + smooth

        per = jax.vmap(per_window)(params["traj"], batch["means"], batch["cov_inv"])
        return jnp.mean(per)

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rep = replicated(mesh)
    params_sharding = {
        "traj": data_sharding(mesh, 4),
        "rvecs": rep,
        "tvecs": rep,
    }
    batch_sharding = {
        "means": data_sharding(mesh, 5),
        "cov_inv": data_sharding(mesh, 6),
        "Ks": rep,
        "dists": rep,
    }
    step_jit = jax.jit(
        step,
        in_shardings=(params_sharding, None, batch_sharding),
        out_shardings=(params_sharding, None, rep),
    )
    return step_jit, tx


def run_clips_batched(pipeline: ShardedPosePipeline, clips_frames, bboxes=None,
                      split: bool = True):
    """Process multiple synchronized clips concurrently on one chip/mesh.

    BASELINE config 5 ("8 synchronized 4-camera clips processed
    concurrently"): ``clips_frames`` (n_clips, T, C, H, W, 3) folds the
    clip axis into time for one big jitted block.  On a 2-D
    `make_clip_mesh` the flattened axis shards clips-major (outer axis =
    hosts over DCN) then frames (inner axis over ICI) — the pod-scale
    layout — provided n_clips·T divides the mesh size.

    - ``split=True``: returns a list of per-clip result dicts (convenient,
      but materializes n_clips×3 device slices — measurable dispatch
      overhead on high-latency device links).
    - ``split=False``: returns ONE dict with a leading (n_clips, T, ...)
      axis per key — zero extra dispatches; index on the host after a
      single transfer.
    """
    clips_frames = jnp.asarray(clips_frames)
    n_clips, T = clips_frames.shape[0], clips_frames.shape[1]
    flat = clips_frames.reshape((n_clips * T,) + clips_frames.shape[2:])
    flat_boxes = None
    if bboxes is not None:
        bboxes = jnp.asarray(bboxes)
        flat_boxes = bboxes.reshape((n_clips * T,) + bboxes.shape[2:])
    out = pipeline.run(flat, flat_boxes)
    stacked = {
        key: val.reshape((n_clips, T) + val.shape[1:]) for key, val in out.items()
    }
    if not split:
        return stacked
    return [
        {key: stacked[key][i] for key in stacked} for i in range(n_clips)
    ]
