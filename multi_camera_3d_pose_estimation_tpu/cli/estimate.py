"""End-to-end estimation entry: synced videos → kpts_2d/heatmaps/kpts_3d.

TPU-native re-design of `pose_estimation.estimate_pose_from_video`
(pose_estimation.py:259-327) + its drivers `run_pose_est` (:157) and
`get_pose_2D`/`get_pose_3D` (:71, :11).  The reference iterates frames in
Python, calling two torch models per camera per frame; here the native
decoder streams (block, C, H, W, 3) uint8 blocks to the device while the
PREVIOUS block runs the jitted crop→model→decode→triangulate program
(`parallel.ShardedPosePipeline`) — decode and TPU compute overlap.

Artifact contract preserved (SURVEY.md §1): `kpts_2d.npy` (T, 17, 3, C),
`heatmaps_2d.npy` (T, C, 17, 6), `kpts_3d.npy` (T, 17, 3); existing
`kpts_2d.npy` is reused unless ``overwrite=True`` (the reference's
reuse-or-recompute prompt, pose_estimation.py:286-289, made explicit).
"""

from __future__ import annotations

import os

import numpy as np

from ..io.camera_params import get_params_from_name, stack_camera_params
from ..io.frames import BatchedFramePipeline
from ..io.manifest import load_camera_names
from ..models.registry import build_detector, build_estimator
from ..parallel.pipeline import ShardedPosePipeline

__all__ = ["estimate_pose_from_video", "run_pipeline_on_videos"]


def run_pipeline_on_videos(
    pipeline: ShardedPosePipeline,
    video_paths,
    block_size: int = 64,
    progress: bool = True,
    inflight: int = 2,
    on_block=None,
    stage_blocks: bool = True,
):
    """Stream videos through the jitted pipeline; returns stacked results.

    Three-way overlap: the decode thread fills host blocks
    (`BatchedFramePipeline`), `device_put` stages the next block while the
    device runs the current one, and result fetches trail ``inflight``
    blocks behind dispatch — the D2H copy + numpy conversion of block N
    overlaps block N+1's compute instead of serializing after it (jax
    async dispatch makes `pipeline.run` return futures; only
    `np.asarray` blocks).

    ``on_block``: optional live-preview hook (the reference shows a 2D
    keypoint overlay while inferring, pose_estimation.py:125,145-149) —
    called at DRAIN time (so it never stalls dispatch) as
    ``on_block(frames_block, kpts_2d_block, frame_offset)`` with the
    uint8 (n_valid, C, H, W, 3) block and its (n_valid, K, 3, C)
    keypoints.  See `viz.make_preview_writer` for a ready-made renderer.
    """
    from collections import deque

    frames_src = BatchedFramePipeline(video_paths, block_size=block_size,
                                      stage_to_device=stage_blocks)
    kpts_2d, heatmaps, kpts_3d = [], [], []
    n_done = 0

    def drain(item):
        nonlocal n_done
        out, n_valid, frames_block = item
        k2 = np.asarray(out["kpts_2d"])[:n_valid]
        kpts_2d.append(k2)
        heatmaps.append(np.asarray(out["heatmaps_2d"])[:n_valid])
        kpts_3d.append(np.asarray(out["kpts_3d"])[:n_valid])
        if on_block is not None:
            on_block(frames_block[:n_valid], k2, n_done)
        n_done += n_valid

    pending: deque = deque()
    try:
        iterator = frames_src
        if progress:
            try:
                from tqdm import tqdm

                iterator = tqdm(frames_src, desc="pose estimation", unit="block")
            except ImportError:
                pass
        for block, n_valid in iterator:
            # The host block is only retained until its drain when a
            # preview hook needs it (blocks are recycled otherwise).
            keep = block if on_block is not None else None
            pending.append((pipeline.run(block), n_valid, keep))
            if len(pending) > max(int(inflight), 0):
                drain(pending.popleft())
        while pending:
            drain(pending.popleft())
    finally:
        frames_src.close()
    if not kpts_2d:
        raise RuntimeError(f"no frames decoded from {video_paths}")
    return (
        np.concatenate(kpts_2d),
        np.concatenate(heatmaps),
        np.concatenate(kpts_3d),
    )


def _load_camera_param_lists(
    camera_names, intrinsic_params_dir, extrinsic_params_dir, project_dir
):
    """Ordered [K, R, T, dist] per camera from the on-disk .dat/.pkl params
    (reference pose_estimation.py:265-281)."""
    if camera_names is None:
        cameras, _origin = load_camera_names(extrinsic_params_dir)
        camera_names = [cameras[k] for k in sorted(cameras)]
    cam_lists = []
    for name in camera_names:
        _P, plist = get_params_from_name(
            name,
            intrinsic_params_dir=intrinsic_params_dir,
            extrinsic_params_dir=extrinsic_params_dir,
        )
        K, R, T, dist = plist
        if K is None:
            raise FileNotFoundError(
                f"missing intrinsics for camera '{name}' under {project_dir}"
            )
        if R is None:
            R, T = np.eye(3), np.zeros(3)  # origin camera convention
        cam_lists.append([K, R, T, dist])
    return cam_lists


def estimate_pose_from_video(
    recording_paths,
    project_dir: str = "",
    camera_names=None,
    pose_estimation_model: str = "coco_hrnet_w32",
    checkpoint: str | None = None,
    detector_model: str = "full_frame",
    detector_checkpoint: str | None = None,
    detector_bbox_thr: float = 0.3,
    detector_select: str = "top1",
    save_dir: str | None = None,
    overwrite: bool = False,
    block_size: int = 64,
    conf_threshold: float = 0.3,
    mesh=None,
    num_joints: int = 17,
    estimator_kwargs: dict | None = None,
    intrinsic_params_dir: str | None = None,
    extrinsic_params_dir: str | None = None,
    live_preview_dir: str | None = None,
    live_preview_show: bool = False,
    triangulation: str = "top2",
):
    """Full 2D+3D estimation over synchronized recordings.

    - ``camera_names``: ordered list of camera names matching
      ``recording_paths``; None loads `camera_names.pkl` from the
      extrinsic directory (reference pose_estimation.py:265-266).
    - ``intrinsic_params_dir``/``extrinsic_params_dir`` override the
      default ``<project_dir>/{intrinsic,extrinsic}_camera_parameters``
      (the reference exposes the same override, pose_estimation.py:259;
      the orchestrator passes the configuration dir's extrinsics).
    - ``estimator_kwargs={"use_pallas_stage1": True}`` enables the
      VMEM-resident stage-1 chain kernel for the hrnet heatmap family
      (+4% measured on TPU v5e, `ops/pallas/bottleneck.py`; leave off
      when running off-TPU — interpret mode is slow).

    - ``triangulation``: "top2" (reference parity,
      pose_estimation.py:35-41) or "nview" (robust confidence-weighted
      all-view DLT with residual rejection, `ops.triangulate_nview` —
      beyond-reference; needs >=3 cameras to differ from top2).

    Returns ``(kpts_2d, heatmaps_2d, kpts_3d)`` and writes the npy
    artifacts into ``save_dir`` (default: alongside the recordings).
    """
    save_dir = save_dir or os.path.dirname(str(recording_paths[0]))
    k2_path = os.path.join(save_dir, "kpts_2d.npy")
    hm_path = os.path.join(save_dir, "heatmaps_2d.npy")
    k3_path = os.path.join(save_dir, "kpts_3d.npy")

    intrinsic_params_dir = intrinsic_params_dir or os.path.join(
        project_dir, "intrinsic_camera_parameters"
    )
    extrinsic_params_dir = extrinsic_params_dir or os.path.join(
        project_dir, "extrinsic_camera_parameters"
    )

    if not overwrite and os.path.exists(k2_path) and os.path.exists(hm_path):
        kpts_2d = np.load(k2_path)
        heatmaps = np.load(hm_path)
        if os.path.exists(k3_path):
            return kpts_2d, heatmaps, np.load(k3_path)
        # Reference reuse path (pose_estimation.py:286-325): keep the
        # cached 2D keypoints, recompute 3D by triangulation only — no
        # model build, no video decode.
        from ..ops import get_pose_3d

        cam_lists = _load_camera_param_lists(
            camera_names, intrinsic_params_dir, extrinsic_params_dir,
            project_dir,
        )
        kpts_3d = np.asarray(get_pose_3d(kpts_2d, dict(enumerate(cam_lists)),
                                         method=triangulation))
        np.save(k3_path, kpts_3d)
        return kpts_2d, heatmaps, kpts_3d

    cam_lists = _load_camera_param_lists(
        camera_names, intrinsic_params_dir, extrinsic_params_dir, project_dir
    )
    cam_stack = stack_camera_params(cam_lists)

    estimator = build_estimator(
        pose_estimation_model, checkpoint=checkpoint, num_joints=num_joints,
        **(estimator_kwargs or {}),
    )
    # Person detector per the reference (mmpose_pose_estimation.py:236-250):
    # detect → top-1 box; full-frame fallback below bbox_thr.
    detector = build_detector(
        detector_model, checkpoint=detector_checkpoint,
        bbox_thr=detector_bbox_thr, select=detector_select,
    )
    pipeline = ShardedPosePipeline(
        estimator, cam_stack, mesh=mesh, conf_threshold=conf_threshold,
        detector=detector, triangulation=triangulation,
    )
    on_block = None
    if live_preview_dir or live_preview_show:
        # The reference's live overlay during inference
        # (pose_estimation.py:125,145-149), headless-first.
        from ..viz import make_preview_writer

        on_block = make_preview_writer(save_dir=live_preview_dir,
                                       show=live_preview_show)
    kpts_2d, heatmaps, kpts_3d = run_pipeline_on_videos(
        pipeline, recording_paths, block_size=block_size, on_block=on_block
    )

    os.makedirs(save_dir, exist_ok=True)
    np.save(k2_path, kpts_2d)
    np.save(hm_path, heatmaps)
    np.save(k3_path, kpts_3d)
    return kpts_2d, heatmaps, kpts_3d
