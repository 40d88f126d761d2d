"""Full-system demonstration on synthetic data — no cameras, no downloads.

Simulates a 2-camera rig watching a moving stick figure, then exercises the
COMPLETE framework exactly as a user would:

1. simulate a 5-joint "person" trajectory in world space
2. render per-camera videos (bright blobs at the projected joints)
3. write camera calibration artifacts through `io`
4. TRAIN a tiny heatmap model on frames from the rig (training subsystem)
5. run the end-to-end estimation entry (videos → 2D → Gaussians → 3D npy)
6. refine with the jitted Adam loop (+ linear interpolation) via the CLI
7. report world-space MPJPE at every stage and save animations

Run:  python examples/synthetic_demo.py [--outdir DIR] [--steps 400]
Expected end-state: stage MPJPEs print, refined < raw triangulation, GIFs
and reference-format artifacts in DIR.
"""

from __future__ import annotations

import os
import sys

# Runnable without PYTHONPATH (the axon env pre-sets it; see
# .claude/skills/verify).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="./synthetic_demo_out")
    p.add_argument("--steps", type=int, default=400, help="training steps")
    p.add_argument("--frames", type=int, default=48)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax
    import jax.numpy as jnp

    from multi_camera_3d_pose_estimation_tpu.cli.estimate import estimate_pose_from_video
    from multi_camera_3d_pose_estimation_tpu.cli.refine import build_parser, run_refinement
    from multi_camera_3d_pose_estimation_tpu.io import (
        save_camera_intrinsics,
        save_extrinsic_calibration_parameters,
        save_camera_names,
        write_recording_log,
    )
    from multi_camera_3d_pose_estimation_tpu.models import HRNet, preprocess_crops
    from multi_camera_3d_pose_estimation_tpu.models.registry import (
        MODEL_REGISTRY,
        save_checkpoint_npz,
    )
    from multi_camera_3d_pose_estimation_tpu.training import (
        heatmap_mse_loss,
        make_train_step,
        render_heatmap_targets,
    )

    rng = np.random.default_rng(0)
    out = os.path.abspath(args.outdir)
    rec_dir = os.path.join(out, "recordings")
    os.makedirs(rec_dir, exist_ok=True)

    # ---- 1. world trajectory (5 joints so the demo model stays tiny) ----
    T, J, C = args.frames, 5, 2
    H, W = 120, 160
    t = np.linspace(0, 4 * np.pi, T)[:, None, None]
    base = np.array([[[0, -20, 300], [-10, 0, 300], [10, 0, 300],
                      [-8, 22, 300], [8, 22, 300]]], np.float64)
    traj = base + 6 * np.stack(
        [np.sin(t[..., 0]), np.cos(1.3 * t[..., 0]), 0.4 * np.sin(2 * t[..., 0])], -1
    )
    # Joints must be visually distinct or the 2D model cannot tell them
    # apart (and triangulation pairs mismatched joints across views).
    joint_colors = [(255, 80, 80), (80, 255, 80), (80, 80, 255),
                    (255, 255, 80), (255, 80, 255)]

    # ---- 2/3. cameras + rendered videos + artifacts ---------------------
    cams = {}
    video_paths = []
    for c in range(C):
        K = np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1.0]])
        # Wide rig (±25°) so stereo depth is well conditioned.
        th = np.deg2rad(-25 + 50 * c)
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        Tv = -np.einsum("ij,j->i", R, np.array([-130.0 + 260.0 * c, 0.0, -20.0]))
        cams[c] = [K, R, Tv]
        name = f"cam{c}"
        save_camera_intrinsics(K, np.zeros((1, 5)), name, root_path=out)
        save_extrinsic_calibration_parameters(R, Tv.reshape(3, 1), name, root_dir=out)
        proj = _project_np(traj.reshape(-1, 3), K, R, Tv).reshape(T, J, 2)
        path = os.path.join(rec_dir, f"{name}_synced.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 15.0, (W, H))
        for i in range(T):
            frame = rng.integers(0, 50, (H, W, 3), dtype=np.uint8)
            for j in range(J):
                x, y = proj[i, j]
                cv2.circle(frame, (int(x), int(y)), 3, joint_colors[j], -1)
            vw.write(frame)
        vw.release()
        video_paths.append(path)
    save_camera_names({0: "cam0", 1: "cam1"}, "cam0", out)
    print(f"rendered {C} videos x {T} frames -> {rec_dir}")

    # ---- 4. train a tiny heatmap model on rig frames --------------------
    tiny = MODEL_REGISTRY["test_small_128"]
    model = HRNet(num_joints=J, cfg=tiny["cfg"], dtype=jnp.float32)
    in_size = tiny["input_size"]

    def sample_batch(n=8):
        idx = rng.integers(0, T, n)
        cam_idx = rng.integers(0, C, n)
        frames, boxes, kps = [], [], []
        for i, c in zip(idx, cam_idx):
            K, R, Tv = cams[c]
            proj = _project_np(traj[i], K, R, Tv)
            frame = rng.integers(0, 50, (H, W, 3)).astype(np.float32)
            for j in range(J):
                x, y = proj[j]
                cv2.circle(frame, (int(x), int(y)), 3, joint_colors[j], -1)
            frames.append(frame / 255.0)
            boxes.append([0, 0, W, H])
            kps.append(proj)
        crops, scale, offset = preprocess_crops(
            jnp.asarray(np.stack(frames), jnp.float32),
            jnp.asarray(np.array(boxes), jnp.float32), in_size,
        )
        kp_crop = (jnp.asarray(np.stack(kps), jnp.float32) - offset[:, None]) * scale[:, None]
        targets, w = render_heatmap_targets(
            kp_crop / 4.0, jnp.ones((n, J)), (in_size[1] // 4, in_size[0] // 4),
            sigma=1.0,
        )
        return {"images": crops, "targets": targets, "weights": w}

    def loss_fn(outputs, batch):
        return heatmap_mse_loss(jnp.moveaxis(outputs, -1, 1),
                                batch["targets"], batch["weights"])

    init_fn, step_fn = make_train_step(model, loss_fn, learning_rate=3e-3)
    state = init_fn(jax.random.PRNGKey(0), jnp.zeros((1, in_size[1], in_size[0], 3)))
    for i in range(args.steps):
        state, loss = step_fn(state, sample_batch())
        if i % 100 == 0:
            print(f"train step {i}: loss {float(loss):.5f}")
    ckpt = os.path.join(out, "demo_model.npz")
    save_checkpoint_npz({"params": state.params, "batch_stats": state.batch_stats}, ckpt)
    print(f"trained demo model -> {ckpt}")

    # ---- 5. end-to-end estimation (videos -> 3D) ------------------------
    kpts_2d, heatmaps, kpts_3d = estimate_pose_from_video(
        video_paths, project_dir=out, pose_estimation_model="test_small_128",
        checkpoint=ckpt, save_dir=rec_dir, overwrite=True, conf_threshold=0.0,
        block_size=16, num_joints=J,
        estimator_kwargs={"decode_mode": "dark"},
    )
    err_raw = np.linalg.norm(kpts_3d - traj, axis=-1)
    print(f"raw triangulation MPJPE: mean {np.nanmean(err_raw):.2f} / "
          f"median {np.nanmedian(err_raw):.2f} world units "
          f"(subject distance ≈ 340; toy 2D model ≈ 3 px error dominates)")
    write_recording_log(rec_dir, video_paths, "test_small_128", "full_frame")

    # ---- 6. refinement via the CLI --------------------------------------
    import yaml

    params_yaml = os.path.join(out, "refine.yaml")
    with open(params_yaml, "w") as f:
        yaml.dump({"SGD": {"lr": 0.05, "max_iter": 300, "patience": 50,
                           "lambda_smooth": 0.001, "lambda_body_length": 0.0}}, f)
    cli_args = build_parser().parse_args([
        "--run_path", rec_dir,
        "--refinement_types", "linear_interpolation", "SGD",
        "--extrinsic_params_dir", os.path.join(out, "extrinsic_camera_parameters"),
        "--intrinsic_params_dir", os.path.join(out, "intrinsic_camera_parameters"),
        "--refinement_params_yaml", params_yaml,
        "--ignore_body_lengths",
    ])
    results = run_refinement(cli_args)
    err_sgd = np.linalg.norm(results["SGD"] - traj, axis=-1)
    print(f"refined MPJPE: mean {np.nanmean(err_sgd):.2f} / "
          f"median {np.nanmedian(err_sgd):.2f} world units")

    # ---- 7. animation ----------------------------------------------------
    from multi_camera_3d_pose_estimation_tpu.viz import visualize_3d

    ani = visualize_3d(results["SGD"], body_parts={"demo": [[0, 1], [0, 2], [1, 3], [2, 4]]})
    gif = os.path.join(out, "pose3d.gif")
    ani.save(gif, fps=10)
    print(f"saved {gif}")
    print("DEMO COMPLETE")


def _project_np(pts3d, K, R, T, dist=None):
    """Float64 pinhole oracle (no distortion) for the simulated rig."""
    cam = pts3d @ R.T + T
    x = cam[:, 0] / cam[:, 2]
    y = cam[:, 1] / cam[:, 2]
    u = K[0, 0] * x + K[0, 1] * y + K[0, 2]
    v = K[1, 1] * y + K[1, 2]
    return np.stack([u, v], axis=-1)


if __name__ == "__main__":
    main()
