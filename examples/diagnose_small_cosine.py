"""Root-cause probe: small-model warmup+cosine blow-up (VERDICT r3 #5).

PARITY.md records `test_small_192x256` at 5000 steps measuring 10.96 mm
under a CONSTANT lr 3e-3 but 146 mm (outlier-driven) under the
warmup+cosine schedule that fixed the flagship's underfit.  Both see the
same peak lr, so the difference must be WHEN the divergence happens and
whether the schedule leaves budget to heal it.  This script trains the
small model under both schedules with an eval every 500 steps (pixel
error of the decoded keypoints on a fixed clip), printing the full
trajectory — locating the blow-up in training time instead of guessing.

Run on the TPU:
    python examples/diagnose_small_cosine.py [--steps 5000] [--seeds 0 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    p.add_argument("--schedules", nargs="+",
                   default=["cosine", "constant"])
    p.add_argument("--peak_lr", type=float, default=3e-3)
    p.add_argument("--model", default="test_small_192x256")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from bench import _ensure_backend

        _ensure_backend()

    import jax
    import jax.numpy as jnp

    from multi_camera_3d_pose_estimation_tpu.models.hrnet import HRNet
    from multi_camera_3d_pose_estimation_tpu.models.registry import MODEL_REGISTRY
    from multi_camera_3d_pose_estimation_tpu.models.topdown import TopDownEstimator
    from multi_camera_3d_pose_estimation_tpu.training.harness import (
        _make_tx,
        _sample_person_crops,
    )
    from multi_camera_3d_pose_estimation_tpu.training.loop import make_train_step
    from multi_camera_3d_pose_estimation_tpu.training.losses import heatmap_mse_loss
    from multi_camera_3d_pose_estimation_tpu.training.synthetic import (
        SyntheticSceneConfig,
        person_bbox,
    )
    from multi_camera_3d_pose_estimation_tpu.training.targets import (
        render_heatmap_targets,
    )

    spec = MODEL_REGISTRY[args.model]
    in_w, in_h = spec["input_size"]
    results = {}

    for seed in args.seeds:
        # Fixed eval clip (same construction as the harness).
        scene = SyntheticSceneConfig(n_cams=2, seed=seed)
        scene.rng = np.random.default_rng(seed + 1_000_003)
        n_eval = 16
        traj = scene.trajectory(n_eval)
        frames, projs, boxes = [], [], []
        for i in range(n_eval):
            f, prj, _ = scene.render_views(traj[i])
            frames.append(f)
            projs.append(prj)
            boxes.append(np.stack([
                person_bbox(prj[c], scene.width, scene.height)
                for c in range(2)
            ]))
        ev_frames = np.stack(frames).reshape(-1, scene.height, scene.width, 3)
        ev_proj = np.stack(projs).reshape(-1, 17, 2)
        ev_boxes = np.stack(boxes).reshape(-1, 4).astype(np.float32)

        for schedule in args.schedules:
            scene.rng = np.random.default_rng(seed)  # same data stream
            model = HRNet(num_joints=17, cfg=spec["cfg"], dtype=jnp.float32)
            init_fn, step_fn = make_train_step(
                model,
                lambda outputs, b: heatmap_mse_loss(
                    jnp.moveaxis(outputs, -1, 1), b["targets"], b["weights"]),
                tx=_make_tx(args.peak_lr, args.steps, schedule),
            )
            state = init_fn(jax.random.PRNGKey(seed),
                            jnp.zeros((1, in_h, in_w, 3)))
            curve = []
            batch = 8
            while state.step < args.steps:
                crops, kp_crop = _sample_person_crops(scene, batch,
                                                      (in_w, in_h))
                targets, w = render_heatmap_targets(
                    kp_crop / 4.0, jnp.ones((batch, 17)),
                    (in_h // 4, in_w // 4), sigma=1.5)
                state, loss = step_fn(state, {"images": crops,
                                              "targets": targets,
                                              "weights": w})
                if state.step % args.eval_every == 0 or state.step >= args.steps:
                    est = TopDownEstimator(
                        model,
                        {"params": state.params,
                         "batch_stats": state.batch_stats},
                        input_size=(in_w, in_h), decode="heatmap",
                        flip_test=True, decode_mode="dark",
                    )
                    out = est.predict_batch(
                        jnp.asarray(ev_frames.astype(np.float32) / 255.0),
                        jnp.asarray(ev_boxes))
                    kp = np.asarray(out["keypoints"])[..., :2]
                    err = np.linalg.norm(kp - ev_proj, axis=-1)
                    curve.append({
                        "step": int(state.step),
                        "loss": float(loss),
                        "px_mean": float(np.nanmean(err)),
                        "px_p99": float(np.nanquantile(err, 0.99)),
                    })
                    print(f"seed={seed} {schedule} step={state.step} "
                          f"loss={loss:.3e} px={curve[-1]['px_mean']:.3f} "
                          f"p99={curve[-1]['px_p99']:.2f}", flush=True)
            results[f"s{seed}_{schedule}"] = curve

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
