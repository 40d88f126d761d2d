"""Train-CLI convergence benchmark on a generated COCO dataset.

Closes the loop the reference outsources to MMPose's tooling (SURVEY.md
§2.2 rows 8-9): `cli/train.py` consuming a real COCO person_keypoints
JSON + image directory — here generated synthetically
(`training.synthetic.write_coco_dataset`), so the full user-facing train
path (COCO parse → threaded batcher → jitted train step → checkpoint →
registry load → inference) is proven to optimize to ACCURACY, not just to
step.  Prints a JSON summary with the held-out pixel error and whether it
beat ``--px_threshold``.

Run:  python examples/train_synthetic_coco.py [--steps 3000] [--model test_small_128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

# Runnable as `python examples/train_synthetic_coco.py` without PYTHONPATH
# (the axon environment pre-sets PYTHONPATH, which would otherwise need
# `:/root/repo` appended — see .claude/skills/verify).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate_px_error(est, n_eval: int = 32, width: int = 256,
                      height: int = 256, seed: int = 7) -> float:
    """Mean pixel error of `est` on freshly rendered held-out poses."""
    import numpy as np

    from multi_camera_3d_pose_estimation_tpu.training.synthetic import (
        make_scaled_scene,
        person_bbox,
        project_oracle,
        render_frame,
    )

    scene = make_scaled_scene(width, height, seed=seed)
    K, R, T, _ = scene.cams[0]
    frames, boxes, projs = [], [], []
    for _ in range(n_eval):
        pts3d = scene.sample_pose()
        proj = project_oracle(pts3d, K, R, T)
        frames.append(render_frame(proj, width, height, scene.rng))
        boxes.append(person_bbox(proj, width, height))
        projs.append(proj)
    out = est.predict_batch(np.stack(frames), np.stack(boxes))
    pred = np.asarray(out["keypoints"])[..., :2]
    err = np.linalg.norm(pred - np.stack(projs), axis=-1)
    return float(err.mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--model", default="test_small_128")
    p.add_argument("--images", type=int, default=256, help="dataset size")
    p.add_argument("--size", type=int, default=256, help="frame width=height")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--px_threshold", type=float, default=6.0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None, help="optional JSON output path")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from multi_camera_3d_pose_estimation_tpu.cli.train import main as train_main
    from multi_camera_3d_pose_estimation_tpu.models.registry import build_estimator
    from multi_camera_3d_pose_estimation_tpu.training.synthetic import (
        write_coco_dataset,
    )

    with tempfile.TemporaryDirectory() as td:
        ann, imgs = write_coco_dataset(td, n_images=args.images,
                                       width=args.size, height=args.size)
        ckpt = os.path.join(td, "model.npz")
        t0 = time.time()
        train_main([
            "--annotations", ann, "--images", imgs, "--model", args.model,
            "--steps", str(args.steps), "--batch_size", str(args.batch_size),
            "--learning_rate", str(args.learning_rate), "--out", ckpt,
            "--checkpoint_every", "0", "--log_every", "200",
            "--image_size", str(args.size), str(args.size),
            "--dtype", "float32" if args.cpu else "bfloat16",
        ])
        train_s = time.time() - t0
        trained = build_estimator(args.model, checkpoint=ckpt)
        random_init = build_estimator(args.model, seed=3)
        px_trained = evaluate_px_error(trained, width=args.size, height=args.size)
        px_random = evaluate_px_error(random_init, width=args.size, height=args.size)

    result = {
        "px_err_trained": round(px_trained, 3),
        "px_err_random_init": round(px_random, 3),
        "px_threshold": args.px_threshold,
        "passed": px_trained < args.px_threshold,
        "steps": args.steps,
        "model": args.model,
        "train_wall_s": round(train_s, 1),
    }
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    if not result["passed"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
