"""Model-level accuracy harness CLI — MPJPE from TRAINED weights.

Trains the person detector and the 2D pose model on synthetic COCO-17
scenes, then runs the FULL pipeline (detector → crop → HRNet → flip-TTA +
DARK decode → top-2 triangulation) against the geometry oracle.  The
numbers this prints are the PARITY.md "trained-weights accuracy" row.

Run:  python examples/accuracy_harness.py [--pose_steps 2500] [--det_steps 400]
"""

from __future__ import annotations

import os
import sys

# Runnable without PYTHONPATH (the axon env pre-sets it; see
# .claude/skills/verify).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pose_steps", type=int, default=2500)
    p.add_argument("--det_steps", type=int, default=400)
    p.add_argument("--frames", type=int, default=48)
    p.add_argument("--cams", type=int, default=2)
    p.add_argument("--family", choices=("heatmap", "simcc"), default="heatmap",
                   help="2D model family: HRNet heatmap (config 2) or "
                        "RTMPose-t SimCC (config 3)")
    p.add_argument("--model", default=None,
                   help="registry model name override (e.g. "
                        "test_small_192x256 for the production-crop-size "
                        "heatmap model)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None, help="optional JSON output path")
    p.add_argument("--distortion", action="store_true",
                   help="synthesize the rig with the default 5-coeff lens "
                        "distortion (exercises iterative undistortion with "
                        "trained weights)")
    p.add_argument("--hard", action="store_true",
                   help="hard domain: clutter, occluders, scale variation, "
                        "distractor person")
    p.add_argument("--det_select", choices=("top1", "consistent"),
                   default="top1",
                   help="box selection: reference top-1 semantics or "
                        "top-k + cross-view/temporal consistency re-pick")
    p.add_argument("--sgd", action="store_true",
                   help="chain the full MLE SGD refinement onto the "
                        "pipeline output and report mpjpe_3d_sgd")
    p.add_argument("--sgd_max_iter", type=int, default=3000)
    p.add_argument("--sgd_variants", default=None,
                   help="JSON dict of named RefineConfig overrides run "
                        "against the same trained pipeline output, e.g. "
                        '\'{"no_priors": {"lambda_smooth": 0.0, '
                        '"lambda_body_length": 0.0}}\'')
    p.add_argument("--schedule", choices=("auto", "cosine", "constant"),
                   default="auto",
                   help="synthetic-trainer lr schedule; 'auto' picks "
                        "warmup+cosine for big models and constant for "
                        "small ones (the measured-safe pairing, PARITY.md)")
    p.add_argument("--workdir", default=None,
                   help="checkpoint dir for the pose trainer (resume after "
                        "a kill); defaults to '<out>.ckpt' when --out is "
                        "given, pass 'none' to disable")
    args = p.parse_args()
    workdir = args.workdir
    if workdir is None and args.out:
        workdir = args.out + ".ckpt"
    if workdir == "none":
        workdir = None

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # The tunneled axon backend occasionally fails to register at
        # process start; re-exec a few times like bench.py does (a
        # mid-run tunnel drop still kills the run — re-run the CLI).
        from bench import _ensure_backend

        _ensure_backend()

    from multi_camera_3d_pose_estimation_tpu.training import run_accuracy_harness

    metrics = run_accuracy_harness(
        n_frames=args.frames,
        det_steps=args.det_steps,
        pose_steps=args.pose_steps,
        n_cams=args.cams,
        pose_family=args.family,
        pose_model_name=args.model,
        distortion=True if args.distortion else None,
        hard=args.hard,
        sgd_refine=args.sgd,
        sgd_kwargs={"max_iter": args.sgd_max_iter},
        sgd_variants=json.loads(args.sgd_variants) if args.sgd_variants else None,
        schedule=args.schedule,
        workdir=workdir,
        det_select=args.det_select,
    )
    print(json.dumps(metrics, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=1)


if __name__ == "__main__":
    main()
