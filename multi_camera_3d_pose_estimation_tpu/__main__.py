"""Package CLI dispatcher.

    python -m multi_camera_3d_pose_estimation_tpu <command> [args...]

Commands mirror the reference's entry points (SURVEY.md §3) plus training:
  record_and_estimate   calibrate → record → sync → estimate (L4)
  refine                linear interpolation / SGD refinement CLI
  plot                  heatmap / 3D-pose animations
  train                 train a 2D model on COCO-format data
  convert               import/verify MMPose torch checkpoints (.pth)
  doctor                environment health check (imports, native media
                        runtime, bounded device-backend probe, CPU mesh)
"""

from __future__ import annotations

import sys

_COMMANDS = {
    "record_and_estimate": "multi_camera_3d_pose_estimation_tpu.cli.record_and_estimate",
    "refine": "multi_camera_3d_pose_estimation_tpu.cli.refine",
    "plot": "multi_camera_3d_pose_estimation_tpu.cli.plot",
    "train": "multi_camera_3d_pose_estimation_tpu.cli.train",
    "convert": "multi_camera_3d_pose_estimation_tpu.cli.convert",
    "doctor": "multi_camera_3d_pose_estimation_tpu.cli.doctor",
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in _COMMANDS:
        print(__doc__)
        if argv and argv[0] not in ("-h", "--help"):
            print(f"error: unknown command {argv[0]!r}", file=sys.stderr)
            raise SystemExit(2)
        raise SystemExit(0)
    import importlib

    module = importlib.import_module(_COMMANDS[argv[0]])
    module.main(argv[1:])


if __name__ == "__main__":
    main()
