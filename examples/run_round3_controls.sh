#!/bin/bash
# The three tunnel-blocked accuracy controls (PARITY.md "Known gaps"):
#   1. small-model constant-schedule control (cosine-regression cause check)
#   2. RTMPose-t at the unified 5000-step budget
#   3. easy-domain SGD no-priors ablation at the reference hyperparameters
# Each run is resume-capable (--workdir); outputs land in $OUT.
set -x
OUT=${1:-/root/ctl}
mkdir -p "$OUT"
cd /root/repo

python examples/accuracy_harness.py \
  --model test_small_192x256 --pose_steps 5000 --schedule constant \
  --out "$OUT/small_constant.json" --workdir "$OUT/ckpt" \
  >"$OUT/small_constant.log" 2>&1

python examples/accuracy_harness.py \
  --family simcc --pose_steps 5000 \
  --out "$OUT/rtmpose_5000.json" --workdir "$OUT/ckpt" \
  >"$OUT/rtmpose_5000.log" 2>&1

python examples/accuracy_harness.py \
  --model coco_hrnet_w32 --pose_steps 5000 --sgd --sgd_max_iter 3000 \
  --sgd_variants '{"no_priors": {"lambda_smooth": 0.0, "lambda_body_length": 0.0}, "smooth_only": {"lambda_body_length": 0.0}, "bl_only": {"lambda_smooth": 0.0}}' \
  --out "$OUT/flagship_sgd_easy.json" --workdir "$OUT/ckpt" \
  >"$OUT/flagship_sgd_easy.log" 2>&1

echo DONE
