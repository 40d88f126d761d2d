#!/bin/bash
# Swin accuracy tuning (ROADMAP #2): the thin production-crop Swin at a
# doubled step budget under the warmup+cosine schedule that fixed the
# HRNet flagship's underfit.  Resume-capable via --workdir.
set -x
OUT=${1:-/root/ctl}
mkdir -p "$OUT"
cd /root/repo

python examples/accuracy_harness.py \
  --model test_swin_192x256 --pose_steps 10000 \
  --out "$OUT/swin_10000.json" --workdir "$OUT/ckpt" \
  >"$OUT/swin_10000.log" 2>&1

echo DONE
