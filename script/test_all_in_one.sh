#!/usr/bin/env bash
# Batch evaluation of trained checkpoints (↔ reference script/test_all_in_one.sh).
# Runs --mode=test for every *_ckpt_best under the given log root.
set -euo pipefail
LOG_ROOT=${1:-log/s3dis}
CFG=${2:-cfgs/s3dis/AMContrast3D-AA.yaml}
MAIN=${3:-main_AA}
for ckpt in "${LOG_ROOT}"/*/checkpoint/*_ckpt_best.ckpt; do
  echo "=== testing ${ckpt}"
  python examples/segmentation/${MAIN}.py --cfg "${CFG}" mode=test \
      pretrained_path="${ckpt}"
done
