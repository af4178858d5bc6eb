#!/usr/bin/env bash
# Training wrapper (↔ reference script/main_segmentation.sh slurm wrapper).
# Usage: script/main_segmentation.sh <main|main_AA|main_MM> <cfg> [overrides...]
set -euo pipefail
MAIN=${1:-main_AA}
CFG=${2:-cfgs/s3dis/AMContrast3D-AA.yaml}
shift 2 || true
python examples/segmentation/${MAIN}.py --cfg "${CFG}" "$@"
