#!/usr/bin/env bash
# FLOPs/throughput profiling (↔ reference script/profile_flops.sh).
set -euo pipefail
CFG=${1:-cfgs/s3dis/AMContrast3D-AA.yaml}
shift || true
python examples/profile.py --cfg "${CFG}" "$@"
