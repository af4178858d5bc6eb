#!/usr/bin/env bash
# Device-mode kernel test tier: compiled Pallas kernels on a real TPU.
# CPU CI (pytest tests/) only exercises interpret mode; run this wherever a
# TPU is attached (the tests self-skip without one).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests_device/ -v "$@"
