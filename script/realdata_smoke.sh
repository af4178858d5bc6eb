#!/usr/bin/env bash
# Day-one real-data drill (VERDICT r4 next #7): given an S3DIS root
# (s3disfull/ with raw/Area_*.npy rooms), exercise the full production
# workflow with the UNCHANGED released YAML —
#
#   1. short training run  (train → val → checkpoints)
#   2. resume from the latest checkpoint for one more epoch
#   3. whole-scene voting test (--mode=test) from the best checkpoint,
#      with the boundary/inner split and the results CSV
#
# Usage:
#   script/realdata_smoke.sh <s3dis_root> [out_dir]
#
#   SMOKE_CI=1      shrink the model + shapes so the drill runs on CPU
#                   against fabricated fixture rooms (the CI exercise of
#                   this script lives in tests/test_realdata_smoke.py)
#   SMOKE_EPOCHS=N  training epochs before the resume leg (default 2)
#
# On a real TPU with the real dataset, drop SMOKE_CI and raise
# SMOKE_EPOCHS for an actual convergence run; the command shapes are
# byte-identical to the reference CLI (README.md:61-84).
set -euo pipefail

ROOT=${1:?usage: script/realdata_smoke.sh <s3dis_root> [out_dir]}
OUT=${2:-/tmp/amc3d_realdata_smoke_$$}
EPOCHS=${SMOKE_EPOCHS:-2}
REPO=$(cd "$(dirname "$0")/.." && pwd)
CFG="cfgs/s3dis/AMContrast3D-AA.yaml"
cd "$REPO"

COMMON=("dataset.common.data_root=$ROOT" "root_dir=$OUT" "seed=0"
        "val_freq=1" "wandb.use_wandb=False")
if [[ "${SMOKE_CI:-0}" != "0" ]]; then
  # CPU-sized drill: tiny model, tiny crops, single-pass loop — the CODE
  # PATHS are the production ones, only the shapes shrink
  COMMON+=("batch_size=2" "val_batch_size=1" "eval_bucket=512"
           "dataset.train.voxel_max=256" "dataset.train.loop=1"
           "dataset.val.voxel_max=512" "dataset.val.presample=False"
           "model.encoder_args.width=8" "model.encoder_args.blocks=[1,1,1]"
           "model.encoder_args.strides=[1,4,4]"
           "model.encoder_args.nsample=8"
           "model.decoder_args.decoder_stages=2"
           "ambiguity_args.stages_num=2" "ambiguity_args.nsample=8")
fi

echo "== [1/3] train ($EPOCHS epochs) =="
python examples/segmentation/main_AA.py --cfg "$CFG" \
  "epochs=$EPOCHS" "${COMMON[@]}"

LATEST=$(find "$OUT" -name '*latest*.ckpt' | head -1)
[[ -n "$LATEST" ]] || { echo "no latest checkpoint under $OUT"; exit 1; }
echo "== [2/3] resume from $LATEST =="
python examples/segmentation/main_AA.py --cfg "$CFG" mode=resume \
  "pretrained_path=$LATEST" "epochs=$((EPOCHS + 1))" "${COMMON[@]}"

BEST=$(find "$OUT" -name '*best*.ckpt' | head -1)
[[ -n "$BEST" ]] || { echo "no best checkpoint under $OUT"; exit 1; }
echo "== [3/3] whole-scene test from $BEST =="
python examples/segmentation/main_AA.py --cfg "$CFG" mode=test \
  "pretrained_path=$BEST" "ambiguity_args.miou_B_I=True" "${COMMON[@]}"

CSV=$(find "$OUT" -name '*_test.csv' | head -1)
[[ -n "$CSV" ]] || { echo "no results CSV under $OUT"; exit 1; }
echo "== drill complete: results CSV at $CSV =="
cat "$CSV"
