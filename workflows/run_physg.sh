#!/usr/bin/env bash
# PhySG baseline: closed-form SG shading with global materials
# usage: ./run_physg.sh robot <geometry_ckpt>
set -e
source "$(dirname "$0")/common.sh"
SCENE=${1:-robot}
GEOMETRY=${2:-}

ARGS=()
[ -n "$GEOMETRY" ] && ARGS+=(--freeze_geometry --geometry "$GEOMETRY")
python -u -m nefii_tpu.training.exp_runner \
  --conf "$REPO/confs/physg.conf" \
  --data_split_dir "$DATA_PATH/$SCENE/train/" \
  --data_split_dir_test "$DATA_PATH/$SCENE/test/" \
  --exps_folder_name "$SAVE_PATH" \
  --expname "physg_$SCENE" \
  --nepoch 2000 \
  --max_niter 150001 \
  --gamma 1.0 \
  --batch_size 1 \
  "${ARGS[@]}" \
 2>&1 | tee "run_physg_$SCENE.log"
