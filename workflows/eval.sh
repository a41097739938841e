#!/usr/bin/env bash
# Decomposition metrics vs ground truth
# usage: ./eval.sh robot <render_dir>
set -e
source "$(dirname "$0")/common.sh"
SCENE=${1:-robot}
RENDER_DIR=${2:?"pass the render output dir"}

python -u -m nefii_tpu.scripts.evaluate "$RENDER_DIR" "$DATA_PATH/$SCENE/test/"
