#!/usr/bin/env bash
# Multi-scene training sweep (masked scenes); each run shards its ray batch
# across every visible TPU chip. usage: ./run_sweep.sh "robot hotdog coffee fruit" <geometry_root>
set -e
source "$(dirname "$0")/common.sh"
SCENES=${1:-"robot hotdog coffee fruit"}
GEOM_ROOT=${2:?"pass the root dir containing <scene> Step-1 checkpoints"}

for SCENE in $SCENES; do
  echo "=== training $SCENE ==="
  "$(dirname "$0")/run_s2_wmask.sh" "$SCENE" "$GEOM_ROOT/$SCENE"
done
