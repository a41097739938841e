# Shared configuration for the NeFII-TPU workflow scripts.
# Override via environment: DATA_PATH, SAVE_PATH, REPO.
REPO=${REPO:-$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)}
DATA_PATH=${DATA_PATH:-/data/datasets/nefii/ds_physg}
SAVE_PATH=${SAVE_PATH:-exps}
export PYTHONPATH="$REPO:$PYTHONPATH"
