#!/bin/bash
# Per-(user, item) score file (reference kddcup2023/topk_score.sh): score the
# pairs listed in test_file_name instead of ranking the full catalog.
set -e
CKPT=${CKPT:?set CKPT=/path/to/checkpoint.pkl}
DATA_ROOT=${DATA_ROOT:?set DATA_ROOT}
python -m unirec_tpu.cli reco-topk --model_file "$CKPT" \
  --dataset_path "$DATA_ROOT" --output_path "${OUT:-$HOME/.unirec/output/score}" \
  --item_file "${ITEM_FILE:?set ITEM_FILE}" "$@"
