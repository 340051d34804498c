#!/bin/bash
# Batch top-k recommendation from a checkpoint (reference kddcup2023/rec_topk.sh).
set -e
CKPT=${CKPT:?set CKPT=/path/to/checkpoint.pkl}
DATA_ROOT=${DATA_ROOT:?set DATA_ROOT}
python -m unirec_tpu.cli reco-topk --model_file "$CKPT" \
  --dataset_path "$DATA_ROOT" --output_path "${OUT:-$HOME/.unirec/output/topk}" \
  --topk 100 --last_item 0 "$@"
