#!/bin/bash
# Batch embedding inference (reference run_infer_embeddings.sh): writes
# "id \t comma-separated-embedding" text for users and items.
set -e
CKPT=${CKPT:?set CKPT=/path/to/checkpoint.pkl}
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k"}
OUT=${OUT:-"$HOME/.unirec/output/embeddings"}
for NODE in user item; do
  python -m unirec_tpu.cli infer-embedding --model_file "$CKPT" \
    --dataset_path "$DATA_ROOT" --output_path "$OUT" --node_type $NODE "$@"
done
