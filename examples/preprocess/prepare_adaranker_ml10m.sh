#!/bin/bash
# Build the ml-10m100k Ada-Ranker dataset: distribution-mixer negatives per
# group + item2vec pretrained embeddings (role of the reference's
# run_prepare_data-ml-10m100k-adaranker.sh + specific_datasets/ranker.py).
# INFILE: interactions tsv (user_id, item_id, timestamp);
# ITEM2CATE: item_id -> category tsv.
set -e
INFILE=${INFILE:?set INFILE=/path/to/ml10m.inter}
ITEM2CATE=${ITEM2CATE:?set ITEM2CATE=/path/to/item2cate.tsv}
OUT=${OUT:-"$HOME/.unirec/data/ml-10m-adaranker"}
python -m unirec_tpu.cli prepare-adaranker --infile "$INFILE" \
  --item2cate_file "$ITEM2CATE" --out_dir "$OUT" \
  --n_neg_k 19 --pretrain_item_emb 1 --embedding_size 64 "$@"
