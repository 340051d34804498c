#!/bin/bash
# BST on the Beauty grouped-rank dataset (reference
# test_rankers/run_bst_Beauty-rank.sh; see prepare_libfm_rank.sh with
# RAW=<beauty interactions> for the data build).
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/Beauty-rank"}
python -m unirec_tpu.cli train --model BST --dataloader SeqRecDataset \
  --dataset "Beauty-rank" --dataset_path "$DATA_ROOT" \
  --output_path "${OUT:-$HOME/.unirec/output/bst-beauty}" \
  --embedding_size 64 --n_layers 2 --n_heads 4 --inner_size 128 \
  --max_seq_len 20 --learning_rate 0.0005 --epochs 20 \
  --valid_protocol one_vs_k --test_protocol one_vs_k \
  --metrics "['auc','group_auc']" --key_metric auc --device_pipeline 1 "$@"
