#!/bin/bash
# BST on grouped rank data (reference test_rankers/run_bst_ml-100k-rank.sh).
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k-rank"}
python -m unirec_tpu.cli train --model BST --dataloader SeqRecDataset \
  --dataset_path "$DATA_ROOT" --output_path "${OUT:-$HOME/.unirec/output/bst}" \
  --embedding_size 32 --n_layers 3 --n_heads 8 --inner_size 64 \
  --max_seq_len 10 --learning_rate 0.00088 --epochs 20 \
  --valid_protocol one_vs_k --test_protocol one_vs_k \
  --metrics "['auc','group_auc']" --key_metric auc --device_pipeline 1 "$@"
