#!/bin/bash
# BST hyperparameter sweep (reference test_rankers/search_bst_ml-100k-rank.sh)
# through the local sweep driver (facility/sweep.py, wandb-yaml shape).
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k-rank"}
python -m unirec_tpu.cli sweep --sweep_file "$(dirname "$0")/../../training/sweep_sasrec.yaml" \
  --model BST --dataloader SeqRecDataset --dataset_path "$DATA_ROOT" \
  --output_path "${OUT:-$HOME/.unirec/output/bst-sweep}" --n_trials 20 \
  --valid_protocol one_vs_k --test_protocol one_vs_k \
  --metrics "['auc','group_auc']" --key_metric auc "$@"
