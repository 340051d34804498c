#!/bin/bash
# CF 8:1:1 split training (reference run_cf_dataset_train.sh).
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/amazon-book-CF"}
OUT=${OUT:-"$HOME/.unirec/output/cf"}
python -m unirec_tpu.cli train --model "${1:-MF}" --dataloader BaseDataset \
  --dataset_path "$DATA_ROOT" --output_path "$OUT" --loss_type bpr \
  --has_user_emb 1 --n_sample_neg_train 9 --embedding_size 64 \
  --learning_rate 0.001 --epochs 200 --early_stop 10 \
  --test_protocol one_vs_all "${@:2}"
