#!/bin/bash
# T1_1 (explicit per-row max_len) variant (reference train_seq_model_ml100k_max_len.sh):
# the dataset's max_len column truncates each history window.
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k-max_len"}
OUT=${OUT:-"$HOME/.unirec/output/ml-100k-max_len"}
python -m unirec_tpu.cli train --model "${1:-SASRec}" --dataloader SeqRecDataset \
  --dataset_path "$DATA_ROOT" --output_path "$OUT" \
  --train_file_format user-item-max_len --valid_file_format user-item-max_len \
  --test_file_format user-item-max_len \
  --history_mask_mode autoregressive --max_seq_len 50 \
  --loss_type bce --n_sample_neg_train 9 --epochs 100 --early_stop 10 "${@:2}"
