#!/bin/bash
# MoRec stage 1 (reference morec/run_base_model.sh): pretrain the accuracy-only
# base model that the multi-objective finetune starts from.
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k"}
OUT=${OUT:-"$HOME/.unirec/output/morec"}
python -m unirec_tpu.cli train --model "${1:-MF}" --dataloader BaseDataset \
  --dataset_path "$DATA_ROOT" --output_path "$OUT/base" --exp_name morec-base \
  --loss_type bce --n_sample_neg_train 9 --has_user_emb 1 \
  --learning_rate 0.001 --epochs 100 --early_stop 10 "${@:2}"
