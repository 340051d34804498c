#!/bin/bash
# Finetune from the pretrained checkpoint (reference kddcup2023/run_finetune.sh).
set -e
DATA_ROOT=${DATA_ROOT:?set DATA_ROOT}
OUT=${OUT:-"$HOME/.unirec/output/kdd-finetune"}
python -m unirec_tpu.cli train --model SASRec --dataloader SeqRecDataset \
  --dataset_path "$DATA_ROOT" --output_path "$OUT" --exp_name finetune \
  --load_pretrained_model 1 \
  --model_file "${CKPT:-$HOME/.unirec/output/kdd-pretrain/checkpoint/pretrain.pkl}" \
  --loss_type fullsoftmax --learning_rate 0.0005 --epochs 20 "$@"
