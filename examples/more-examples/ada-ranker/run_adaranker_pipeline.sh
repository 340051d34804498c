#!/bin/bash
# Ada-Ranker end-to-end pipeline (reference ada-ranker/
# run_adaranker_pipeline_ml-10m100k-adaranker.sh): train Base backbone, then
# the distribution-adaptive ranker, then evaluate both.
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k-adaranker"}
OUT=${OUT:-"$HOME/.unirec/output/adaranker"}
BASE=${BASE:-GRU}
common="--dataloader SeqRecDataset --dataset_path $DATA_ROOT \
  --learning_rate 0.001 --epochs 100 --early_stop 15 --batch_size 256 \
  --embedding_size 64 --max_seq_len 10 --dropout_prob 0.6 \
  --valid_protocol one_vs_k --test_protocol one_vs_k \
  --metrics ['auc','group_auc'] --key_metric group_auc"
# stage 1: Base train_type (plain backbone)
python -m unirec_tpu.cli train --model AdaRanker --train_type Base \
  --base_model $BASE --output_path "$OUT/base" --exp_name ada-base $common "$@"
# stage 2: Ada-Ranker train_type (FiLM modulation + memory-unit patches)
python -m unirec_tpu.cli train --model AdaRanker --train_type Ada-Ranker \
  --base_model $BASE --output_path "$OUT/ada" --exp_name ada-ranker $common "$@"
# stage 3: finetune from the base checkpoint
python -m unirec_tpu.cli train --model AdaRanker --train_type Ada-Ranker \
  --base_model $BASE --output_path "$OUT/finetune" --exp_name ada-finetune \
  --load_pretrained_model 1 --model_file "$OUT/base/checkpoint/ada-base.pkl" \
  $common "$@"
