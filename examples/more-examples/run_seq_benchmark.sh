#!/bin/bash
# Sequential benchmark sweep (reference run_seq_benchmark.sh): every seq
# model x loss type at benchmark hyperparameters.
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/Steam"}
OUT=${OUT:-"$HOME/.unirec/output/seq-benchmark"}
for MODEL in AvgHist AttHist MF SVDPlusPlus GRU SASRec ConvFormer FASTConvFormer; do
  for LOSS in bce bpr softmax; do
    python -m unirec_tpu.cli train --model $MODEL --dataloader SeqRecDataset \
      --dataset_path "$DATA_ROOT" --output_path "$OUT/$MODEL-$LOSS" \
      --exp_name "$MODEL-$LOSS" --loss_type $LOSS --n_sample_neg_train 19 \
      --max_seq_len 50 --history_mask_mode autoregressive \
      --embedding_size 256 --learning_rate 0.001 --epochs 200 --early_stop 10 \
      --device_pipeline 1 "$@"
  done
done
