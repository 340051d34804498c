#!/bin/bash
# T6 time-sequence benchmark (reference run_seq_time_benchmark.sh): adds the
# time-embedding feature path (time_seq windows ride the device pipeline).
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/Steam-time"}
OUT=${OUT:-"$HOME/.unirec/output/seq-time-benchmark"}
python -m unirec_tpu.cli train --model "${1:-SASRec}" --dataloader SeqRecDataset \
  --dataset_path "$DATA_ROOT" --output_path "$OUT" --time_seq 64 \
  --max_seq_len 50 --loss_type bce --n_sample_neg_train 19 \
  --embedding_size 256 --learning_rate 0.001 --epochs 200 --early_stop 10 \
  --device_pipeline 1 "${@:2}"
