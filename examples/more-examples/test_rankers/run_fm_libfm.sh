#!/bin/bash
# FM on libFM-format data (reference test_rankers/run_fm_ml-100k-libfm.sh).
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k-libfm"}
python -m unirec_tpu.cli train --model FM --dataloader RankDataset \
  --dataset_path "$DATA_ROOT" --output_path "${OUT:-$HOME/.unirec/output/fm}" \
  --group_size 21 --embedding_size 80 --learning_rate 0.001 --epochs 10 \
  --valid_protocol one_vs_k --test_protocol one_vs_k \
  --metrics "['auc','group_auc']" --key_metric auc "$@"
