#!/bin/bash
# Ranking-family recipe (reference train_ranking_model_ml100k.sh).
# FM: T7 libFM rows; BST/AdaRanker: T4 grouped rows.
set -e
OUT=${OUT:-"$HOME/.unirec/output"}
MODEL=${1:-BST}
if [ "$MODEL" = "FM" ]; then
  DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k-libfm"}
  python -m unirec_tpu.cli train --model FM --dataloader RankDataset \
    --dataset_path "$DATA_ROOT" --output_path "$OUT/FM" --group_size 21 \
    --learning_rate 0.001 --epochs 10 --embedding_size 80 --batch_size 1024 \
    --valid_protocol one_vs_k --test_protocol one_vs_k \
    --metrics "['auc','group_auc']" --key_metric auc "${@:2}"
else
  DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k-rank"}
  python -m unirec_tpu.cli train --model "$MODEL" --dataloader SeqRecDataset \
    --dataset_path "$DATA_ROOT" --output_path "$OUT/$MODEL" \
    --learning_rate 0.00088 --epochs 20 --batch_size 1024 --embedding_size 32 \
    --n_layers 3 --n_heads 8 --inner_size 64 --max_seq_len 10 \
    --valid_protocol one_vs_k --test_protocol one_vs_k \
    --metrics "['auc','group_auc']" --key_metric auc "${@:2}"
fi
