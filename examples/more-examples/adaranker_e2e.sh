#!/usr/bin/env bash
# Ada-Ranker end-to-end recipe (reference examples/more-examples/ada-ranker):
# T4 grouped candidates (1 pos + k sampled negs) from prepare-data --n_neg_k.
set -e
DATA=${1:-data/ml-10m-rank}
OUT=${2:-output/adaranker}

unirec-tpu train \
    --model AdaRanker --dataloader SeqRecDataset \
    --train_type Ada-Ranker --base_model GRU \
    --dataset_path "$DATA" --output_path "$OUT" \
    --train_file_format user-item_group-label_group \
    --valid_file_format user-item_group-label_group \
    --test_file_format user-item_group-label_group \
    --valid_protocol one_vs_k --test_protocol one_vs_k \
    --user_history_filename user_history \
    --metrics "['auc','group_auc']" --key_metric auc \
    --loss_type bce --batch_size 1024 --learning_rate 0.001 \
    --epochs 50 --exp_name adaranker
