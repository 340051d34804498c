#!/usr/bin/env bash
# MF with BPR loss and dynamic uniform negatives (reference
# examples/training/*mf* recipes).
set -e
DATA=${1:-data/ml-100k}
OUT=${2:-output/mf-ml100k}

unirec-tpu train \
    --model MF --dataloader BaseDataset \
    --dataset_path "$DATA" --output_path "$OUT" \
    --loss_type bpr --n_sample_neg_train 19 --has_user_emb 1 \
    --valid_protocol one_vs_all --test_protocol one_vs_all \
    --user_history_filename user_history \
    --metrics "['hit@5;10','ndcg@5;10']" --key_metric ndcg@5 \
    --embedding_size 64 --learning_rate 0.001 --batch_size 2048 \
    --epochs 100 --early_stop 10 --shuffle_train 1
