#!/usr/bin/env bash
# SASRec on ml-100k with Weights & Biases logging (role of the reference's
# examples/training/train_ml100k_with_wandb.sh + wandb_start.sh): run
# `wandb login` once, then this script; use `unirec-tpu sweep` with
# examples/training/sweep_sasrec.yaml for hyperparameter sweeps.
set -e
DATA=${1:-data/ml-100k}
OUT=${2:-output/sasrec-ml100k-wandb}

unirec-tpu train \
    --model SASRec --dataloader SeqRecDataset \
    --dataset_path "$DATA" --output_path "$OUT" \
    --use_wandb 1 --wandb_project unirec-tpu --exp_name sasrec-ml100k \
    --loss_type fullsoftmax --n_sample_neg_train 0 \
    --valid_protocol one_vs_all --test_protocol one_vs_all \
    --user_history_filename user_history \
    --metrics "['hit@5;10;20','ndcg@5;10;20']" --key_metric ndcg@10 \
    --max_seq_len 50 --embedding_size 64 --hidden_size 64 --inner_size 256 \
    --n_layers 2 --n_heads 2 --hidden_dropout_prob 0.5 --attn_dropout_prob 0.5 \
    --learning_rate 0.001 --batch_size 1024 --epochs 100 --early_stop 10 \
    --shuffle_train 1 --history_mask_mode autoregressive "${@:3}"
