#!/usr/bin/env bash
# Canonical SASRec training recipe (role of the reference's
# examples/training/train_ml100k.sh): prepare data once with
#   unirec-tpu prepare-data --raw_file ml-100k.inter --out_dir data/ml-100k --time_col timestamp
set -e
DATA=${1:-data/ml-100k}
OUT=${2:-output/sasrec-ml100k}

unirec-tpu train \
    --model SASRec --dataloader SeqRecDataset \
    --dataset_path "$DATA" --output_path "$OUT" \
    --loss_type fullsoftmax --n_sample_neg_train 0 \
    --valid_protocol one_vs_all --test_protocol one_vs_all \
    --user_history_filename user_history \
    --metrics "['hit@5;10;20','ndcg@5;10;20']" --key_metric ndcg@10 \
    --max_seq_len 50 --embedding_size 64 --hidden_size 64 --inner_size 256 \
    --n_layers 2 --n_heads 2 --hidden_dropout_prob 0.5 --attn_dropout_prob 0.5 \
    --learning_rate 0.001 --batch_size 1024 --epochs 100 --early_stop 10 \
    --shuffle_train 1 --history_mask_mode autoregressive \
    --compute_dtype bfloat16 --dropout_rng_impl rbg --dropout_bits 8 \
    --last_query_only 1
# the last line is the measured-best TPU speed config
# (docs/performance_notes.md): bf16 towers, hardware-RNG byte-mask dropout,
# single-query final attention layer (SASRec only consumes position L-1).
# Drop it for bit-reproducibility with cross-backend threefry dropout.
