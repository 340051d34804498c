#!/usr/bin/env bash
# Multi-host launch (role of the reference's torchrun recipe,
# examples/training/multi_gpu_train_ml100k.sh): run the SAME command on every
# host; jax.distributed rendezvous replaces torchrun's c10d. On Cloud TPU
# pods the three flags are auto-detected and can be omitted.
set -e
unirec-tpu train \
    --coordinator_address "$COORD_ADDR" \
    --num_processes "$NUM_HOSTS" --process_id "$HOST_ID" \
    --model SASRec --dataloader SeqRecDataset \
    --dataset_path "$1" --output_path "$2" \
    --loss_type fullsoftmax --test_protocol one_vs_all \
    --user_history_filename user_history \
    --mesh_data -1 --mesh_model 1 \
    --batch_size 8192 --epochs 100
