#!/usr/bin/env bash
# Production-scale SASRec training: the exact configuration bench.py measures
# at ~264k examples/sec/chip (124 ms/step, HBM-bandwidth-bound — see
# docs/performance_notes.md for the A/B behind every flag).
#
# Key differences from the small-data recipe (train_sasrec_ml100k.sh):
#   --device_pipeline 1   negative sampling + history windowing run INSIDE
#                         the jitted train step; the host feeds only raw
#                         (user_id, item_id) int32 columns. Removes the
#                         ~150k rows/s host assembly ceiling.
#   --batch_size 32768    measured optimum at these shapes (49k ran at
#                         higher per-example cost; 64k exceeds XLA's 2 GiB
#                         single-buffer limit on the [B,H,L,L] tensor).
#   --shard_embeddings 1  row-shards user/item tables over the 'model' mesh
#                         axis on multi-chip meshes (id gather becomes an
#                         XLA all-to-all); no-op on one chip.
set -e
DATA=${1:-data/production}
OUT=${2:-output/sasrec-production}

unirec-tpu train \
    --model SASRec --dataloader SeqRecDataset \
    --dataset_path "$DATA" --output_path "$OUT" \
    --loss_type bce --n_sample_neg_train 9 \
    --valid_protocol one_vs_all --test_protocol one_vs_all \
    --user_history_filename user_history \
    --metrics "['hit@10;50','ndcg@10;50']" --key_metric ndcg@10 \
    --max_seq_len 50 --embedding_size 64 --hidden_size 64 --inner_size 128 \
    --n_layers 2 --n_heads 2 --hidden_dropout_prob 0.1 --attn_dropout_prob 0.1 \
    --learning_rate 0.001 --batch_size 32768 --epochs 50 --early_stop 5 \
    --shuffle_train 1 --history_mask_mode autoregressive \
    --device_pipeline 1 --shard_embeddings 1 \
    --compute_dtype bfloat16 --dropout_rng_impl rbg --dropout_bits 8 \
    --last_query_only 1 --fused_layer 1 --fused_lastq 1
# Multi-host: run this same script on every host with
#   --coordinator_address host0:1234 --num_processes N --process_id i
# (docs/parallelism.md; expected scaling efficiency >=98.8% at 4 hosts —
# bench/scaling_model.py derives it from the compiled step's collective
# traffic).
