#!/bin/bash
# Multi-chip data-parallel training (role of the reference run_ddp.sh,
# examples/more-examples/run_ddp.sh: torchrun --nproc_per_node=2 + DDP).
# TPU-native counterpart: ONE process drives all local chips through a
# jax.sharding Mesh — batches shard over the 'data' axis, params replicate,
# XLA inserts the gradient all-reduce (core/mesh.py). mesh_data=-1 uses
# every visible device; on a multi-host pod see
# examples/training/multi_host_train.sh.
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k"}
python -m unirec_tpu.cli train --model SASRec --dataloader SeqRecDataset \
  --dataset_path "$DATA_ROOT" --output_path "${OUT:-$HOME/.unirec/output/dp}" \
  --mesh_data -1 --mesh_model 1 \
  --loss_type fullsoftmax --n_sample_neg_train 0 \
  --max_seq_len 50 --history_mask_mode autoregressive \
  --valid_protocol one_vs_all --test_protocol one_vs_all \
  --metrics "['hit@20;100', 'ndcg@20;100', 'mrr@20;100']" \
  --key_metric mrr@100 \
  --batch_size 1024 --learning_rate 0.0003 --epochs 100 --early_stop 5 \
  --user_history_filename user_history "${@}"
