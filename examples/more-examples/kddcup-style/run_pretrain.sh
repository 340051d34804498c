#!/bin/bash
# Large-catalog pretrain (role of reference kddcup2023/run_pretrain.sh):
# SASRec full-softmax with row-sharded item table on the device mesh.
set -e
DATA_ROOT=${DATA_ROOT:?set DATA_ROOT}
OUT=${OUT:-"$HOME/.unirec/output/kdd-pretrain"}
python -m unirec_tpu.cli train --model SASRec --dataloader SeqRecDataset \
  --dataset_path "$DATA_ROOT" --output_path "$OUT" --exp_name pretrain \
  --loss_type fullsoftmax --n_sample_neg_train 0 --max_seq_len 10 \
  --embedding_size 128 --learning_rate 0.002 --epochs 100 --early_stop 5 \
  --shard_embeddings 1 --mesh_model 4 --device_pipeline 1 "$@"
