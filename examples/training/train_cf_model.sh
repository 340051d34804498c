#!/bin/bash
# CF-family training recipe (role of reference examples/training/train_cf_model_ml100k.sh).
# MODEL in {MF, MultiVAE, EASE, SLIM, AdmmSLIM, SAR, UserCF}.
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k"}
OUT=${OUT:-"$HOME/.unirec/output/ml-100k"}
MODEL=${1:-MF}
case "$MODEL" in
  MF)        LOADER=BaseDataset;  EXTRA="--loss_type bpr --n_sample_neg_train 9 --has_user_emb 1";;
  MultiVAE)  LOADER=AERecDataset; EXTRA="--loss_type fullsoftmax --n_sample_neg_train 0";;
  *)         LOADER=AERecDataset; EXTRA="--n_sample_neg_train 0";;   # solver models
esac
python -m unirec_tpu.cli train --model "$MODEL" --dataloader $LOADER \
  --dataset_path "$DATA_ROOT" --output_path "$OUT/$MODEL" \
  --learning_rate 0.001 --epochs 100 --early_stop 10 --batch_size 1024 \
  --embedding_size 64 --test_protocol one_vs_all --valid_protocol one_vs_all \
  --metrics "['hit@5;10;20','ndcg@5;10;20']" --key_metric ndcg@5 \
  --user_history_filename user_history $EXTRA "${@:2}"
