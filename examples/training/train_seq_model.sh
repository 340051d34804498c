#!/bin/bash
# Sequential-family training recipe (reference train_seq_model_ml100k.sh).
# MODEL in {AvgHist, AttHist, SVDPlusPlus, GRU, SASRec, ConvFormer, FASTConvFormer}.
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k"}
OUT=${OUT:-"$HOME/.unirec/output/ml-100k"}
MODEL=${1:-SASRec}
python -m unirec_tpu.cli train --model "$MODEL" --dataloader SeqRecDataset \
  --dataset_path "$DATA_ROOT" --output_path "$OUT/$MODEL" \
  --learning_rate 0.001 --epochs 100 --early_stop 10 --batch_size 512 \
  --embedding_size 64 --hidden_size 64 --max_seq_len 50 \
  --history_mask_mode autoregressive --loss_type bce --n_sample_neg_train 9 \
  --test_protocol one_vs_all --valid_protocol one_vs_all \
  --metrics "['hit@5;10;20','ndcg@5;10;20']" --key_metric ndcg@5 \
  --device_pipeline 1 "${@:2}"
