#!/bin/bash
# Autoencoder-protocol ranker recipe (reference examples/more-examples/
# run_ranker.sh: EASE over AERecDataset with group_auc + hit/ndcg metrics).
# MODEL in {EASE, SLIM, AdmmSLIM, MultiVAE, SAR, UserCF}.
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/Beauty"}
MODEL=${1:-EASE}
python -m unirec_tpu.cli train --model "$MODEL" --dataloader AERecDataset \
  --dataset_path "$DATA_ROOT" \
  --output_path "${OUT:-$HOME/.unirec/output/ranker-$MODEL}" \
  --embedding_size 32 --hidden_size 32 --max_seq_len 20 \
  --has_user_bias 1 --has_item_bias 1 \
  --n_sample_neg_train 9 --n_sample_neg_valid 9 \
  --test_protocol one_vs_all \
  --history_mask_mode autoregressive \
  --metrics "['group_auc', 'hit@5;10;20', 'ndcg@5;10;20']" \
  --key_metric ndcg@5 \
  --batch_size 512 --learning_rate 0.002 --epochs 50 --early_stop 10 \
  --user_history_filename user_history "${@:2}"
