#!/bin/bash
# Pre-train with frozen text embeddings + categorical item features
# (reference examples/more-examples/run_app-store_train.sh: SASRec with
# use_text_emb + use_features on a locale app-store dataset).
# text_emb_path: csv of item_id -> 1024-d text vector; features_filepath:
# csv of item_id -> categorical feature ids with vocab sizes features_shape.
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/app-store"}
python -m unirec_tpu.cli train --model SASRec --dataloader SeqRecDataset \
  --dataset_path "$DATA_ROOT" \
  --output_path "${OUT:-$HOME/.unirec/output/text-features}" \
  --loss_type fullsoftmax --n_sample_neg_train 0 \
  --embedding_size 176 --max_seq_len 7 --history_mask_mode autoregressive \
  --has_user_bias 0 --has_item_bias 1 \
  --valid_protocol one_vs_all --test_protocol one_vs_all \
  --metrics "['hit@20;100;200', 'ndcg@20;100;200', 'mrr@20;100;200']" \
  --key_metric mrr@100 \
  --use_text_emb 1 --text_emb_path "$DATA_ROOT/item_embeddings_nid.csv" \
  --text_emb_size 1024 \
  --use_features 1 --features_filepath "$DATA_ROOT/id2features.csv" \
  --features_shape '[3489, 99]' \
  --grad_clip_value 23.4 --tau 0.695 \
  --hidden_dropout_prob 0.43 --attn_dropout_prob 0.146 \
  --batch_size 1024 --learning_rate 0.000275 --epochs 100 --early_stop 5 \
  --user_history_filename user_history \
  --user_history_file_format user-item_seq "${@}"
