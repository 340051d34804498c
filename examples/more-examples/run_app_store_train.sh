#!/bin/bash
# Full-flag CF training on an app-store / Beauty-style BaseDataset (role of
# the reference's run_app-store_train.sh): EASE by default; swap MODEL for
# any of [AvgHist, AttHist, MF, SVDPlusPlus, GRU, SASRec, EASE, SAR, SLIM,
# MultiVAE] — the AERec solvers ignore the SGD-only flags.
set -e
MODEL=${MODEL:-EASE}
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/app-store"}
OUT=${OUT:-"$HOME/.unirec/output/app-store/$MODEL"}

python -m unirec_tpu.cli train --model "$MODEL" --dataloader AERecDataset \
  --dataset_path "$DATA_ROOT" --output_path "$OUT" \
  --exp_name "app-store-$MODEL" \
  --learning_rate 0.002 --dropout_prob 0.0 \
  --embedding_size 32 --hidden_size 32 --use_pre_item_emb 0 \
  --loss_type softmax --max_seq_len 20 \
  --has_user_bias 1 --has_item_bias 1 \
  --epochs 50 --early_stop 10 --batch_size 512 \
  --n_sample_neg_train 9 --n_sample_neg_valid 9 \
  --test_protocol one_vs_all --grad_clip_value 0.1 --weight_decay 1e-6 \
  --history_mask_mode unorder --user_history_filename user_history \
  --metrics "['group_auc','hit@5;10;20','ndcg@5;10;20']" \
  --key_metric ndcg@5 "$@"
