#!/bin/bash
# FASTConvFormer recipe (reference examples/more-examples/run_fastconvformer.sh):
# the spectral (rFFT) form of ConvFormer's depthwise-conv token mixer, same
# hyperparameters as the reference script (d=32, inner=256, bpr loss).
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/Beauty"}
python -m unirec_tpu.cli train --model FASTConvFormer --dataloader SeqRecDataset \
  --dataset_path "$DATA_ROOT" \
  --output_path "${OUT:-$HOME/.unirec/output/fastconvformer}" \
  --loss_type bpr --embedding_size 32 --hidden_size 32 --inner_size 256 \
  --max_seq_len 50 --history_mask_mode autoregressive \
  --has_user_bias 1 --has_item_bias 1 \
  --n_sample_neg_train 9 --n_sample_neg_valid 19 \
  --valid_protocol one_vs_all --test_protocol one_vs_all \
  --grad_clip_value 0.1 --weight_decay 1e-6 \
  --metrics "['hit@10;20;30', 'ndcg@10;20;30']" --key_metric ndcg@20 \
  --batch_size 512 --learning_rate 0.002 --epochs 50 --early_stop 5 \
  --user_history_filename user_history "${@}"
