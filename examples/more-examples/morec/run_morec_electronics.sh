#!/bin/bash
# MoRec full-knob finetune on an amazon-electronics-style BaseDataset
# (role of the reference's morec/run_morec_electronics-elec.sh): exposes
# every controller knob — PI gains, beta band, per-objective weights and
# the alignment-distribution file — on top of a pretrained base model
# (run_base_model.sh).
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/amazon-electronics"}
OUT=${OUT:-"$HOME/.unirec/output/morec-electronics"}
BASE_CKPT=${BASE_CKPT:-"$OUT/base/checkpoint/morec-base.pkl"}

python -m unirec_tpu.cli train --model MF --dataloader BaseDataset \
  --dataset_path "$DATA_ROOT" --output_path "$OUT/finetune" \
  --exp_name morec-electronics \
  --load_pretrained_model 1 --model_file "$BASE_CKPT" \
  --enable_morec 1 --morec_objective_controller PID \
  --morec_objectives "['fairness','alignment','revenue']" \
  --morec_ngroup "[10, 10, -1]" \
  --morec_alpha 0.01 --morec_lambda 0.2 --morec_expect_loss 0.25 \
  --morec_beta_min 0.1 --morec_beta_max 1.5 \
  --morec_K_p 0.05 --morec_K_i 0.001 \
  --morec_objective_weights "[0.1,0.1,0.8]" \
  --item_meta_morec_filename item_meta_morec.csv \
  --align_dist_filename align_dist.tsv \
  --loss_type bpr --has_user_emb 1 \
  --learning_rate 0.001 --epochs 30 --early_stop -1 \
  --metrics "['hit@10','ndcg@10','rhit@10','rndcg@10','pop-kl@10','least-misery']" \
  --key_metric ndcg@10 --use_tensorboard 1 "$@"
