#!/bin/bash
# MoRec stage 2 (reference morec/run_pipeline.sh): finetune with
# revenue/fairness/alignment objectives under a controller.
# CONTROLLER in {Static, MGDA, ParetoMTL, EPO, PI, PIX}.
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k"}
OUT=${OUT:-"$HOME/.unirec/output/morec"}
CONTROLLER=${1:-PI}
python -m unirec_tpu.cli train --model MF --dataloader BaseDataset \
  --dataset_path "$DATA_ROOT" --output_path "$OUT/finetune-$CONTROLLER" \
  --exp_name "morec-$CONTROLLER" \
  --load_pretrained_model 1 --model_file "$OUT/base/checkpoint/morec-base.pkl" \
  --enable_morec 1 --morec_objective_controller "$CONTROLLER" \
  --morec_objectives "['fairness','alignment','revenue']" \
  --morec_ngroup "[10, 10, -1]" --morec_expect_loss 0.22 --morec_beta_min 0.01 \
  --item_meta_morec_filename item_meta_morec.csv \
  --loss_type bce --n_sample_neg_train 9 --has_user_emb 1 \
  --learning_rate 0.0005 --epochs 20 \
  --metrics "['hit@5;10','ndcg@5;10','rhit@10','rndcg@10','pop-kl@10','least-misery']" "${@:2}"
