#!/usr/bin/env bash
# MoRec multi-objective finetuning recipe (role of the reference's
# examples/more-examples/morec scripts): pretrain an accuracy-only model,
# then finetune with the adaptive sampler + PID controller. Requires
# item_meta_morec.csv (item_id,weight,fair_group,align_group) in DATA.
set -e
DATA=${1:-data/ml-100k}
OUT=${2:-output/morec}

unirec-tpu train \
    --model MF --dataloader BaseDataset --has_user_emb 1 \
    --dataset_path "$DATA" --output_path "$OUT/pretrain" \
    --loss_type bpr --n_sample_neg_train 9 \
    --test_protocol one_vs_all --valid_protocol one_vs_all \
    --user_history_filename user_history \
    --metrics "['hit@5;10','ndcg@5;10']" --key_metric ndcg@5 \
    --epochs 50 --exp_name morec-pre

unirec-tpu train \
    --model MF --dataloader BaseDataset --has_user_emb 1 \
    --dataset_path "$DATA" --output_path "$OUT/finetune" \
    --loss_type bpr --n_sample_neg_train 9 \
    --test_protocol one_vs_all --valid_protocol one_vs_all \
    --user_history_filename user_history \
    --metrics "['hit@5;10','ndcg@5;10','rhit@5;10','rndcg@5;10','pop-kl@10','least-misery']" \
    --key_metric ndcg@5 \
    --enable_morec 1 --load_pretrained_model 1 \
    --model_file "$OUT/pretrain/checkpoint/morec-pre.pkl" \
    --morec_objectives "['fairness','alignment','revenue']" \
    --morec_objective_controller PID --morec_ngroup 10 \
    --morec_alpha 0.01 --morec_lambda 0.2 --morec_expect_loss 0.25 \
    --epochs 20 --exp_name morec-fine
