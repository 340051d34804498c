#!/bin/bash
# FM on the Beauty libFM-format dataset (reference
# test_rankers/run_fm_Beauty-libfm.sh). The Beauty-libfm dataset yaml
# carries n_feats=46557; group_size = 1 positive + 20 negatives.
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/Beauty-libfm"}
python -m unirec_tpu.cli train --model FM --dataloader RankDataset \
  --dataset "Beauty-libfm" --dataset_path "$DATA_ROOT" \
  --output_path "${OUT:-$HOME/.unirec/output/fm-beauty}" \
  --group_size 21 --embedding_size 64 --learning_rate 0.001 --epochs 10 \
  --valid_protocol one_vs_k --test_protocol one_vs_k \
  --metrics "['auc','group_auc']" --key_metric auc "$@"
