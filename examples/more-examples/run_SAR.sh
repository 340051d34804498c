#!/bin/bash
# SAR solver recipe (reference run_SAR.sh): sqrt-degree edge norm co-occurrence.
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k"}
python -m unirec_tpu.cli train --model SAR --dataloader AERecDataset \
  --dataset_path "$DATA_ROOT" --output_path "${OUT:-$HOME/.unirec/output/SAR}" \
  --edge_norm sqrt_degree --n_sample_neg_train 0 --test_protocol one_vs_all "$@"
