#!/bin/bash
# T1_1 variant with the per-row max_len column (reference
# split-run_prepare_data-ml-100k-sequential-max_len.sh).
set -e
OUT=${OUT:-"$HOME/.unirec/data"}
python -m unirec_tpu.cli download-data --dataset ml-100k \
  --out_dir "$OUT/ml-100k-maxlen-splits" --need_max_len 1 "$@"
python -m unirec_tpu.cli convert-splits --split_dir "$OUT/ml-100k-maxlen-splits" \
  --out_dir "$OUT/ml-100k-max_len" --max_len_col 1
