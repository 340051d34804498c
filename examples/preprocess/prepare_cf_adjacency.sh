#!/bin/bash
# Convert CF benchmark adjacency splits — yelp2018 / gowalla / amazon-book
# style train.txt/val.txt/test.txt with "user item item ..." lines — into
# training-ready pkls + data.info (role of the reference's
# run_prepare_data-CF_8_1_1.sh driving preprocess/prepare_data.py with
# per-file user_item_seq formats). Train with run_cf_dataset_train.sh.
set -e
SPLITS=${SPLITS:?set SPLITS=/path/to/{train,val,test}.txt dir}
OUT=${OUT:-"$HOME/.unirec/data/cf-benchmark"}
python -m unirec_tpu.cli convert-adjacency --split_dir "$SPLITS" \
  --out_dir "$OUT" "$@"
