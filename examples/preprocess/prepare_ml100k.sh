#!/bin/bash
# Download + split + convert ml-100k (reference preprocess_ml100k.sh +
# run_prepare_data-ml-100k.sh): downloader -> split csvs -> training pkls.
set -e
OUT=${OUT:-"$HOME/.unirec/data"}
python -m unirec_tpu.cli download-data --dataset ml-100k --out_dir "$OUT/ml-100k-splits" "$@"
python -m unirec_tpu.cli convert-splits --split_dir "$OUT/ml-100k-splits" --out_dir "$OUT/ml-100k"
