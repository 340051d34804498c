#!/bin/bash
# Build the ranking datasets (reference run_prepare_data-ml-100k-libfm.sh /
# -rank.sh): grouped one-vs-k T4 rows + libFM T7 rows from a raw file.
set -e
RAW=${RAW:?set RAW=/path/to/interactions.tsv}
OUT=${OUT:-"$HOME/.unirec/data/ml-100k-rank"}
python -m unirec_tpu.cli prepare-data --raw_file "$RAW" --out_dir "$OUT" \
  --n_neg_k 20 --libfm 1 "$@"
