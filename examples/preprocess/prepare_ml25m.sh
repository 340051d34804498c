#!/bin/bash
# Convert a raw MovieLens-25M ratings.csv into leave-one-out training pkls
# (role of the reference's run_prepare_data-ml-25m.sh). The csv header is
# userId,movieId,rating,timestamp — remapped below.
set -e
RAW=${RAW:?set RAW=/path/to/ml-25m/ratings.csv}
OUT=${OUT:-"$HOME/.unirec/data/ml-25m"}
python -m unirec_tpu.cli prepare-data --raw_file "$RAW" --out_dir "$OUT" \
  --user_col userId --item_col movieId --time_col timestamp \
  --min_inter 5 "$@"
