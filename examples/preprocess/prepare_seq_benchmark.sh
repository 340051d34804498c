#!/bin/bash
# Build the sequential-benchmark datasets (role of the reference's
# run_prepare_data-sequential_benchmark.sh): leave-one-out split + static
# one-vs-k candidate files for the benchmark's one_vs_k protocol
# (run_seq_benchmark.sh trains on the output).
set -e
RAW=${RAW:?set RAW=/path/to/interactions.tsv}
OUT=${OUT:-"$HOME/.unirec/data/seq-benchmark"}
python -m unirec_tpu.cli prepare-data --raw_file "$RAW" --out_dir "$OUT" \
  --time_col timestamp --n_neg_k 100 "$@"
