#!/bin/bash
# ConvFormer / FASTConvFormer recipes (reference run_convformer.sh /
# run_fastconvformer.sh): depthwise-conv token mixer; FAST = rFFT spectral form.
set -e
DATA_ROOT=${DATA_ROOT:-"$HOME/.unirec/data/ml-100k"}
python -m unirec_tpu.cli train --model "${1:-ConvFormer}" --dataloader SeqRecDataset \
  --dataset_path "$DATA_ROOT" --output_path "${OUT:-$HOME/.unirec/output/convformer}" \
  --conv_size 8 --n_layers 2 --max_seq_len 50 --loss_type bce \
  --n_sample_neg_train 9 --learning_rate 0.001 --epochs 100 --early_stop 10 "${@:2}"
