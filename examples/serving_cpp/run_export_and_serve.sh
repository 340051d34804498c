#!/bin/bash
# Export + native serving demo (role of reference serving/run_torch2onnx.sh
# + the C#/Java clients): StableHLO export, C++ PJRT client build, inference.
set -e
CKPT=${CKPT:?set CKPT=/path/to/checkpoint.pkl}
ART=${ART:-/tmp/unirec_art}
PLUGIN=${PLUGIN:-/opt/axon/libaxon_pjrt.so}
HERE=$(cd "$(dirname "$0")" && pwd)
python -m unirec_tpu.cli export --model_file "$CKPT" --out_dir "$ART" --batch_size 8
g++ -O2 -std=c++17 "$HERE/unirec_serve.cc" -ldl \
  -I "$(python -c 'import tensorflow, os; print(os.path.join(os.path.dirname(tensorflow.__file__), "include"))')" \
  -o /tmp/unirec_serve
/tmp/unirec_serve "$PLUGIN" "$ART/score.mlir" "${IN:-inputs.bin}" "${OUTBIN:-outputs.bin}"
