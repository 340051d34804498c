#!/bin/bash
# FMLP-style sequence text files (reference run_prepare_data-fmlp.sh).
set -e
python - "$@" <<'PY'
import sys
from unirec_tpu.data.downloaders import convert_fmlp
print(convert_fmlp(sys.argv[1], sys.argv[2]))
PY
