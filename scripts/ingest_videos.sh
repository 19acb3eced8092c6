#!/usr/bin/env bash
# Pack raw videos into a CBPK store with JSEQ transcode (replaces the
# reference's file2lmdb flow).
set -euo pipefail
IN=${1:?input dir}; OUT=${2:?output .cbpk}
cd "$(dirname "$0")/.."
python -m clipbert_tpu.data.ingest --input_root "$IN" --output "$OUT" \
    --type video --jseq --num_workers "${NUM_WORKERS:-8}"
