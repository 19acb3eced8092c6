#!/usr/bin/env bash
# MSRVTT retrieval inference at 16 clips (reference README.md:109-124).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m clipbert_tpu.tasks.run_video_retrieval \
    --config configs/msrvtt_ret_base_resnet50.json \
    --do_inference 1 --inference_n_clips 16 "$@"
