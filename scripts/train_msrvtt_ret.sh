#!/usr/bin/env bash
# MSRVTT text-to-video retrieval finetuning (reference README.md:93-107 flow).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m clipbert_tpu.tasks.run_video_retrieval \
    --config configs/msrvtt_ret_base_resnet50.json "$@"
