#!/usr/bin/env bash
# Usage: train_tgif_qa.sh {action|transition|frameqa} [extra flags]
set -euo pipefail
TASK=${1:?task: action|transition|frameqa}; shift || true
cd "$(dirname "$0")/.."
python -m clipbert_tpu.tasks.run_video_qa \
    --config "configs/tgif_qa_${TASK}_base_resnet50.json" "$@"
