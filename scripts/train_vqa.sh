#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")/.."
python -m clipbert_tpu.tasks.run_vqa --config configs/vqa_base_resnet50.json "$@"
