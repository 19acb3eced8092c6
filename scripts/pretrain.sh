#!/usr/bin/env bash
# COCO+VG image-text MLM+ITM pretraining (reference README.md:226 flow).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m clipbert_tpu.tasks.run_pretrain \
    --config configs/pretrain_image_text_base_resnet50_mlm_itm.json "$@"
