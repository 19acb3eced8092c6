#!/usr/bin/env bash
# One-command released-checkpoint parity check (BASELINE.md north star):
# import the released MSRVTT retrieval .pt, run the full-matrix 1000x1000
# eval with the protocol from configs/msrvtt_ret_base_resnet50.json, and
# print R@1/R@5/R@10 beside the paper values.
#
# Usage:
#   scripts/verify_released_ckpt.sh CKPT.pt TXT_DB.jsonl IMG_DB_DIR TOKENIZER_DIR
#
# Artifacts come from the reference downloaders
# (/root/reference/scripts/download_pretrained.sh, download_msrvtt.sh).
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT=${1:?usage: verify_released_ckpt.sh CKPT TXT_DB IMG_DB TOKENIZER_DIR}
TXT=${2:?missing TXT_DB (msrvtt_retrieval_test.jsonl)}
IMG=${3:?missing IMG_DB (video store dir)}
TOK=${4:?missing TOKENIZER_DIR (bert-base-uncased with vocab.txt)}

exec python -m clipbert_tpu.verify_ckpt \
    --e2e_weights_path "$CKPT" \
    --txt_db "$TXT" \
    --img_db "$IMG" \
    --tokenizer_dir "$TOK" \
    "${@:5}"
