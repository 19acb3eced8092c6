#!/usr/bin/env bash
# Fetch the ClipBERT-released databases / checkpoints and stage them for
# clipbert_tpu. Capability match for the reference's per-dataset scripts
# (`/root/reference/scripts/download_{msrvtt,tgif_qa,vqa,coco_vg,didemo,
# anet,pretrained}.sh`), consolidated:
#
#   scripts/download_data.sh <download_dir> [dataset ...]
#
# datasets: msrvtt tgif_qa vqa coco_vg didemo anet pretrained (default: all)
#
# The released vis_dbs are LMDB — readable directly by our store layer
# (`clipbert_tpu/data/store.py::LmdbStore`, auto-detected by open_store);
# raw media folders re-pack to the mmap CBPK store with
#   python -m clipbert_tpu.data.ingest --input_root <dir> \
#       --output <name>.cbpk --type video
set -eo pipefail

DOWNLOAD=${1:?usage: download_data.sh <download_dir> [dataset ...]}
shift || true
DATASETS=${@:-msrvtt tgif_qa vqa coco_vg didemo anet pretrained}

BLOB='https://convaisharables.blob.core.windows.net/clipbert'
mkdir -p "$DOWNLOAD"/{vis_db,txt_db,pretrained,finetune}

fetch_tar() {  # $1 kind (vis_db|txt_db)  $2 name
    local kind=$1 name=$2
    if [ ! -d "$DOWNLOAD/$kind/$name/" ]; then
        wget -nc "$BLOB/$kind/$name.tar" -P "$DOWNLOAD/$kind/"
        mkdir -p "$DOWNLOAD/$kind/$name"
        tar -xvf "$DOWNLOAD/$kind/$name.tar" -C "$DOWNLOAD/$kind/$name"
        rm "$DOWNLOAD/$kind/$name.tar"
    fi
}

for ds in $DATASETS; do
    case $ds in
        msrvtt)
            fetch_tar vis_db msrvtt
            fetch_tar txt_db msrvtt_retrieval   # MC-Test included
            fetch_tar txt_db msrvtt_qa ;;
        tgif_qa)
            fetch_tar vis_db tgif
            fetch_tar txt_db tgif_qa ;;
        vqa)
            fetch_tar vis_db coco_vg            # VQA images = COCO
            fetch_tar txt_db vqa ;;
        coco_vg)                                # image-text pretraining
            fetch_tar vis_db coco_vg
            fetch_tar txt_db pretrain_cc3m 2>/dev/null || true
            fetch_tar txt_db pretrain_coco_vg ;;
        didemo)
            fetch_tar vis_db didemo
            fetch_tar txt_db didemo_retrieval ;;
        anet)
            fetch_tar vis_db anet
            fetch_tar txt_db anet_retrieval ;;
        pretrained)
            # image-text pretrained weights + detectron2 grid-feat R50
            # (download_pretrained.sh:11-20); consumed by
            # --e2e_weights_path / --backbone_weights_path and the opt-in
            # parity tests (tests/test_released_ckpt.py)
            wget -nc "$BLOB/pretrained/clipbert_image_text_pretrained.pt" \
                -P "$DOWNLOAD/pretrained/"
            wget -nc "$BLOB/pretrained/grid_feat_R-50.pth" \
                -P "$DOWNLOAD/pretrained/"
            wget -nc "$BLOB/pretrained/bert-base-uncased.tar" \
                -P "$DOWNLOAD/pretrained/" && \
                mkdir -p "$DOWNLOAD/pretrained/bert-base-uncased" && \
                tar -xvf "$DOWNLOAD/pretrained/bert-base-uncased.tar" \
                    -C "$DOWNLOAD/pretrained/bert-base-uncased" && \
                rm "$DOWNLOAD/pretrained/bert-base-uncased.tar" ;;
        *) echo "unknown dataset: $ds" >&2; exit 1 ;;
    esac
done
echo "done: $DOWNLOAD"
