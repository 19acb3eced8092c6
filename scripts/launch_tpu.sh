#!/usr/bin/env bash
# Launch the clipbert_tpu container on a TPU VM — capability match for the
# reference's launch_container.sh (GPU docker run with db mounts):
#   scripts/launch_tpu.sh <TXT_DB> <IMG_DIR> <OUTPUT> <PRETRAIN_DIR>
set -eo pipefail
TXT_DB=${1:?txt db dir}
IMG_DIR=${2:?img/vis db dir}
OUTPUT=${3:?output dir}
PRETRAIN_DIR=${4:?pretrained weights dir}

docker run --rm -it --privileged --net=host \
    --mount src="$(pwd)",dst=/clipbert,type=bind \
    --mount src="$OUTPUT",dst=/storage,type=bind \
    --mount src="$PRETRAIN_DIR",dst=/pretrain,type=bind,readonly \
    --mount src="$TXT_DB",dst=/txt,type=bind,readonly \
    --mount src="$IMG_DIR",dst=/img,type=bind,readonly \
    -e PJRT_DEVICE=TPU \
    -w /clipbert clipbert_tpu:latest \
    bash -c "source /clipbert/setup.sh && make -C native && bash"
