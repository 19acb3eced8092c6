#!/usr/bin/env bash
# Launch the clipbert_tpu container on a TPU VM — capability match for the
# reference's launch_container.sh (GPU docker run with db mounts):
#   scripts/launch_tpu.sh <TXT_DB> <IMG_DIR> <OUTPUT> <PRETRAIN_DIR>
#
# Multi-host (pod slice): run this script ON EVERY WORKER of the slice
# (e.g. `gcloud compute tpus tpu-vm ssh $TPU --worker=all -- .../launch_tpu.sh ...`).
# On Cloud TPU pods the JAX distributed runtime auto-detects the slice
# topology — every runner calls core.mesh.maybe_init_distributed() at entry
# (the reference's hvd.init() + `horovodrun -np N` equivalent, README.md:93),
# so no extra flags are needed. For manual/non-TPU fleets instead export on
# every host before starting the runner (or pass the matching
# --coordinator_address/--num_processes/--process_id flags):
#   export CLIPBERT_COORDINATOR=host0:8476   # process 0's address
#   export CLIPBERT_NUM_PROCESSES=<N>
#   export CLIPBERT_PROCESS_ID=<this host's 0-based id>
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
    -e CLIPBERT_COORDINATOR -e CLIPBERT_NUM_PROCESSES -e CLIPBERT_PROCESS_ID \
    -w /clipbert clipbert_tpu:latest \
    bash -c "source /clipbert/setup.sh && make -C native && bash"
