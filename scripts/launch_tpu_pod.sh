#!/usr/bin/env bash
# Launch training on every worker of a Cloud TPU pod slice.
# Parity with the reference's gcloud fan-out (claude_distributed/*.sh) without
# the hard-coded project IDs, buckets, or API keys.
#
#   TPU_NAME=train-v6e-16 ZONE=us-east5-b ./scripts/launch_tpu_pod.sh \
#       --data_dir ~/data/videos --batch_size 1 --max_frames 32
set -euo pipefail

TPU_NAME="${TPU_NAME:?set TPU_NAME}"
ZONE="${ZONE:?set ZONE}"
REPO_DIR="${REPO_DIR:-\$HOME/video-vae-tpu}"

gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" --worker=all \
  --command "cd ${REPO_DIR} && python -m video_vae_tpu.cli.train $*"
