#!/usr/bin/env bash
# Per-worker TPU VM setup: dependencies + optional GCS data mount.
# Parity with the reference's start.sh/setup.sh provisioning (minus the
# committed wandb API key, which must come from the environment).
#
#   DATA_BUCKET=my-training-data ./scripts/setup_tpu_vm.sh
set -euo pipefail

sudo apt-get update -qq && sudo apt-get install -y -qq ffmpeg

pip install -q "jax[tpu]" flax optax orbax-checkpoint grain einops opencv-python-headless

if [[ -n "${DATA_BUCKET:-}" ]]; then
  if ! command -v gcsfuse >/dev/null; then
    export GCSFUSE_REPO="gcsfuse-$(lsb_release -c -s)"
    echo "deb https://packages.cloud.google.com/apt ${GCSFUSE_REPO} main" |
      sudo tee /etc/apt/sources.list.d/gcsfuse.list
    curl -s https://packages.cloud.google.com/apt/doc/apt-key.gpg | sudo apt-key add -
    sudo apt-get update -qq && sudo apt-get install -y -qq gcsfuse
  fi
  mkdir -p "${HOME}/data"
  gcsfuse --implicit-dirs "${DATA_BUCKET}" "${HOME}/data"
fi

if [[ -n "${WANDB_API_KEY:-}" ]]; then
  pip install -q wandb
fi

echo "setup complete on $(hostname)"
