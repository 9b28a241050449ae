#!/bin/bash
# Wrapper: forwards extra args (--overwrite --debug) to the CLI module.
set -e
cd "$(dirname "$0")/../.."
python -m tempo_tpu.cli.train_vae configs/training/train_vae_default.yaml "$@"
