#!/bin/bash
# Wrapper: forwards extra args (--overwrite --debug) to the CLI module.
set -e
cd "$(dirname "$0")/../.."
python -m tempo_tpu.cli.train_vae_l2 configs/training/train_vae_l2_supervised.yaml "$@"
