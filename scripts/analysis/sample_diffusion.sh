#!/bin/bash
# Wrapper: forwards extra args (--overwrite --debug) to the CLI module.
set -e
cd "$(dirname "$0")/../.."
python -m tempo_tpu.cli.sample_diffusion configs/analysis/sample_diffusion.yaml "$@"
