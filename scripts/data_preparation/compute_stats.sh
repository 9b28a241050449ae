#!/bin/bash
# Wrapper: forwards extra args (--overwrite --debug) to the CLI module.
set -e
cd "$(dirname "$0")/../.."
python -m tempo_tpu.cli.compute_stats configs/data_preparation/compute_stats.yaml "$@"
