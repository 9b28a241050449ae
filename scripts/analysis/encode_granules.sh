#!/bin/bash
set -e
cd "$(dirname "$0")/../.."
python -m tempo_tpu.cli.encode_granules configs/analysis/encode_granules.yaml "$@"
