#!/bin/bash
set -e
cd "$(dirname "$0")/../.."
python -m tempo_tpu.cli.download configs/download/download_rad.yaml "$@"
