#!/bin/bash
# Chain all probe runs (linear + MLP on base and L2-supervised checkpoints).
set -e
cd "$(dirname "$0")/../.."
python -m tempo_tpu.cli.probe_analysis configs/analysis/linear_probe.yaml "$@"
python -m tempo_tpu.cli.probe_analysis configs/analysis/mlp_probe.yaml "$@"
