#!/usr/bin/env bash
# Flagship-scale end-to-end demo: train -> checkpoint sweep -> AOT export ->
# L2-supervised multi-task -> linear probes, all at the full 27.3M-parameter
# 1028-channel configuration on the local chip(s), using synthetic
# TEMPO-shaped data. Measured round-2 results: PARITY.md "Round-2 hardware
# runs"; archived outputs: artifacts/flagship_demo/.
#
#   DATA_DIR=/tmp/tempo_flagship ./scripts/run_flagship_demo.sh
set -euo pipefail

: "${DATA_DIR:?set DATA_DIR to the demo workspace (created if missing)}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO}${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$DATA_DIR"

python - <<'EOF'
import os
from pathlib import Path
from tempo_tpu.data.synthetic import make_granule_corpus, make_tile_shards
root = Path(os.environ["DATA_DIR"])
products = ["NO2", "O3TOT", "HCHO", "CLDO4"]
if not (root / "tiles" / "train").exists():
    make_tile_shards(root / "tiles" / "train", n_files=4, tiles_per_file=48,
                     tile=64, n_spectral=1028, l2_products=products, seed=11)
    make_tile_shards(root / "tiles" / "val", n_files=1, tiles_per_file=16,
                     tile=64, n_spectral=1028, l2_products=products, seed=12)
if not (root / "granules").exists():
    make_granule_corpus(root / "granules", n_granules=4, n_mirror=72,
                        n_track=80, n_spectral=1028, l2_products=products,
                        seed=21)
print("synthetic data ready")
EOF

CFG="$REPO/configs/demo"
python -m tempo_tpu.cli.train_vae        "$CFG/flagship_train.yaml"
python -m tempo_tpu.cli.evaluate_reconstruction "$CFG/flagship_eval.yaml"
python -m tempo_tpu.cli.export_codec     "$CFG/flagship_export.yaml"
python -m tempo_tpu.cli.train_vae_l2     "$CFG/flagship_train_l2.yaml"
python -m tempo_tpu.cli.compute_stats    "$CFG/flagship_gstats.yaml"
python -m tempo_tpu.cli.prepare_tiles    "$CFG/flagship_gtiles.yaml"
python -m tempo_tpu.cli.probe_analysis   "$CFG/flagship_probe.yaml"
echo "flagship demo complete: $DATA_DIR"
