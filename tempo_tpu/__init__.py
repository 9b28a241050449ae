"""tempo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for TEMPO
hyperspectral VAE training, inference, and analysis.

Built from scratch with the capabilities of the reference research pipeline
(cfpark00/TEMPO-VAE, surveyed in SURVEY.md): NASA TEMPO L1b granule ingestion,
normalization + 64x64x1028 patch extraction, a ~27.3M-parameter convolutional
KL-VAE (plus an L2-multitask-supervised variant), step-based training with
checkpointing/metrics/figures, and the full analysis surface (checkpoint
sweeps, full-granule encode/decode, PCA-RGB, linear/MLP probes).

Layer map (TPU-first, not a port):
  ops/       conv/norm/attention primitives lowered for the MXU, Pallas kernels
  nn/        pure-functional flax blocks (resnet, attention, encoder, decoder)
  models/    AutoencoderKL + L2-supervised variant, loss functions
  data/      h5py granule ingest, stats, tile shards, async host loader
  train/     jitted train step (fwd+bwd+clip+AdamW fused), trainer, checkpoints
  parallel/  device mesh + sharding rules (data-parallel over ICI)
  infer/     full-granule encode/decode, checkpoint sweeps
  analysis/  PCA, linear/MLP probes, figures
  cli/       yaml-config entry points (config.yaml [--overwrite] [--debug])
"""

__version__ = "0.1.0"
