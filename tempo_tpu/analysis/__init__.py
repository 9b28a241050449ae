from tempo_tpu.analysis.pca import PCAResult, fit_pca
from tempo_tpu.analysis.probes import train_probe, r2_score, ProbeResult

__all__ = ["PCAResult", "fit_pca", "train_probe", "r2_score", "ProbeResult"]
