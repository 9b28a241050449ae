from tempo_tpu.analysis.connectomics import (
    error_map,
    get_seg,
    membrane_prob,
    rescan_map,
    smart_rescan,
    vi,
    vi_from_seg,
)
from tempo_tpu.analysis.pca import PCAResult, fit_pca
from tempo_tpu.analysis.probes import train_probe, r2_score, ProbeResult
from tempo_tpu.analysis.spectrum import PkOp, get_pk, pk_op, pk_rescale

__all__ = ["PCAResult", "fit_pca", "train_probe", "r2_score", "ProbeResult",
           "PkOp", "pk_op", "get_pk", "pk_rescale",
           "get_seg", "vi", "vi_from_seg", "error_map", "membrane_prob",
           "rescan_map", "smart_rescan"]
