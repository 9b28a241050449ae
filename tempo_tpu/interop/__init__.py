from tempo_tpu.interop.torch_ckpt import (
    params_from_torch_state_dict,
    load_torch_checkpoint,
)

__all__ = ["params_from_torch_state_dict", "load_torch_checkpoint"]
