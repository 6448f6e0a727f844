from audioset_convnext_inf_tpu.checkpoint.convert import (
    jax_params_to_torch_state_dict,
    torch_state_dict_to_params,
)
from audioset_convnext_inf_tpu.checkpoint.io import (
    load_checkpoint,
    load_pretrained,
    save_checkpoint,
    save_safetensors,
)

__all__ = [
    "torch_state_dict_to_params",
    "jax_params_to_torch_state_dict",
    "load_pretrained",
    "load_checkpoint",
    "save_checkpoint",
    "save_safetensors",
]
