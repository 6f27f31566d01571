from ufm_tpu.checkpoint.convert import (
    flatten_params,
    modify_state_dict,
    params_to_torch_state_dict,
    torch_state_dict_to_params,
    unflatten_params,
)
from ufm_tpu.checkpoint.io import (
    load_pretrained,
    load_pretrained_ckpt,
    load_torch_checkpoint_into,
    save_pretrained,
)

__all__ = [
    "flatten_params",
    "load_pretrained",
    "load_pretrained_ckpt",
    "load_torch_checkpoint_into",
    "modify_state_dict",
    "params_to_torch_state_dict",
    "save_pretrained",
    "torch_state_dict_to_params",
    "unflatten_params",
]
