"""Checkpoint I/O: save/load the native format, torch ckpts, and HF layouts.

Native format (what :func:`save_pretrained` writes):
  <dir>/config.json     — {"model_class": ..., **constructor kwargs}
  <dir>/params.msgpack  — flax-serialized parameter pytree

``from_pretrained`` resolution order (reference contract ufm.py:120,
README.md:108-113): local directory first; if absent and the hub is
reachable, download config.json + weights from HuggingFace Hub (safetensors
torch weights go through the converter).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import flax.serialization
import jax
import numpy as np

from ufm_tpu.checkpoint.convert import (
    modify_state_dict,
    torch_state_dict_to_params,
)

__all__ = [
    "save_pretrained",
    "load_pretrained",
    "load_pretrained_ckpt",
    "load_torch_checkpoint_into",
]

_CONFIG_NAME = "config.json"
_PARAMS_NAME = "params.msgpack"

# The documented reference drops for Lightning-style training checkpoints
# (ufm.py:208-210).
_REFERENCE_DROPS = {"feature_matching_proj": None, "encoder.model.mask_token": None}


def _constructor_kwargs(model) -> Dict[str, Any]:
    """Reference-schema constructor kwargs for the given wrapper instance."""
    cfg = model.config.to_dict()
    cfg["inference_resolution"] = [list(r) for r in model.inference_resolution]
    return cfg


def save_pretrained(model, save_directory: str) -> None:
    os.makedirs(save_directory, exist_ok=True)
    payload = {"model_class": type(model).__name__, **_constructor_kwargs(model)}
    with open(os.path.join(save_directory, _CONFIG_NAME), "w") as f:
        json.dump(payload, f, indent=2, default=_json_default)
    with open(os.path.join(save_directory, _PARAMS_NAME), "wb") as f:
        f.write(flax.serialization.to_bytes(model._params_for_apply()))


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, (tuple, set)):
        return list(o)
    raise TypeError(f"not JSON-serializable: {type(o)}")


def _strip_non_constructor_keys(config: Dict[str, Any]) -> Dict[str, Any]:
    config = dict(config)
    config.pop("model_class", None)
    # HF-style extras the reference mixin writes
    for k in ("_name_or_path", "transformers_version", "architectures", "torch_dtype"):
        config.pop(k, None)
    return config


def _build_from_config(cls, config: Dict[str, Any]):
    cfg = _strip_non_constructor_keys(config)
    # The UFMArchConfig flags are internal; constructor signatures of the
    # variants mirror the reference, so pass everything through **kwargs.
    for internal in ("has_uncertainty_head", "has_classification_head"):
        cfg.pop(internal, None)
    return cls(**cfg)


def load_pretrained(cls, path_or_repo: str, revision: Optional[str] = None, **kwargs):
    """Load from a local native/HF directory or a HuggingFace Hub repo id."""
    local = path_or_repo
    if not os.path.isdir(local):
        try:
            from huggingface_hub import snapshot_download

            local = snapshot_download(path_or_repo, revision=revision)
        except Exception as e:  # zero-egress environments
            raise FileNotFoundError(
                f"'{path_or_repo}' is not a local directory and the HuggingFace Hub "
                f"is not reachable ({type(e).__name__}: {e}). Download the repo on a "
                "connected machine and pass the local path."
            ) from e

    with open(os.path.join(local, _CONFIG_NAME)) as f:
        config = json.load(f)
    model = _build_from_config(cls, config)

    params_path = os.path.join(local, _PARAMS_NAME)
    if os.path.exists(params_path):
        from ufm_tpu.checkpoint.convert import migrate_unrolled_blocks

        model.init_params()
        with open(params_path, "rb") as f:
            raw = flax.serialization.msgpack_restore(f.read())
        # accept checkpoints saved before the scan-over-layers layout
        raw = migrate_unrolled_blocks(raw)
        model.params = flax.serialization.from_state_dict(model.params, raw)
        return model

    # torch weights (HF layout): model.safetensors or pytorch_model.bin
    st_path = os.path.join(local, "model.safetensors")
    bin_path = os.path.join(local, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        state_dict = load_file(st_path)
        _load_state_dict_into(model, state_dict)
        return model
    if os.path.exists(bin_path):
        import torch

        state_dict = torch.load(bin_path, map_location="cpu", weights_only=True)
        _load_state_dict_into(model, state_dict)
        return model

    raise FileNotFoundError(f"no weights found in {local} ({_PARAMS_NAME}, model.safetensors, pytorch_model.bin)")


def load_pretrained_ckpt(cls, path: str, strict: bool = True, **kw):
    """torch checkpoint with embedded model_args (reference ufm.py:219-241)."""
    if not os.path.isfile(path):
        raise ValueError(f"Pretrained model {path} not found.")
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = _build_from_config(cls, ckpt["model_args"])
    _load_state_dict_into(model, ckpt["model"], strict=strict)
    return model


def load_torch_checkpoint_into(model, path: str) -> None:
    """Reference pretrained_checkpoint_path branch (ufm.py:198-217):
    Lightning checkpoints get the ``model.`` prefix stripped and the
    documented keys dropped."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in ckpt:
        sd = {k[6:]: v for k, v in ckpt["state_dict"].items() if k.startswith("model.")}
        sd = modify_state_dict(sd, _REFERENCE_DROPS)
        _load_state_dict_into(model, sd, strict=True)
    else:
        _load_state_dict_into(model, ckpt["model"], strict=False)


def _load_state_dict_into(model, state_dict: Dict[str, Any], strict: bool = True) -> None:
    converted = torch_state_dict_to_params(state_dict)
    if model.params is None:
        model.init_params()
    model.params = _merge_params(model.params, converted, strict=strict)


def _merge_params(template, loaded, strict: bool, path: str = ""):
    """Graft loaded arrays onto the template tree, validating shapes."""
    if not isinstance(template, dict):
        arr = np.asarray(loaded)
        t = np.asarray(template)
        assert arr.shape == t.shape, f"shape mismatch at {path}: ckpt {arr.shape} vs model {t.shape}"
        return jax.numpy.asarray(arr.astype(t.dtype))

    out = {}
    missing = [k for k in template if k not in loaded]
    unexpected = [k for k in loaded if k not in template]
    if strict and (missing or unexpected):
        raise KeyError(f"state dict mismatch at '{path}': missing {missing[:5]}, unexpected {unexpected[:5]}")
    for k, v in template.items():
        out[k] = _merge_params(v, loaded[k], strict, f"{path}/{k}") if k in loaded else v
    return out
