"""torch state_dict ⇄ flax params conversion.

The reference loads PyTorch checkpoints three ways (HF hub safetensors,
Lightning training checkpoints with ``model.`` prefixes, and ckpts with
embedded ``model_args`` — uniflowmatch/models/ufm.py:198-241). This module
re-creates that surface for the TPU framework:

- :func:`modify_state_dict` — the reference's key surgery
  (strip/replace/drop; ufm.py:85-117), including the documented drops
  ``feature_matching_proj`` and ``encoder.model.mask_token`` (ufm.py:208-210);
- :func:`torch_state_dict_to_params` — rule-based mapping from torch
  parameter names/layouts to this framework's flax tree (linear weights
  transposed, conv kernels OIHW→HWIO, LayerNorm weight→scale, fused qkv kept
  fused);
- :func:`params_to_torch_state_dict` — the exact inverse, used for export
  and for round-trip testing.

The name grammar it accepts is this framework's canonical torch naming (the
layout a torch port of these modules would produce). Checkpoints with other
layouts can be adapted via the ``extra_mappings`` hook.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "canonicalize_reference_names",
    "modify_state_dict",
    "torch_state_dict_to_params",
    "params_to_torch_state_dict",
    "flatten_params",
    "unflatten_params",
]


def modify_state_dict(original_state_dict: Dict[str, Any], mappings: Dict[str, Optional[str]]) -> Dict[str, Any]:
    """Key surgery: ``{old_substr: new_substr_or_None}`` — None drops the key.
    First matching rule wins (reference semantics, ufm.py:85-117)."""
    out = {}
    for k, v in original_state_dict.items():
        new_key = k
        skip = False
        for old, new in mappings.items():
            if old in k:
                if new is None:
                    skip = True
                else:
                    new_key = k.replace(old, new)
                break
        if not skip:
            out[new_key] = v
    return out


def flatten_params(params: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested flax params dict -> {'a/b/c': array}."""
    flat = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(flatten_params(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _to_numpy(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


# Structural renames from the reference's torch naming to this framework's
# module tree, applied before the leaf/layout rules:
# - the encoder wraps a timm/DINOv2 model as `encoder.model.*` (the key
#   surgery at reference ufm.py:208-210 shows this prefix);
# - torch ModuleList entries are `blocks.N`, ours are `blocks_N`;
# - torch PatchEmbed has an inner `.proj` conv, ours IS the conv;
# - reference heads are nn.Sequential(Sequential(DPTFeature, DPTProcessor),
#   AdaptorMap) -> keys `head1.0.0.*` / `head1.0.1.*` (ufm.py:262-273).
_REFERENCE_NAME_RULES: Tuple[Tuple[str, str], ...] = (
    (r"^encoder\.model\.", "encoder."),
    (r"^head1\.0\.0\.", "head1.feature."),
    (r"^head1\.0\.1\.", "head1.processor."),
    (r"^uncertainty_head\.0\.0\.", "uncertainty_head.feature."),
    (r"^uncertainty_head\.0\.1\.", "uncertainty_head.processor."),
    (r"\.blocks\.(\d+)\.", r".blocks_\1."),
    (r"\.patch_embed\.proj\.", ".patch_embed."),
    (r"\.downs\.(\d+)\.", r".down_\1."),
    # reference UNet internals (unet_encoder.py:15-48): DoubleConv wraps its
    # two convs in a Sequential named `conv` (indices 0/2; 1/3 are ReLUs),
    # and the output conv is `final_conv`
    (r"\.conv\.0\.", ".conv1."),
    (r"\.conv\.2\.", ".conv2."),
    (r"\.final_conv\.", ".final."),
)


def canonicalize_reference_names(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Rewrite reference-layout torch keys into this framework's naming."""
    import re

    def fix_unet_ups(key: str) -> str:
        # reference UNet interleaves ConvTranspose/DoubleConv in one list
        # (unet_encoder.py:42-45): ups.{2k} -> up_{k}, ups.{2k+1} -> up_conv_{k}
        def rep(m):
            i = int(m.group(1))
            return f".up_{i // 2}." if i % 2 == 0 else f".up_conv_{i // 2}."

        return re.sub(r"\.ups\.(\d+)\.", rep, key)

    out = {}
    for k, v in state_dict.items():
        for pat, rep in _REFERENCE_NAME_RULES:
            k = re.sub(pat, rep, k)
        out[fix_unet_ups(k)] = v
    return out


def _split_cls_pos_embed(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """DINOv2-style checkpoints store one (1, 1+G², C) pos_embed including
    the cls position; this framework keeps the (1, G², C) grid and the cls
    position as separate parameters (ufm_tpu/nn/encoders/vit.py)."""
    key = "encoder.pos_embed"
    if key in sd:
        pe = sd[key]
        if pe.ndim == 3:
            n = pe.shape[1]
            g = int(round(n**0.5))
            g1 = int(round((n - 1) ** 0.5))
            if g * g != n and g1 * g1 == n - 1:
                sd = dict(sd)
                sd["encoder.cls_pos_embed"] = pe[:, :1]
                sd[key] = pe[:, 1:]
    return sd


def _torch_name_to_flax(name: str) -> Tuple[str, Callable[[np.ndarray], np.ndarray]]:
    """Map one torch parameter name to (flax flat path, layout transform)."""
    parts = name.split(".")
    transform: Callable[[np.ndarray], np.ndarray] = lambda x: x

    # --- leaf renaming + layout rules ---------------------------------------
    leaf = parts[-1]
    parent = parts[-2] if len(parts) >= 2 else ""

    if leaf == "weight":
        if parent in ("norm", "norm1", "norm2") or parent.startswith("norm") or "LayerNorm" in parent:
            parts[-1] = "scale"
        elif any(s in parent for s in ("conv", "proj", "resize", "patch_embed", "final", "project")) or parent.startswith(("fc", "up_", "down")):
            # decided by tensor rank at call time; see below
            parts[-1] = "kernel"
        else:
            parts[-1] = "kernel"
    elif leaf == "gamma":  # LayerScale
        parts[-1] = "gamma"

    flax_path = "/".join(parts)
    return flax_path, transform


_TRANSPOSED_CONV_MARKERS = (".ups.", "resize_0.", "resize_1.")


def _is_transposed_conv(torch_name: str) -> bool:
    parts = torch_name.split(".")
    parent = parts[-2] if len(parts) >= 2 else ""
    if any(m in torch_name for m in _TRANSPOSED_CONV_MARKERS):
        return True
    # UNet up-convs are named up_{i} (ConvTranspose), up_conv_{i} are regular
    return parent.startswith("up_") and not parent.startswith("up_conv")


def _layout_transform(arr: np.ndarray, torch_name: str, to_flax: bool) -> np.ndarray:
    """Apply layout conversion based on rank (+ transposed-conv marker).

    torch Conv2d OIHW <-> flax HWIO; torch ConvTranspose2d IOHW <-> flax
    HWIO *with spatial flip* (flax's default ConvTranspose is an unflipped
    fractionally-strided conv — verified empirically in
    tests/test_torch_parity.py)."""
    is_transposed_conv = _is_transposed_conv(torch_name)
    if arr.ndim == 4:
        if to_flax:
            if is_transposed_conv:
                return np.ascontiguousarray(arr.transpose(2, 3, 0, 1)[::-1, ::-1])
            return arr.transpose(2, 3, 1, 0)
        else:
            if is_transposed_conv:
                return np.ascontiguousarray(arr[::-1, ::-1].transpose(2, 3, 0, 1))
            return arr.transpose(3, 2, 0, 1)
    if arr.ndim == 2:
        return arr.T  # linear weight
    return arr


def torch_state_dict_to_params(
    state_dict: Dict[str, Any],
    extra_mappings: Optional[Dict[str, Optional[str]]] = None,
    canonicalize: bool = True,
) -> Dict[str, Any]:
    """Convert a torch state_dict to a flax params tree.

    ``canonicalize`` first rewrites reference-layout names (DINOv2 wrapper
    prefixes, ModuleList indices, Sequential head indices) into this
    framework's naming; already-canonical names pass through unchanged.
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    if extra_mappings:
        sd = modify_state_dict(sd, extra_mappings)
    if canonicalize:
        sd = canonicalize_reference_names(sd)
        sd = _split_cls_pos_embed(sd)

    flat: Dict[str, np.ndarray] = {}
    for name, arr in sd.items():
        flax_path, _ = _torch_name_to_flax(name)
        leaf = flax_path.split("/")[-1]
        if leaf == "kernel":
            arr = _layout_transform(arr, name, to_flax=True)
        flat[flax_path] = arr
    return unflatten_params(_stack_scanned_blocks(flat))


_BLOCKS_RE = None


def _stack_scanned_blocks(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Per-layer ``.../blocks_N/<sub>`` entries -> one stacked
    ``.../blocks/<sub>`` array with a leading layer axis (the transformer
    stacks run as ONE lax.scan over stacked params; nn/layers.py
    scan_transformer_blocks)."""
    import re

    groups: Dict[Tuple[str, str], Dict[int, np.ndarray]] = {}
    rest: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        m = re.match(r"^(.*?)blocks_(\d+)/(.+)$", k)
        if m:
            groups.setdefault((m.group(1), m.group(3)), {})[int(m.group(2))] = v
        else:
            rest[k] = v
    for (prefix, suffix), layers in groups.items():
        n = max(layers) + 1
        missing = [i for i in range(n) if i not in layers]
        assert not missing, f"missing transformer layers {missing} for {prefix}blocks/{suffix}"
        rest[f"{prefix}blocks/{suffix}"] = np.stack([layers[i] for i in range(n)])
    return rest


def migrate_unrolled_blocks(tree: Any) -> Any:
    """Migrate a params tree saved by the pre-scan layout (per-layer
    ``blocks_N`` subtrees) to the scanned layout (one ``blocks`` subtree with
    a leading layer axis). Already-migrated trees pass through unchanged."""
    import re

    if not isinstance(tree, dict):
        return tree
    tree = {k: migrate_unrolled_blocks(v) for k, v in tree.items()}
    layer_keys = sorted(
        (k for k in tree if re.fullmatch(r"blocks_\d+", k)), key=lambda s: int(s.split("_")[1])
    )
    if layer_keys and "blocks" not in tree:
        import jax

        layers = [tree.pop(k) for k in layer_keys]
        tree["blocks"] = jax.tree.map(lambda *xs: np.stack(xs), *layers)
    return tree


def _unstack_scanned_blocks(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`_stack_scanned_blocks`: emit per-layer entries so
    exported state dicts keep the reference's torch-style per-layer names."""
    out: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        parts = k.split("/")
        if "blocks" in parts:
            i = parts.index("blocks")
            for layer in range(v.shape[0]):
                out["/".join(parts[:i] + [f"blocks_{layer}"] + parts[i + 1 :])] = v[layer]
        else:
            out[k] = v
    return out


def params_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`torch_state_dict_to_params` (numpy arrays)."""
    flat = _unstack_scanned_blocks(flatten_params(params))
    out: Dict[str, np.ndarray] = {}
    for path, arr in flat.items():
        parts = path.split("/")
        leaf = parts[-1]
        parent = parts[-2] if len(parts) >= 2 else ""
        torch_name_parts = list(parts)
        if leaf == "scale":
            torch_name_parts[-1] = "weight"
        elif leaf == "kernel":
            torch_name_parts[-1] = "weight"
        torch_name = ".".join(torch_name_parts)
        if leaf == "kernel":
            arr = _layout_transform(arr, torch_name, to_flax=False)
        out[torch_name] = arr
    return out
