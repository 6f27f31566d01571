"""DINOv2-style ViT feature encoder (the UFM backbone), TPU-native.

Re-creates the UniCeption "feature returner" encoder contract
(reference import surface: uniflowmatch/models/ufm.py:13, 187, 291-315):
the encoder consumes a normalized image batch and returns a *list* of
per-layer feature maps; UFM uses the last entry for info-sharing and the
first entry for classification refinement.

TPU-first design choices:
- channel-last layout everywhere (NHWC patches / (B, S, C) tokens);
- patch embedding as a stride-14 conv lowered to one MXU matmul;
- attention via the shared dispatch (Pallas flash-attention on TPU);
- bf16 compute / fp32 params by default, matching the reference autocast
  policy (uniflowmatch/models/base.py:273).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ufm_tpu.nn.layers import TransformerBlock, scan_transformer_blocks

__all__ = ["ViTEncoderInput", "ViTEncoderOutput", "ViTEncoder"]


@dataclasses.dataclass
class ViTEncoderInput:
    """Input: ``image`` is (B, H, W, 3), normalized per ``data_norm_type``."""

    image: jnp.ndarray
    data_norm_type: str = "dinov2"


@dataclasses.dataclass
class ViTEncoderOutput:
    """One tapped feature level: ``features`` is (B, Hp, Wp, C)."""

    features: jnp.ndarray


def _interpolate_pos_embed(pos_embed: jnp.ndarray, grid_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bicubic-resize a (1, G*G, C) learned pos-embed grid to (1, H*W, C)."""
    n = pos_embed.shape[1]
    g = int(round(n**0.5))
    assert g * g == n, f"pos_embed grid is not square: {n}"
    h, w = grid_hw
    if (h, w) == (g, g):
        return pos_embed
    c = pos_embed.shape[-1]
    grid = pos_embed.reshape(1, g, g, c)
    grid = jax.image.resize(grid.astype(jnp.float32), (1, h, w, c), method="cubic")
    return grid.reshape(1, h * w, c).astype(pos_embed.dtype)


class ViTEncoder(nn.Module):
    """Plain ViT with per-layer taps ("feature returner").

    Defaults correspond to a DINOv2 ViT-L/14 backbone (the encoder family the
    released UFM checkpoints use, per the UFM paper linked at reference
    README.md:5).
    """

    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layerscale_init: Optional[float] = 1e-5
    pretrain_grid_size: int = 37  # DINOv2 pretraining: 518 / 14
    use_cls_token: bool = True
    # Which block outputs to return, in order. None -> only the final block.
    intermediate_layer_idx: Optional[Sequence[int]] = None
    norm_intermediate: bool = True
    data_norm_type: str = "dinov2"
    mlp_act: str = "gelu_exact"
    # Rematerialize block activations in the backward pass (training-time
    # memory knob; no effect on forward-only graphs). ``remat_policy`` names
    # a ``jax.checkpoint_policies`` member (nn/layers.py::resolve_remat_policy)
    remat: bool = False
    remat_policy: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inp: ViTEncoderInput) -> List[ViTEncoderOutput]:
        image = inp.image
        b, h, w, _ = image.shape
        assert h % self.patch_size == 0 and w % self.patch_size == 0, (
            f"image size {(h, w)} not divisible by patch size {self.patch_size}"
        )
        hp, wp = h // self.patch_size, w // self.patch_size

        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(image.astype(self.dtype))
        x = x.reshape(b, hp * wp, self.embed_dim)

        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, self.pretrain_grid_size**2, self.embed_dim),
        )
        x = x + _interpolate_pos_embed(pos_embed, (hp, wp)).astype(self.dtype)

        if self.use_cls_token:
            cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim))
            cls_pos = self.param("cls_pos_embed", nn.initializers.zeros, (1, 1, self.embed_dim))
            cls = (cls_token + cls_pos).astype(self.dtype)
            x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)), x], axis=1)

        taps = tuple(self.intermediate_layer_idx) if self.intermediate_layer_idx is not None else (self.depth - 1,)
        taps = tuple(t % self.depth for t in taps)

        norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        # all layers as ONE scanned block (stacked params, single compiled
        # body); only the tapped layers are materialized
        _, tap_outs = scan_transformer_blocks(
            TransformerBlock(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                layerscale_init=self.layerscale_init,
                mlp_act=self.mlp_act,
                dtype=self.dtype,
                name="blocks",
            ),
            x,
            self.depth,
            taps=taps,
            remat=self.remat,
            remat_policy=self.remat_policy,
        )
        outputs = [tap_outs[j] for j in range(len(taps))]

        results = []
        for feat in outputs:
            assert feat is not None
            if self.norm_intermediate:
                feat = norm(feat)
            if self.use_cls_token:
                feat = feat[:, 1:]
            results.append(ViTEncoderOutput(features=feat.reshape(b, hp, wp, self.embed_dim)))
        return results
