"""Two-view info-sharing transformer ("global attention").

TPU-native equivalent of ``uniception.models.info_sharing``'s
``global_attention`` / ``global_attention_transformer`` classes (reference
import surface: uniflowmatch/models/ufm.py:14, 162-163, 193, 390-394): a
transformer that jointly attends over the patch tokens of BOTH views and
returns ``(final, [interm_a, interm_b])`` where every element exposes
``.features[view]`` as a spatial feature map.

Design: the two views' token sequences are concatenated into one (B, 2S, C)
sequence — "global" attention means every token attends to both views, which
is a single fused flash-attention call on TPU rather than separate
self/cross passes. View identity is carried by a learned per-view embedding;
spatial position by a 2D sin-cos embedding (resolution-agnostic, so any
inference grid works without interpolation).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ufm_tpu.nn.layers import TransformerBlock, scan_transformer_blocks

__all__ = [
    "MultiViewTransformerInput",
    "MultiViewTransformerOutput",
    "MultiViewGlobalAttentionTransformer",
    "INFO_SHARING_CLASSES",
]


@dataclasses.dataclass
class MultiViewTransformerInput:
    """``features``: one (B, Hp, Wp, C) map per view."""

    features: List[jnp.ndarray]


@dataclasses.dataclass
class MultiViewTransformerOutput:
    """``features``: one (B, Hp, Wp, C) map per view."""

    features: List[jnp.ndarray]


def _sincos_pos_embed_2d(h: int, w: int, dim: int) -> np.ndarray:
    """Standard 2D sin-cos positional embedding, (h*w, dim), float32."""
    assert dim % 4 == 0, f"sin-cos pos embed needs dim % 4 == 0, got {dim}"
    quarter = dim // 4
    omega = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter))
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64), indexing="ij")
    out = []
    for grid in (ys.reshape(-1), xs.reshape(-1)):
        ang = np.outer(grid, omega)
        out.extend([np.sin(ang), np.cos(ang)])
    return np.concatenate(out, axis=1).astype(np.float32)


class MultiViewGlobalAttentionTransformer(nn.Module):
    """Joint self-attention transformer over two views' tokens.

    ``intermediate_layer_idx`` selects which block outputs are tapped and
    returned as intermediates (the UFM DPT head consumes exactly two taps;
    reference: uniflowmatch/models/ufm.py:392-408).
    """

    input_embed_dim: int = 1024
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layerscale_init: Optional[float] = None
    num_views: int = 2
    intermediate_layer_idx: Sequence[int] = (5, 8)
    norm_intermediate: bool = True
    use_pos_embed: bool = True
    mlp_act: str = "gelu_exact"
    # Rematerialize block activations in the backward pass (training-time
    # memory knob; no effect on forward-only graphs). ``remat_policy`` names
    # a ``jax.checkpoint_policies`` member (nn/layers.py::resolve_remat_policy)
    remat: bool = False
    remat_policy: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, inp: MultiViewTransformerInput
    ) -> Tuple[MultiViewTransformerOutput, List[MultiViewTransformerOutput]]:
        feats = inp.features
        assert len(feats) == self.num_views, f"expected {self.num_views} views, got {len(feats)}"
        b, hp, wp, c_in = feats[0].shape
        s = hp * wp

        tokens = jnp.stack([f.reshape(b, s, c_in) for f in feats], axis=1)  # (B, V, S, C)
        tokens = tokens.astype(self.dtype)
        if c_in != self.dim:
            tokens = nn.Dense(self.dim, dtype=self.dtype, name="input_proj")(tokens)

        view_embed = self.param("view_embed", nn.initializers.normal(0.02), (self.num_views, self.dim))
        tokens = tokens + view_embed[None, :, None, :].astype(self.dtype)

        if self.use_pos_embed:
            pos = jnp.asarray(_sincos_pos_embed_2d(hp, wp, self.dim))
            tokens = tokens + pos[None, None].astype(self.dtype)

        x = tokens.reshape(b, self.num_views * s, self.dim)

        taps = tuple(t % self.depth for t in self.intermediate_layer_idx)
        norm = nn.LayerNorm(dtype=self.dtype, name="norm")

        def split_views(y: jnp.ndarray) -> MultiViewTransformerOutput:
            y = y.reshape(b, self.num_views, hp, wp, self.dim)
            return MultiViewTransformerOutput(features=[y[:, v] for v in range(self.num_views)])

        # all layers as ONE scanned block (stacked params, single compiled
        # body); only the tapped layers are materialized
        x, tap_outs = scan_transformer_blocks(
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
        intermediates = [
            split_views(norm(tap_outs[j]) if self.norm_intermediate else tap_outs[j])
            for j in range(len(taps))
        ]

        final = split_views(norm(x))
        return final, intermediates


# Registry mirroring the reference lookup `INFO_SHARING_CLASSES[name][1]`
# (uniflowmatch/models/ufm.py:193): value = (description, class).
INFO_SHARING_CLASSES = {
    "global_attention": ("joint self-attention over all views", MultiViewGlobalAttentionTransformer),
    "global_attention_transformer": (
        "joint self-attention over all views",
        MultiViewGlobalAttentionTransformer,
    ),
}
