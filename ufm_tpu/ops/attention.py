"""Multi-head attention dispatch.

All transformer stacks in the framework (ViT encoder self-attention and the
two-view info-sharing attention — the two hot loops of the reference,
uniflowmatch/models/ufm.py:291-315, 390-394) route through
:func:`dot_product_attention`. On TPU this lowers to the Pallas
flash-attention kernel in :mod:`ufm_tpu.ops.flash_attention`; elsewhere (CPU
tests, debugging) it uses a plain XLA softmax-attention that is numerically
the reference implementation.

Shapes follow the JAX convention: q/k/v are (batch, seq, heads, head_dim).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["dot_product_attention"]


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


@functools.lru_cache(maxsize=1)
def _default_impl() -> str:
    forced = os.environ.get("UFM_TPU_ATTENTION", "")
    if forced:
        return forced
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    impl: str | None = None,
) -> jnp.ndarray:
    """Softmax attention over (B, S, H, D) tensors; returns (B, Sq, H, D)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    impl = impl or _default_impl()

    if impl == "pallas":
        from ufm_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    if impl == "xla":
        return _xla_attention(q, k, v, scale)
    raise ValueError(f"unknown attention impl: {impl}")
