"""Shared transformer building blocks (flax.linen).

These are the primitives behind both transformer stacks of the framework: the
ViT feature encoder and the two-view info-sharing transformer (the encoder /
info-sharing composition the reference builds from UniCeption modules,
uniflowmatch/models/ufm.py:187-193). Compute dtype is configurable (bf16 on
TPU for the backbone, fp32 for prediction heads); parameters are always fp32.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from ufm_tpu.ops.attention import dot_product_attention

__all__ = [
    "Mlp",
    "Attention",
    "LayerScale",
    "TransformerBlock",
    "exact_gelu",
    "scan_transformer_blocks",
]

# torch nn.GELU defaults to the exact (erf) form; flax's default is the tanh
# approximation — use exact for checkpoint-numerics parity. The production
# evaluator is ops/gelu.py's fast polynomial erfc, which is bitwise-equal to
# jax.nn.gelu(approximate=False) for every finite bf16 input (exhaustively
# verified per backend, tests/test_gelu.py) and ~3x cheaper on the VPU; it
# falls back to jax.nn.gelu for non-bf16 dtypes.
from ufm_tpu.ops.gelu import fast_exact_gelu as exact_gelu  # noqa: E402


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> act -> fc2."""

    hidden_dim: int
    out_dim: Optional[int] = None
    act: Callable = exact_gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with fused qkv projection.

    Routes the softmax-attention core through
    :func:`ufm_tpu.ops.attention.dot_product_attention` (Pallas flash kernel
    on TPU).
    """

    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, s, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = dot_product_attention(q, k, v)
        # Named for remat: the "+attn_out" composite policy saves this
        # (the most expensive recompute in the block body — the flash
        # forward would otherwise run twice per layer under remat).
        out = jax.ad_checkpoint.checkpoint_name(out, "attn_out")
        out = out.reshape(b, s, c)
        return nn.Dense(c, use_bias=self.proj_bias, dtype=self.dtype, name="proj")(out)


class LayerScale(nn.Module):
    """Per-channel learnable residual scaling (DINOv2-style)."""

    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init_value), (x.shape[-1],))
        return x * gamma.astype(x.dtype)


_ACTIVATIONS = {
    "gelu_exact": exact_gelu,  # torch default; weight-parity choice
    "gelu_tanh": nn.gelu,  # tanh approximation; cheaper on the VPU
}


class TransformerBlock(nn.Module):
    """Pre-norm transformer block with optional LayerScale."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layerscale_init: Optional[float] = None
    mlp_act: str = "gelu_exact"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = Attention(self.num_heads, qkv_bias=self.qkv_bias, dtype=self.dtype, name="attn")(h)
        if self.layerscale_init is not None:
            h = LayerScale(self.layerscale_init, name="ls1")(h)
        x = x + h

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = Mlp(int(c * self.mlp_ratio), act=_ACTIVATIONS[self.mlp_act], dtype=self.dtype, name="mlp")(h)
        if self.layerscale_init is not None:
            h = LayerScale(self.layerscale_init, name="ls2")(h)
        return x + h


def resolve_remat_policy(name: Optional[str]):
    """Map a policy name to ``jax.checkpoint_policies.<name>``.

    ``None``/"" means full remat (save only layer inputs). Any attribute of
    ``jax.checkpoint_policies`` is accepted, e.g.
    ``dots_with_no_batch_dims_saveable`` (save projection/MLP matmul outputs,
    recompute the cheap elementwise work — less backward recompute where HBM
    allows it; the (B,H,S,S) attention score dots have batch dims and are
    never saved).
    """
    if not name:
        return None
    import jax

    # Explicit composite: weight-matmul outputs PLUS the named flash-
    # attention core output (Attention.__call__ tags it "attn_out"), so the
    # backward recomputes only cheap elementwise work — the flash forward
    # does not run a second time per layer. Costs one (2B, S, D) activation
    # per layer (~10 MB bf16 at flagship training shapes, ×36 layers).
    if name == "dots_with_no_batch_dims_and_attn_out_saveable":
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names("attn_out"),
        )

    # Only actual (prim, *args, **kwargs) predicate policies are allowed.
    # jax.checkpoint_policies also exposes policy *factories*
    # (save_only_these_names, save_from_both_policies, ...) which, passed
    # directly as policy=, get invoked as predicates and silently change
    # what is saved instead of failing loudly (ADVICE r3).
    allowed = (
        "everything_saveable",
        "nothing_saveable",
        "dots_saveable",
        "checkpoint_dots",
        "dots_with_no_batch_dims_saveable",
        "checkpoint_dots_with_no_batch_dims",
    )
    if name not in allowed:
        raise ValueError(
            f"unknown remat policy {name!r}; valid: "
            f"{sorted(allowed + ('dots_with_no_batch_dims_and_attn_out_saveable',))}"
        )
    return getattr(jax.checkpoint_policies, name)


def scan_transformer_blocks(
    block: TransformerBlock,
    x,
    depth: int,
    taps: Optional[tuple] = None,
    remat: bool = False,
    remat_policy: Optional[str] = None,
):
    """Run ``depth`` transformer layers as ONE ``lax.scan`` over stacked
    parameters.

    Returns ``(final, outs)``: with ``taps=None``, ``outs`` is every layer's
    output stacked on axis 0 (shape ``(depth, ...)``); with ``taps`` a tuple
    of distinct layer indices, ``outs[j]`` is the output of layer ``taps[j]``
    (shape ``(len(taps), ...)``) and non-tap layers are never materialized —
    XLA cannot always DCE unused scan ys, and the full ``(depth, B, N, D)``
    stack costs HBM footprint proportional to depth on the flagship encoder.
    The tap buffer is carried through the scan; each layer issues exactly one
    buffer write (into a scratch slot for non-tap layers), so bandwidth
    matches the stacked-ys formulation while footprint drops to
    ``len(taps)+1`` layers.

    This is the idiomatic JAX deep-stack layout: the compiled program contains
    a single block body instead of ``depth`` inlined copies, which shrinks the
    flagship HLO ~20x and with it compile time (the unrolled flagship forward
    exceeded this environment's remote-compile limits). Parameters live as
    ``{block.name}/<sub>/...`` with a leading layer axis; the checkpoint
    converter stacks/unstacks per-layer torch weights to match
    (checkpoint/convert.py) — identical for both tap modes.

    With ``remat=True`` the block body is wrapped in ``nn.remat`` (save only
    layer inputs; recompute activations in the backward pass). The flagship's
    24-layer encoder otherwise stacks several (depth, 2B, S, D) residual
    buffers for backward and a single-chip train step OOMs HBM. Forward-only
    graphs are unaffected (no residuals are saved without a grad).
    """
    import jax
    import jax.numpy as jnp

    # Remat ONLY the block call, not the whole scan body: checkpointing the
    # body would make scan save the tap-buffer carry as a per-step residual
    # (depth × (n_taps+1) × activation), defeating the point. prevent_cse is
    # safe under scan and lets XLA fuse the rematerialized forward.
    def call_block(blk, h):
        return blk(h)

    if remat:
        call_block = nn.remat(
            call_block, prevent_cse=False, policy=resolve_remat_policy(remat_policy)
        )

    if taps is None:

        def body(blk, carry, _):
            y = call_block(blk, carry)
            return y, y

        scanned = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=depth,
        )
        return scanned(block, x, None)

    taps = tuple(int(t) for t in taps)
    # Duplicate tap indices are legal (a config may spell the same layer both
    # as 23 and -1, which callers normalize to the same index) — buffer the
    # UNIQUE layers, then gather the requested order, repeats included.
    uniq = tuple(dict.fromkeys(taps))
    n_uniq = len(uniq)

    def body(blk, carry, i):
        h, buf = carry
        y = call_block(blk, h)
        # slot j when layer i == uniq[j], else the scratch slot n_uniq —
        # a scalar select chain plus ONE dynamic buffer write per layer
        slot = jnp.int32(n_uniq)
        for j, t in enumerate(uniq):
            slot = jnp.where(i == t, jnp.int32(j), slot)
        buf = jax.lax.dynamic_update_index_in_dim(buf, y, slot, axis=0)
        return (y, buf), None

    scanned = nn.scan(
        body,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=depth,
    )
    buf0 = jnp.zeros((n_uniq + 1,) + x.shape, x.dtype)
    (final, buf), _ = scanned(block, (x, buf0), jnp.arange(depth))
    if uniq == taps:
        return final, buf[:n_uniq]
    return final, buf[jnp.asarray([uniq.index(t) for t in taps])]
