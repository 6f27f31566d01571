"""Sharded training step for the UFM family.

The reference ships no trainer, but exposes training-era APIs
(``get_parameter_groups`` for per-group LRs, ufm.py:455-471). This module
provides the TPU-native training loop core: an optax optimizer with
per-submodule learning-rate groups, and a jitted train step that runs over a
("data", "fsdp", "model") mesh with XLA-SPMD-inserted collectives
(see ufm_tpu/parallel/sharding.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ufm_tpu.parallel.sharding import batch_sharding, shard_params
from ufm_tpu.training.losses import ufm_total_loss

__all__ = ["make_optimizer", "make_train_step", "make_sharded_train_step", "synthetic_batch"]

_GROUP_OF_TOP_KEY = {
    "encoder": "encoder",
    "info_sharing": "info_sharing",
    "head1": "output_head",
    "uncertainty_head": "uncertainty_head",
    "classification_head": "classification_head",
    "unet_feature": "unet_feature",
    "conv1": "unet_feature",
    "conv2": "unet_feature",
    "classification_bias": "classification_head",
}


def make_optimizer(
    params: Dict[str, Any],
    learning_rate: float = 1e-4,
    group_lr_scale: Optional[Dict[str, float]] = None,
    weight_decay: float = 0.05,
    warmup_steps: int = 100,
    total_steps: int = 10000,
) -> optax.GradientTransformation:
    """AdamW with cosine schedule and per-group LR scaling keyed by the
    reference's parameter groups (encoder / info_sharing / output_head / ...)."""
    scales = {"encoder": 0.1, "info_sharing": 1.0, "output_head": 1.0,
              "uncertainty_head": 1.0, "classification_head": 1.0, "unet_feature": 1.0}
    if group_lr_scale:
        scales.update(group_lr_scale)

    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
    )

    def label_tree(p):
        return {
            k: jax.tree.map(lambda _: _GROUP_OF_TOP_KEY.get(k, "output_head"), v)
            for k, v in p.items()
        }

    # Per-group LR = schedule * scale, expressed as the group's own adamw
    # schedule (torch per-group-lr semantics: the decoupled weight decay steps
    # with the group's lr). A trailing optax.scale would instead rescale the
    # already-combined update — subtly different, so avoided.
    transforms = {
        g: optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(lambda n, _s=s: schedule(n) * _s, weight_decay=weight_decay),
        )
        for g, s in scales.items()
    }
    return optax.multi_transform(transforms, label_tree(params))


def make_train_step(
    apply_fn: Callable[..., Dict[str, jnp.ndarray]],
    optimizer: optax.GradientTransformation,
    loss_weights: Optional[Dict[str, float]] = None,
    spmd: bool = False,
):
    """Plain (unsharded) train step: (params, opt_state, batch) -> updated.
    ``spmd=True`` (mesh-sharded callers) routes attention through its
    SPMD-partitioned wrapper at trace time."""

    def step(params, opt_state, batch):
        def loss_fn(p):
            from ufm_tpu.ops.flash_attention import spmd_attention

            with spmd_attention(spmd):
                out = apply_fn({"params": p}, batch["img1"], batch["img2"])
            return ufm_total_loss(out, batch, loss_weights)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def make_sharded_train_step(
    apply_fn: Callable[..., Dict[str, jnp.ndarray]],
    optimizer: optax.GradientTransformation,
    mesh,
    params: Dict[str, Any],
    loss_weights: Optional[Dict[str, float]] = None,
):
    """Mesh-sharded train step.

    Returns (jitted_step, placed_params, placed_opt_state, place_batch).
    Params/optimizer state live sharded on the mesh (fsdp/model axes); the
    batch shards on the data axis; XLA SPMD inserts all collectives.
    """
    # Decouple from the caller's arrays before placing: the jitted step
    # donates its param/opt-state buffers, and on same-device placements
    # device_put can alias the input — donation would silently invalidate the
    # caller's copy.
    import numpy as np

    params = jax.tree.map(lambda x: np.array(x), params)
    param_shardings, placed_params = shard_params(params, mesh)
    opt_state = optimizer.init(placed_params)

    step = make_train_step(apply_fn, optimizer, loss_weights, spmd=True)
    jitted = jax.jit(step, donate_argnums=(0, 1))

    def place_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        return {
            k: jax.device_put(v, batch_sharding(mesh, jnp.ndim(v)))
            for k, v in batch.items()
        }

    return jitted, placed_params, opt_state, place_batch


def synthetic_batch(batch_size: int, height: int, width: int, seed: int = 0) -> Dict[str, jnp.ndarray]:
    """Random-but-consistent batch for smoke tests / dryruns."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "img1": jax.random.normal(k1, (batch_size, height, width, 3), dtype=jnp.float32),
        "img2": jax.random.normal(k2, (batch_size, height, width, 3), dtype=jnp.float32),
        "gt_flow": jax.random.normal(k3, (batch_size, height, width, 2), dtype=jnp.float32) * 4.0,
        "gt_covisibility": (jax.random.uniform(k4, (batch_size, height, width)) > 0.3).astype(jnp.float32),
    }
