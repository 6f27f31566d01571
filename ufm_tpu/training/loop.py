"""Training loop orchestration: data → sharded steps → checkpoints.

The reference releases no trainer; this is the TPU framework's equivalent of
the training loop its surviving APIs imply (per-group LRs via parameter
groups, covariance/covisibility/refinement losses). Single-chip and
mesh-sharded paths share the same step; checkpoints (params + optimizer
state + step) go through Orbax and training resumes from the latest one.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from ufm_tpu.training.trainer import make_optimizer, make_sharded_train_step, make_train_step

__all__ = ["fit"]


def fit(
    net,
    params: Dict[str, Any],
    batches: Iterable[Dict[str, np.ndarray]],
    num_steps: int,
    learning_rate: float = 1e-4,
    mesh=None,
    loss_weights: Optional[Dict[str, float]] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1000,
    log_every: int = 50,
    log_fn: Callable[[str], None] = print,
    warmup_steps: int = 100,
    on_metrics: Optional[Callable[[int, Dict[str, float]], None]] = None,
) -> Dict[str, Any]:
    """Train ``net`` (a UFMNet) for ``num_steps`` over ``batches``.

    Returns {"params": ..., "opt_state": ..., "step": ..., "metrics": last}.
    With ``mesh`` given, parameters/optimizer state are sharded and the batch
    is placed on the data axis. With ``checkpoint_dir``, resumes from the
    latest saved step. ``on_metrics(step, metrics)`` is called at every
    ``log_every`` boundary with the step's float metrics (for convergence
    records / external loggers); it forces a device sync, like logging does.
    """
    optimizer = make_optimizer(
        params, learning_rate=learning_rate, warmup_steps=warmup_steps, total_steps=num_steps
    )

    if mesh is not None:
        step_fn, params, opt_state, place_batch = make_sharded_train_step(
            net.apply, optimizer, mesh, params, loss_weights
        )
    else:
        # Donate param/opt-state buffers (matches the sharded path): without
        # donation the updated copies double the fp32 train state in HBM and
        # the flagship OOMs a single chip. Copy first so donation of the
        # first step cannot invalidate the caller's arrays.
        params = jax.tree.map(lambda x: jax.numpy.array(x, copy=True), params)
        step_fn = jax.jit(
            make_train_step(net.apply, optimizer, loss_weights), donate_argnums=(0, 1)
        )
        opt_state = optimizer.init(params)
        place_batch = lambda b: {k: jax.numpy.asarray(v) for k, v in b.items()}

    start_step = 0
    if checkpoint_dir:
        from ufm_tpu.checkpoint.orbax_io import latest_step, restore_train_state

        last = latest_step(checkpoint_dir)
        if last is not None:
            state = restore_train_state(
                checkpoint_dir, last, template={"params": params, "opt_state": opt_state}
            )
            params, opt_state = state["params"], state["opt_state"]
            start_step = last
            log_fn(f"resumed from step {last}")

    metrics: Dict[str, Any] = {}
    it = iter(batches)
    t0 = time.time()
    step = start_step
    ctx = mesh if mesh is not None else _nullcontext()
    with ctx:
        for step in range(start_step, num_steps):
            try:
                batch = next(it)
            except StopIteration:
                log_fn(f"data exhausted at step {step}")
                break
            params, opt_state, metrics = step_fn(params, opt_state, place_batch(batch))

            if log_every and (step + 1) % log_every == 0:
                vals = {k: float(v) for k, v in metrics.items()}
                rate = (step + 1 - start_step) / (time.time() - t0)
                log_fn(f"step {step + 1}/{num_steps} {vals} ({rate:.2f} steps/s)")
                if on_metrics is not None:
                    on_metrics(step + 1, vals)

            if checkpoint_dir and (step + 1) % checkpoint_every == 0:
                from ufm_tpu.checkpoint.orbax_io import save_train_state

                save_train_state(checkpoint_dir, step + 1, params, opt_state)

    if checkpoint_dir:
        from ufm_tpu.checkpoint.orbax_io import save_train_state

        save_train_state(checkpoint_dir, step + 1, params, opt_state)

    return {"params": params, "opt_state": opt_state, "step": step + 1, "metrics": metrics}


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
