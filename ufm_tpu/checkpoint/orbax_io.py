"""Training checkpoint save/resume via Orbax.

The reference is load-only (SURVEY §5: "Checkpoint / resume: load-only...
No saving"). The TPU framework adds full train-state persistence: params +
optimizer state + step, saved asynchronously from sharded device arrays and
restorable onto any mesh (Orbax re-shards on restore).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

__all__ = ["save_train_state", "restore_train_state", "latest_step"]


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_train_state(
    directory: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    extra: Optional[Dict[str, Any]] = None,
    max_to_keep: int = 3,
    wait: bool = True,
) -> None:
    """Save {params, opt_state, extra} at ``step`` under ``directory``."""
    import orbax.checkpoint as ocp

    mngr = _manager(os.path.abspath(directory), max_to_keep)
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    if extra:
        state["extra"] = extra
    mngr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mngr.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    mngr = _manager(directory)
    return mngr.latest_step()


def restore_train_state(
    directory: str,
    step: Optional[int] = None,
    template: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Restore a train state; with ``template`` (matching abstract/real
    arrays) the restore re-shards onto the template's shardings."""
    import orbax.checkpoint as ocp

    mngr = _manager(os.path.abspath(directory))
    step = step if step is not None else mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    if template is not None:
        return mngr.restore(step, args=ocp.args.StandardRestore(template))
    return mngr.restore(step)
