"""Checkpoint/resume for training state (orbax-backed).

The reference delegated model lifecycle entirely to Triton's repository
(SURVEY.md §5 — no checkpoint/resume of its own).  Owning training requires
owning persistence: this wraps orbax for sharded TrainState save/restore —
parameters, batch stats, optimizer state and step survive process restarts
and re-load with their mesh shardings re-applied.  Inference-only weights use
the lighter npz format in models/registry.py.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .train import TrainState

#: One shared checkpointer: StandardCheckpointer is an AsyncCheckpointer
#: with its own worker thread — constructing one per save/restore leaked a
#: thread per checkpoint on long training runs (round-5 review).
_CHECKPOINTER: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def save_train_state(directory: str, state: TrainState, step: Optional[int] = None) -> str:
    """Save a TrainState under directory/<step>; returns the path."""
    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(directory), str(step))
    ckpt = _checkpointer()
    ckpt.save(path, jax.device_get(state._asdict()), force=True)
    ckpt.wait_until_finished()
    return path


def restore_train_state(
    directory: str,
    template: TrainState,
    step: Optional[int] = None,
) -> TrainState:
    """Restore a TrainState saved by save_train_state.

    `template` supplies the pytree structure/dtypes (e.g. a freshly
    initialized state); shardings are re-applied from the template's arrays.
    """
    directory = os.path.abspath(directory)
    if step is None:
        steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        step = max(steps)
    path = os.path.join(directory, str(step))
    ckpt = _checkpointer()
    target = jax.device_get(template._asdict())
    restored = ckpt.restore(path, target)
    state = TrainState(**restored)

    # Re-apply the template's shardings (restore yields host arrays).
    def place(tmpl, val):
        if hasattr(tmpl, "sharding"):
            return jax.device_put(val, tmpl.sharding)
        return val

    return jax.tree.map(place, template, state)


def latest_step(directory: str) -> Optional[int]:
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
    return max(steps) if steps else None
