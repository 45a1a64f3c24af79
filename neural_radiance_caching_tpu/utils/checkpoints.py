"""Orbax-backed checkpointing with step directories and partial restore.

Behavioral parity target: the reference's flax.training.checkpoints usage
(engine/trainer.py:710-743, internal/train_utils.py:3991-4088): numbered
step checkpoints under a directory, restore-latest, and prefix-filtered
partial restores for stage warm-starts.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _step_dir(checkpoint_dir: str, step: int) -> str:
    return os.path.join(checkpoint_dir, f"checkpoint_{step}")


def latest_checkpoint_step(checkpoint_dir: str) -> Optional[int]:
    if not checkpoint_dir or not os.path.isdir(checkpoint_dir):
        return None
    steps = []
    for name in os.listdir(checkpoint_dir):
        m = re.fullmatch(r"checkpoint_(\d+)", name)
        if m and os.path.isdir(os.path.join(checkpoint_dir, name)):
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def save_checkpoint(checkpoint_dir: str, state: Any, step: int, keep: int = 3):
    """Save the train-state pytree under checkpoint_dir/checkpoint_<step>."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = _step_dir(checkpoint_dir, step)
    # Orbax refuses to overwrite; re-saving the same step replaces it.
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    _checkpointer().save(path, state)

    existing = sorted(
        s for s in (latest_checkpoint_step(checkpoint_dir),) if s is not None
    )
    all_steps = []
    for name in os.listdir(checkpoint_dir):
        m = re.fullmatch(r"checkpoint_(\d+)", name)
        if m:
            all_steps.append(int(m.group(1)))
    for s in sorted(all_steps)[:-keep]:
        import shutil

        shutil.rmtree(_step_dir(checkpoint_dir, s), ignore_errors=True)
    del existing


def restore_checkpoint(checkpoint_dir: str, state: Any) -> Any:
    """Restore the latest checkpoint into `state`'s structure (no-op if none)."""
    step = latest_checkpoint_step(checkpoint_dir)
    if step is None:
        return state
    target = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    restored = _checkpointer().restore(_step_dir(checkpoint_dir, step), item=target)
    return jax.tree_util.tree_map(lambda t, r: r, state, restored)


def load_params(checkpoint_dir: str) -> Optional[Any]:
    """Load a checkpoint's raw pytree (for prefix surgery across stages)."""
    step = latest_checkpoint_step(checkpoint_dir)
    if step is None:
        return None
    return _checkpointer().restore(_step_dir(checkpoint_dir, step))
