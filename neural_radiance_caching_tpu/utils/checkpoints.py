"""Orbax-backed checkpointing with step directories and partial restore.

Behavioral parity target: the reference's flax.training.checkpoints usage
(engine/trainer.py:710-743, internal/train_utils.py:3991-4088): numbered
step checkpoints under a directory, restore-latest, and prefix-filtered
partial restores for stage warm-starts.
"""

from __future__ import annotations

import os
import re
import threading
from typing import Any, Optional

import jax
import numpy as np

# In-flight async save (at most one; a new save or any restore joins it
# first so readers always see a complete step directory).
_pending_save: Optional[threading.Thread] = None
_pending_lock = threading.Lock()


def wait_for_pending_save():
    """Block until the last async save_checkpoint finished writing."""
    global _pending_save
    with _pending_lock:
        t, _pending_save = _pending_save, None
    if t is not None:
        t.join()


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


def save_checkpoint(checkpoint_dir: str, state: Any, step: int, keep: int = 3,
                    blocking: bool = True):
    """Save the train-state pytree under checkpoint_dir/checkpoint_<step>.

    blocking=False returns as soon as the state is fetched to host numpy
    (the only device fence needed — training can continue immediately) and
    writes the directory in a daemon thread. At most one async save is in
    flight: a newer save or any restore joins the previous one first, so a
    step directory is never read half-written. Call wait_for_pending_save()
    (or save with blocking=True) before process exit.
    """
    wait_for_pending_save()
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = _step_dir(checkpoint_dir, step)
    state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))

    def _write():
        import shutil

        # Orbax refuses to overwrite; re-saving the same step replaces it.
        if os.path.exists(path):
            shutil.rmtree(path)
        _checkpointer().save(path, state)
        all_steps = []
        for name in os.listdir(checkpoint_dir):
            m = re.fullmatch(r"checkpoint_(\d+)", name)
            if m:
                all_steps.append(int(m.group(1)))
        for s in sorted(all_steps)[:-keep]:
            shutil.rmtree(_step_dir(checkpoint_dir, s), ignore_errors=True)

    if blocking:
        _write()
        return
    global _pending_save
    t = threading.Thread(target=_write, name=f"ckpt-save-{step}", daemon=True)
    with _pending_lock:
        _pending_save = t
    t.start()


def restore_checkpoint(checkpoint_dir: str, state: Any) -> Any:
    """Restore the latest checkpoint into `state`'s structure (no-op if none)."""
    wait_for_pending_save()
    step = latest_checkpoint_step(checkpoint_dir)
    if step is None:
        return state
    target = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    restored = _checkpointer().restore(_step_dir(checkpoint_dir, step), item=target)
    return jax.tree_util.tree_map(lambda t, r: r, state, restored)


def load_params(checkpoint_dir: str) -> Optional[Any]:
    """Load a checkpoint's raw pytree (for prefix surgery across stages)."""
    wait_for_pending_save()
    step = latest_checkpoint_step(checkpoint_dir)
    if step is None:
        return None
    return _checkpointer().restore(_step_dir(checkpoint_dir, step))
