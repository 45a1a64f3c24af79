"""Unit tests for utils/checkpoints.py: step dirs, keep-GC, async save
ordering (a restore after a non-blocking save must see the full write)."""

import pytest
import numpy as np
import jax.numpy as jnp

from neural_radiance_caching_tpu.utils import checkpoints as ckpt


def _state(val):
    return {"params": {"w": jnp.full((4, 4), float(val))},
            "step": jnp.asarray(val)}


@pytest.mark.slow
def test_save_restore_roundtrip(tmp_path):
    d = str(tmp_path)
    ckpt.save_checkpoint(d, _state(1.0), step=1)
    assert ckpt.latest_checkpoint_step(d) == 1
    restored = ckpt.restore_checkpoint(d, _state(0.0))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 1.0)


def test_keep_gc_removes_old_steps(tmp_path):
    d = str(tmp_path)
    for s in (1, 2, 3, 4):
        ckpt.save_checkpoint(d, _state(s), step=s, keep=2)
    assert ckpt.latest_checkpoint_step(d) == 4
    steps = sorted(int(p.name.split("_")[1]) for p in tmp_path.iterdir())
    assert steps == [3, 4]


def test_async_save_then_restore_sees_full_write(tmp_path):
    d = str(tmp_path)
    for s in (1, 2):
        ckpt.save_checkpoint(d, _state(s), step=s, blocking=False)
    # restore joins the in-flight write before listing step dirs.
    restored = ckpt.restore_checkpoint(d, _state(0.0))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 2.0)
    np.testing.assert_allclose(np.asarray(restored["step"]), 2)
    ckpt.wait_for_pending_save()


def test_async_resave_same_step(tmp_path):
    d = str(tmp_path)
    ckpt.save_checkpoint(d, _state(1.0), step=5, blocking=False)
    ckpt.save_checkpoint(d, _state(2.0), step=5, blocking=False)
    restored = ckpt.restore_checkpoint(d, _state(0.0))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 2.0)
