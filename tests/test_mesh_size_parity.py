"""SPMD-correctness regression: one train step on a 1-device mesh and on the
full 8-device CPU mesh must produce the same loss and the same parameter
update for the same global batch (data parallelism only redistributes rays;
the psum'd mean gradient is mesh-size invariant up to reduction order).

This is the multi-chip analogue of the reference's `disable_pmap_and_jit`
eager escape hatch (engine/trainer.py:595-596): it pins that sharding the
batch axis never changes the math.
"""

import jax
import numpy as np
import pytest

from neural_radiance_caching_tpu.engine.configs import Config
from neural_radiance_caching_tpu.data import datasets
from neural_radiance_caching_tpu.parallel import mesh as mesh_lib
from neural_radiance_caching_tpu.parallel import train as train_lib
from neural_radiance_caching_tpu.utils import pytrees

from test_train_e2e import make_tiny_model


def _one_step(mesh, model, config, variables, batch, rng):
    # The train step donates its state buffers; copy so both mesh runs can
    # start from the same initialization.
    variables = jax.tree_util.tree_map(lambda x: np.array(x), variables)
    state, _ = train_lib.create_optimizer(config, variables)
    state = mesh_lib.replicate(state, mesh)
    sharded = mesh_lib.shard_batch(batch, mesh)
    train_step = train_lib.create_train_step(model, config, mesh=mesh)
    state, stats = train_step(rng, state, sharded, 0.5)
    return float(stats["loss"]), jax.device_get(state.params)


@pytest.mark.parametrize("n_small", [1, 2])
@pytest.mark.slow
def test_step_invariant_to_mesh_size(n_small):
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide the 8-device CPU mesh"

    config = Config(
        dataset_loader="synthetic_spheres",
        batch_size=64,
        near=2.0,
        far=6.0,
        max_steps=4,
        lr_init=5e-3,
        lr_final=2e-3,
        lr_delay_steps=0,
        data_loss_type="charb",
        distortion_loss_mult=0.01,
        predicted_normal_loss_mult=0.05,
        linear_to_srgb=True,
        mask_lossmult=False,
    )
    dataset = datasets.SyntheticSpheres(
        "train", None, config, num_images=2, resolution=16)
    batch = dataset.next_train()

    model = make_tiny_model(config, n0=4, n1=4, n2=2)
    variables = model.init(
        jax.random.PRNGKey(0),
        jax.random.PRNGKey(1),
        pytrees.dummy_rays(8),
        train_frac=1.0,
        train=False,
    )
    rng = jax.random.PRNGKey(7)

    loss_small, params_small = _one_step(
        mesh_lib.create_mesh(devices[:n_small]), model, config, variables,
        batch, rng)
    loss_full, params_full = _one_step(
        mesh_lib.create_mesh(devices[:8]), model, config, variables,
        batch, rng)

    assert np.isfinite(loss_small) and np.isfinite(loss_full)
    np.testing.assert_allclose(loss_small, loss_full, rtol=2e-5)

    flat_small = jax.tree_util.tree_leaves(params_small)
    flat_full = jax.tree_util.tree_leaves(params_full)
    assert len(flat_small) == len(flat_full)
    for a, b in zip(flat_small, flat_full):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6)
