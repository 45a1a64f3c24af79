"""The four weight-gated losses added for reference parity:

patch (loss_utils.py:204-237), maximum_radiance (train_utils.py:1422-1453),
normalize_weight (train_utils.py:1455-1491), material_correlation
(train_utils.py:2354-2503).
"""

import pytest
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.data import datasets
from neural_radiance_caching_tpu.engine.configs import Config
from neural_radiance_caching_tpu.parallel import extra_losses
from neural_radiance_caching_tpu.parallel import losses as losses_lib
from neural_radiance_caching_tpu.parallel import mesh as mesh_lib
from neural_radiance_caching_tpu.parallel import train as train_lib
from neural_radiance_caching_tpu.utils import pytrees

from test_material_model import make_material_model


# --- patch loss ---------------------------------------------------------------


def _patch_config(**kw):
    return Config(
        patch_size=2, patch_loss_mult=1.0, charb_padding=1e-3,
        bilateral_strength=0.0, patch_variance_weighting=0.0, **kw
    )


def test_patch_loss_flat_depth_is_minimal():
    config = _patch_config()
    rgb = np.zeros((8, 3), np.float32)
    batch = pytrees.Batch(rays=None, rgb=jnp.asarray(rgb))
    flat = {"distance_mean": jnp.ones((8,))}
    bumpy = {"distance_mean": jnp.ones((8,)).at[::2].set(2.0)}
    l_flat = float(losses_lib.patch_loss(batch, flat, config))
    l_bumpy = float(losses_lib.patch_loss(batch, bumpy, config))
    # Constant depth: pairwise Charbonnier bottoms out at the padding.
    assert abs(l_flat - config.charb_padding) < 1e-6
    assert l_bumpy > l_flat + 0.1


def test_patch_loss_bilateral_downweights_rgb_edges():
    # Same depth edge; when the GT RGB has an edge in the same place the
    # bilateral weight should forgive the depth discontinuity.
    depth = jnp.ones((4,)).at[:2].set(2.0)
    rendering = {"distance_mean": depth}
    rgb_edge = np.zeros((4, 3), np.float32)
    rgb_edge[:2] = 1.0
    batch_edge = pytrees.Batch(rays=None, rgb=jnp.asarray(rgb_edge))
    batch_flat = pytrees.Batch(rays=None, rgb=jnp.zeros((4, 3)))
    config = _patch_config()
    config = dataclasses.replace(config, bilateral_strength=10.0)
    l_edge = float(losses_lib.patch_loss(batch_edge, rendering, config))
    l_flat = float(losses_lib.patch_loss(batch_flat, rendering, config))
    assert l_edge < l_flat * 0.6


def test_next_train_emits_contiguous_patches():
    config = Config(
        dataset_loader="synthetic_spheres", batch_size=32, patch_size=2,
        near=0.2, far=6.0,
    )
    dataset = datasets.SyntheticSpheres("train", None, config, num_images=2,
                                        resolution=16)
    batch = dataset.next_train()
    assert batch.rgb.shape[0] == 32
    pix_x = batch.rays.origins  # cast rays; check via cam geometry instead
    # Reconstruct patch structure: each group of 4 rays shares one camera and
    # forms a 2x2 pixel block => origins within a patch are identical
    # (pinhole) and directions differ.
    o = np.asarray(batch.rays.origins).reshape(-1, 4, 3)
    assert np.allclose(o, o[:, :1, :], atol=1e-5)


# --- maximum radiance -----------------------------------------------------------


def test_maximum_radiance_loss_hinge():
    config = Config()
    gt = jnp.ones((4, 3)) * 0.5
    batch = pytrees.Batch(rays=None, rgb=gt)
    below = {"shader": {"rgb": jnp.full((4, 2, 3), 0.25)}}
    above = {"shader": {"rgb": jnp.full((4, 2, 3), 1.0)}}
    l_below = extra_losses.maximum_radiance_loss(
        None, None, None, None, config, batch, below, None)
    l_above = extra_losses.maximum_radiance_loss(
        None, None, None, None, config, batch, above, None)
    assert float(l_below) == 0.0
    assert abs(float(l_above) - 0.25) < 1e-6  # (1.0-0.5)^2


# --- normalize weight -----------------------------------------------------------


def test_normalize_weight_loss_l1_tether():
    config = Config(normalize_weight_loss_weight=2.0)
    geometry = {
        "weights_original": jnp.ones((4, 8)) * 0.5,
        "weights_new": jnp.ones((4, 8)) * 0.25,
    }
    loss = extra_losses.normalize_weight_loss(
        None, None, None, None, config, None, {"geometry": geometry}, None)
    assert abs(float(loss) - 0.5) < 1e-6  # |0.5-0.25| * 2.0
    # Missing producer keys: silent no-op.
    loss0 = extra_losses.normalize_weight_loss(
        None, None, None, None, config, None, {"geometry": {}}, None)
    assert float(loss0) == 0.0


# --- material correlation (integration through the train step) ------------------


@pytest.mark.slow
def test_material_correlation_in_train_step():
    config = Config(
        near=0.2, far=6.0, secondary_far=2.0, mask_lossmult=False,
        material_loss_radius=2.0, data_loss_type="rawnerf_unbiased",
        use_gradient_debias=True, interlevel_loss_mults=(0.01, 0.01),
        interlevel_loss_blurs=(0.03, 0.003), batch_size=16, max_steps=2,
        lr_init=2e-3, lr_final=1e-3, lr_delay_steps=0,
        dataset_loader="synthetic_spheres", linear_to_srgb=True,
        is_material=True,
        material_correlation_weight_albedo=0.1,
        material_correlation_weight_other=0.1,
        irradiance_cache_loss_weight=1.0,
        whitening_loss_weight=0.1,
    )
    # slf_variate=True so the shader emits irradiance_cache.
    model = make_material_model(config, slf_variate=True)
    variables = jax.jit(functools.partial(model.init, train_frac=1.0, train=True))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), pytrees.dummy_rays(4)
    )
    dataset = datasets.SyntheticSpheres("train", None, config, num_images=2,
                                        resolution=8)
    mesh = mesh_lib.create_mesh()
    state, _ = train_lib.create_optimizer(config, variables)
    state = mesh_lib.replicate(state, mesh)
    step = train_lib.create_train_step(model, config, mesh=mesh)
    batch = mesh_lib.shard_batch(dataset.next_train(), mesh)
    state, stats = step(jax.random.PRNGKey(0), state, batch, 0.5)
    assert "material_correlation" in stats["losses"]
    assert np.isfinite(float(stats["losses"]["material_correlation"]))
    assert np.isfinite(float(stats["loss"]))


@pytest.mark.slow
def test_patch_loss_in_train_step():
    """patch_loss_mult>0 + patch_size>1 adds a finite 'patch' loss."""
    config = Config(
        near=0.2, far=6.0, mask_lossmult=False, batch_size=16, max_steps=1,
        lr_init=2e-3, lr_final=1e-3, lr_delay_steps=0,
        dataset_loader="synthetic_spheres", patch_size=2, patch_loss_mult=0.1,
        bilateral_strength=1.0, patch_variance_weighting=1.0,
    )
    from test_train_e2e import make_tiny_model

    model = make_tiny_model(config)
    variables = jax.jit(functools.partial(model.init, train_frac=1.0, train=True))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), pytrees.dummy_rays(4)
    )
    dataset = datasets.SyntheticSpheres("train", None, config, num_images=2,
                                        resolution=8)
    mesh = mesh_lib.create_mesh()
    state, _ = train_lib.create_optimizer(config, variables)
    state = mesh_lib.replicate(state, mesh)
    step = train_lib.create_train_step(model, config, mesh=mesh)
    batch = mesh_lib.shard_batch(dataset.next_train(), mesh)
    state, stats = step(jax.random.PRNGKey(0), state, batch, 0.5)
    patch_keys = [k for k in stats["losses"] if "patch" in k]
    assert patch_keys, stats["losses"].keys()
    for k in patch_keys:
        assert np.isfinite(float(stats["losses"][k]))
