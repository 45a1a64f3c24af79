"""Material model (Flash Cache pipeline) construction, forward, and training."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_radiance_caching_tpu.data import datasets
from neural_radiance_caching_tpu.engine.configs import Config
from neural_radiance_caching_tpu.models.material_model import MaterialModel
from neural_radiance_caching_tpu.ops import coord
from neural_radiance_caching_tpu.parallel import mesh as mesh_lib
from neural_radiance_caching_tpu.parallel import train as train_lib
from neural_radiance_caching_tpu.utils import pytrees

TINY_GRID = {"hash_map_size": 2048, "max_grid_size": 64, "num_features": 2,
             "bbox_scaling": 2.0}
MLP = {"net_depth": 1, "net_width": 8, "disable_density_normals": True,
       "enable_pred_normals": True, "warp_fn": coord.contract_radius_2}
STRATEGY = ((0, 0, 6), (1, 1, 6), (2, 2, 4))
SLF = {
    "net_depth": 1, "net_width": 8, "skip_layer": 2, "bottleneck_width": 8,
    "use_directional_enc": True, "use_ide": True, "deg_view": 2,
    "net_depth_viewdirs": 1, "net_width_viewdirs": 8, "bottleneck_viewdirs": 8,
    "skip_layer_dir": 2, "use_grid": False, "use_bottleneck": False,
    "use_density_feature": False, "use_shader_bottleneck": True, "use_lights": False,
}


def make_material_model(config, use_light_sampler=True, slf_variate=False):
    cache_params = {
        "sampler_params": {
            "sampling_strategy": STRATEGY,
            "mlp_params_per_level": (MLP, MLP, MLP),
            "grid_params_per_level": (TINY_GRID, TINY_GRID, TINY_GRID),
            "dilation_bias": 0.0, "dilation_multiplier": 0.0, "raydist_fn": None,
        },
        "shader_params": {
            "net_depth": 0, "net_width": 8, "bottleneck_width": 8,
            "use_grid": True, "grid_params": TINY_GRID,
            "warp_fn": coord.contract_radius_2,
            "use_reflections": True, "use_ambient": True, "use_indirect": False,
            "use_active": False, "surface_lf_params": SLF,
            "net_depth_integrated_brdf": 1, "net_width_integrated_brdf": 8,
            "net_depth_brdf": 1, "net_width_brdf": 8,
            "net_depth_irradiance": 1, "net_width_irradiance": 8,
            "rgb_activation": jax.nn.softplus,
        },
        "resample_secondary": True,
        "train_sampling_strategy": STRATEGY,
        "render_sampling_strategy": STRATEGY,
    }
    return MaterialModel(
        config=config,
        cache_model_params=cache_params,
        use_light_sampler=use_light_sampler,
        light_sampler_params={
            "net_depth": 1, "net_width": 8, "bottleneck_width": 8, "num_components": 4,
            "use_density_feature": False, "use_grid": True, "grid_params": TINY_GRID,
            "warp_fn": coord.contract_radius_2,
        },
        shader_params={
            "net_depth": 0, "net_width": 8, "bottleneck_width": 8,
            "use_density_feature": False, "use_grid": True, "grid_params": TINY_GRID,
            "warp_fn": coord.contract_radius_2,
            "num_secondary_samples": 4, "render_num_secondary_samples": 4,
            "num_secondary_samples_diff": 2, "render_num_secondary_samples_diff": 2,
            "cache_train_sampling_strategy": ((0, 0, 4), (2, 2, 4)),
            "cache_render_sampling_strategy": ((0, 0, 4), (2, 2, 4)),
            "net_depth_brdf": 1, "net_width_brdf": 8,
            "use_brdf_correction": False,
        },
        resample=True,
        num_resample=1,
        slf_variate=slf_variate,
    )


@pytest.fixture(scope="module")
def material_setup():
    config = Config(
        near=0.2, far=6.0, secondary_far=2.0, mask_lossmult=False,
        material_loss_radius=2.0, data_loss_type="rawnerf_unbiased",
        use_gradient_debias=True, interlevel_loss_mults=(0.01, 0.01),
        interlevel_loss_blurs=(0.03, 0.003), distortion_loss_mult=0.0,
        predicted_normal_loss_mult=0.0, predicted_normal_reverse_loss_mult=0.0,
        batch_size=64, max_steps=8, lr_init=2e-3, lr_final=1e-3, lr_delay_steps=0,
        dataset_loader="synthetic_spheres", linear_to_srgb=True,
    )
    model = make_material_model(config)
    variables = jax.jit(functools.partial(model.init, train_frac=1.0, train=True))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), pytrees.dummy_rays(4)
    )
    return config, model, variables


@pytest.mark.slow
def test_material_forward_outputs(material_setup):
    config, model, variables = material_setup
    rays = pytrees.dummy_rays(4)
    out = model.apply(variables, jax.random.PRNGKey(2), rays, train_frac=0.5, train=True)
    assert set(out.keys()) >= {"cache_main", "main", "render"}
    assert out["render"]["rgb"].shape == (4, 3)
    assert np.isfinite(out["render"]["rgb"]).all()
    # Material properties are exposed per surface point.
    for k in ("material_albedo", "material_roughness", "material_metalness"):
        assert k in out["main"]["shader"], k
    # Cache buffers mirrored with cache_ prefix.
    assert "cache_rgb" in out["render"]


def test_material_param_structure_for_checkpoint_surgery(material_setup):
    _, _, variables = material_setup
    top = set(variables["params"].keys())
    # These prefixes are the public checkpoint-surgery surface
    # (reference trainer.py:704-739 loads/excludes by these names).
    assert {"Cache", "MaterialShader", "LightSampler"} <= top


@pytest.mark.slow
def test_material_train_steps_decrease_loss(material_setup):
    config, model, variables = material_setup
    dataset = datasets.SyntheticSpheres("train", None, config, num_images=2, resolution=16)
    mesh = mesh_lib.create_mesh()
    state, _ = train_lib.create_optimizer(config, variables)
    state = mesh_lib.replicate(state, mesh)
    train_step = train_lib.create_train_step(model, config, mesh=mesh)
    rng = jax.random.PRNGKey(0)
    losses = []
    for step in range(config.max_steps):
        batch = mesh_lib.shard_batch(dataset.next_train(), mesh)
        state, stats = train_step(rng, state, batch, step / config.max_steps)
        losses.append(float(stats["loss"]))
    assert np.isfinite(losses).all()
    # Both the cache and material data losses must be present.
    assert "data" in stats["losses"] and "cache_data" in stats["losses"]


@pytest.mark.slow
def test_extra_ray_regularizer():
    """extra_ray_loss renders fresh outgoing rays through the full model and
    penalizes material-vs-cache disagreement (train_utils.py:1305-1421)."""
    import dataclasses

    config = Config(
        near=0.2, far=6.0, secondary_far=2.0, mask_lossmult=False,
        material_loss_radius=2.0, data_loss_type="rawnerf_unbiased",
        use_gradient_debias=True, interlevel_loss_mults=(0.01, 0.01),
        interlevel_loss_blurs=(0.03, 0.003), batch_size=16, max_steps=2,
        lr_init=2e-3, lr_final=1e-3, lr_delay_steps=0,
        dataset_loader="synthetic_spheres", linear_to_srgb=True,
        is_material=True, extra_ray_loss_mult=0.1,
    )
    model = make_material_model(config)
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
    assert "extra_ray" in stats["losses"]
    assert np.isfinite(float(stats["loss"]))
