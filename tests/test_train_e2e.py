"""End-to-end: train the cache model on a procedural scene, loss must drop.

Runs on the 8-virtual-device CPU mesh from conftest — this also exercises the
sharded train step (batch sharded over the data axis, params replicated).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_radiance_caching_tpu.data import datasets
from neural_radiance_caching_tpu.engine.configs import Config
from neural_radiance_caching_tpu.models.nerf_model import NeRFModel
from neural_radiance_caching_tpu.ops import coord
from neural_radiance_caching_tpu.parallel import mesh as mesh_lib
from neural_radiance_caching_tpu.parallel import train as train_lib

TINY_GRID = {"hash_map_size": 2048, "max_grid_size": 64, "num_features": 2,
             "bbox_scaling": 2.0}

SLF_PARAMS = {
    "net_depth": 1, "net_width": 16, "skip_layer": 2, "bottleneck_width": 16,
    "use_directional_enc": True, "use_ide": True, "deg_view": 2,
    "net_depth_viewdirs": 2, "net_width_viewdirs": 16, "bottleneck_viewdirs": 16,
    "skip_layer_dir": 2, "use_grid": False, "use_bottleneck": False,
    "use_density_feature": False, "use_shader_bottleneck": True, "use_lights": False,
}


def make_tiny_model(config, n0=8, n1=8, n2=4):
    mlp = {
        "net_depth": 1, "net_width": 16, "disable_density_normals": True,
        "enable_pred_normals": True, "warp_fn": coord.contract_radius_2,
        "density_activation": jax.nn.softplus,
    }
    strategy = ((0, 0, n0), (1, 1, n1), (2, 2, n2))
    return NeRFModel(
        config=config,
        sampler_params={
            "sampling_strategy": strategy,
            "mlp_params_per_level": (mlp, mlp, mlp),
            "grid_params_per_level": (TINY_GRID, TINY_GRID, TINY_GRID),
            "dilation_bias": 0.0, "dilation_multiplier": 0.0,
            "anneal_clip": 0.4,
            "raydist_fn": None,
        },
        shader_params={
            "net_depth": 0, "net_width": 16, "bottleneck_width": 16,
            "use_grid": True, "grid_params": TINY_GRID,
            "warp_fn": coord.contract_radius_2,
            "use_reflections": True, "enable_pred_roughness": True,
            "use_ambient": True, "use_indirect": False, "use_active": False,
            "surface_lf_params": SLF_PARAMS,
            "net_depth_integrated_brdf": 1, "net_width_integrated_brdf": 8,
            "net_depth_brdf": 1, "net_width_brdf": 8,
            "net_depth_irradiance": 1, "net_width_irradiance": 8,
            "rgb_activation": jax.nn.softplus,
        },
        train_sampling_strategy=strategy,
        render_sampling_strategy=strategy,
    )


@pytest.fixture(scope="module")
def trained():
    config = Config(
        dataset_loader="synthetic_spheres",
        batch_size=256,
        near=2.0,
        far=6.0,
        max_steps=60,
        lr_init=5e-3,
        lr_final=2e-3,
        lr_delay_steps=0,
        data_loss_type="charb",
        interlevel_loss_mults=(0.01, 0.01),
        interlevel_loss_blurs=(0.03, 0.003),
        distortion_loss_mult=0.01,
        orientation_loss_mult=0.0,
        predicted_normal_loss_mult=0.05,
        predicted_normal_reverse_loss_mult=0.05,
        opaque_loss_weight=0.0,
        empty_loss_weight=0.0,
        linear_to_srgb=True,
        mask_lossmult=False,
    )
    dataset = datasets.SyntheticSpheres("train", None, config, num_images=6, resolution=32)

    model = make_tiny_model(config)
    mesh = mesh_lib.create_mesh()
    from neural_radiance_caching_tpu.utils import pytrees

    variables = model.init(
        jax.random.PRNGKey(0),
        jax.random.PRNGKey(1),
        pytrees.dummy_rays(8),
        train_frac=1.0,
        train=False,
    )
    state, _ = train_lib.create_optimizer(config, variables)
    state = mesh_lib.replicate(state, mesh)
    train_step = train_lib.create_train_step(model, config, mesh=mesh)

    rng = jax.random.PRNGKey(42)
    losses = []
    for step in range(config.max_steps):
        batch = mesh_lib.shard_batch(dataset.next_train(), mesh)
        state, stats = train_step(rng, state, batch, step / config.max_steps)
        losses.append(float(stats["loss"]))
    return model, state, config, dataset, losses, mesh


def test_loss_decreases(trained):
    _, _, _, _, losses, _ = trained
    assert np.isfinite(losses).all()
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < first * 0.7, f"loss did not decrease: {first} -> {last}"


def test_eval_render_improves_over_init(trained):
    model, state, config, dataset, _, mesh = trained
    render_fn = train_lib.create_render_fn(model, mesh=mesh)
    batch = dataset.generate_ray_batch(0)
    batch = mesh_lib.shard_batch(batch, mesh)
    rendering = render_fn(state.params, jax.random.PRNGKey(0), 1.0, batch.rays)
    rgb = np.array(rendering["rgb"]).reshape(32, 32, 3)
    gt = dataset.images[0]
    mse = float(np.mean((rgb - gt) ** 2))
    psnr = -10 * np.log10(mse)
    # Untrained PSNR on this scene is ~5-9 dB; a brief training run must beat it.
    assert psnr > 10.0, f"PSNR too low: {psnr}"


def test_state_is_replicated_batch_is_sharded(trained):
    _, state, _, dataset, _, mesh = trained
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated
    batch = mesh_lib.shard_batch(dataset.next_train(), mesh)
    assert not batch.rgb.sharding.is_fully_replicated
    assert batch.rgb.sharding.spec == jax.sharding.PartitionSpec("data")


@pytest.mark.slow
def test_simplex_interpolation_learns():
    """Tetrahedral (4-tap) grid interpolation — the TPU-first flagship default
    — must train as well as trilinear on the same budget."""
    config = Config(
        dataset_loader="synthetic_spheres", batch_size=256, near=2.0, far=6.0,
        max_steps=40, lr_init=5e-3, lr_final=2e-3, lr_delay_steps=0,
        data_loss_type="charb", interlevel_loss_mults=(0.01, 0.01),
        interlevel_loss_blurs=(0.03, 0.003), distortion_loss_mult=0.01,
        predicted_normal_loss_mult=0.05, predicted_normal_reverse_loss_mult=0.05,
        opaque_loss_weight=0.0, empty_loss_weight=0.0, linear_to_srgb=True,
        mask_lossmult=False,
    )
    dataset = datasets.SyntheticSpheres("train", None, config, num_images=4,
                                        resolution=24)
    global TINY_GRID
    saved = dict(TINY_GRID)
    TINY_GRID.update(interpolation="simplex")
    try:
        model = make_tiny_model(config)
        from neural_radiance_caching_tpu.utils import pytrees

        mesh = mesh_lib.create_mesh()
        variables = model.init(
            jax.random.PRNGKey(0), jax.random.PRNGKey(1), pytrees.dummy_rays(8),
            train_frac=1.0, train=False,
        )
        state, _ = train_lib.create_optimizer(config, variables)
        state = mesh_lib.replicate(state, mesh)
        train_step = train_lib.create_train_step(model, config, mesh=mesh)
        rng = jax.random.PRNGKey(42)
        losses = []
        for step in range(config.max_steps):
            batch = mesh_lib.shard_batch(dataset.next_train(), mesh)
            state, stats = train_step(rng, state, batch, step / config.max_steps)
            losses.append(float(stats["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-8:]) < np.mean(losses[:8]) * 0.75, losses
    finally:
        TINY_GRID.clear()
        TINY_GRID.update(saved)


@pytest.mark.slow
def test_debug_mode_instrumentation():
    """Config.debug_mode: per-module weight/grad summaries + ray histograms
    land in stats (reference train_utils.py:3101-3156)."""
    import functools

    from neural_radiance_caching_tpu.utils import pytrees

    config = Config(
        dataset_loader="synthetic_spheres", batch_size=16, near=2.0, far=6.0,
        max_steps=2, lr_init=1e-3, lr_final=1e-3, lr_delay_steps=0,
        data_loss_type="charb", interlevel_loss_mults=(0.01, 0.01),
        interlevel_loss_blurs=(0.03, 0.003), linear_to_srgb=True,
        mask_lossmult=False, debug_mode=True,
    )
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
    assert "grad_norms" in stats and "weight_l2s" in stats
    assert any(k.startswith("ray_normalized_distance") for k in stats)
    for v in stats["grad_norms"].values():
        assert np.isfinite(float(v))


@pytest.mark.slow
def test_analytic_normals_full_geometry_losses():
    """Train step with ANALYTIC density normals (disable_density_normals=
    False, as the nero/glossy/transient configs use) plus every geometry
    loss those configs enable. This path requires second-order AD through
    the encoder (handled by hashgrid.xla_encoder_scope) and per-sample
    beta shapes — both regressed silently before being pinned here."""
    import functools

    from neural_radiance_caching_tpu.utils import pytrees

    mlp = {
        "net_depth": 1, "net_width": 16, "disable_density_normals": False,
        "enable_pred_normals": True, "warp_fn": coord.contract_radius_2,
    }
    strategy = ((0, 0, 6), (1, 1, 6), (2, 2, 4))
    config = Config(
        dataset_loader="synthetic_spheres", batch_size=16, near=2.0, far=6.0,
        max_steps=2, lr_init=1e-3, lr_final=1e-3, lr_delay_steps=0,
        data_loss_type="charb", interlevel_loss_mults=(0.01, 0.01),
        interlevel_loss_blurs=(0.03, 0.003), linear_to_srgb=True,
        mask_lossmult=True, predicted_normal_loss_mult=0.05,
        predicted_normal_reverse_loss_mult=0.05, orientation_loss_mult=0.01,
        eikonal_loss_mult=0.01, distortion_loss_mult=0.01,
        use_normal_weight_ease=True, use_normal_weight_decay=True,
        opaque_loss_weight=0.01, empty_loss_weight=0.01,
    )
    model = NeRFModel(
        config=config,
        sampler_params={
            "sampling_strategy": strategy,
            "mlp_params_per_level": (mlp, mlp, mlp),
            "grid_params_per_level": (TINY_GRID, TINY_GRID, TINY_GRID),
            "dilation_bias": 0.0, "dilation_multiplier": 0.0,
            "raydist_fn": None,
        },
        shader_params={
            "net_depth": 0, "net_width": 16, "bottleneck_width": 16,
            "use_grid": True, "grid_params": TINY_GRID,
            "warp_fn": coord.contract_radius_2,
            "use_reflections": True, "surface_lf_params": SLF_PARAMS,
            "net_depth_brdf": 1, "net_width_brdf": 8,
            "rgb_activation": jax.nn.softplus,
        },
        train_sampling_strategy=strategy,
        render_sampling_strategy=strategy,
    )
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
    expected = {"data", "distortion", "eikonal", "orientation",
                "predicted_normals", "predicted_normals_reverse", "mask"}
    assert expected <= set(stats["losses"]), sorted(stats["losses"])
    assert np.isfinite(float(stats["loss"]))


@pytest.mark.slow
def test_gradient_checkpointing_step_and_save_name_policy():
    """Remat path: one checkpointed train step runs, and the save-name
    policy resolves per model type (material saves the IPE-lift residuals,
    BASELINE.md round-3 A/B) with the override knob validated."""
    from neural_radiance_caching_tpu.utils import pytrees
    from test_material_model import make_material_model

    config = Config(
        dataset_loader="synthetic_spheres",
        batch_size=64,
        near=2.0,
        far=6.0,
        max_steps=2,
        data_loss_type="charb",
        linear_to_srgb=True,
        mask_lossmult=False,
        gradient_checkpointing=True,
    )
    model = make_tiny_model(config)
    assert train_lib._remat_save_names(model) == ("grid_encode",)
    assert train_lib._remat_save_names(make_material_model(config)) == (
        "grid_encode",
        "ipe_lift",
    )
    with pytest.raises(ValueError):
        train_lib.set_remat_save_names("ipe_lift")
    train_lib.set_remat_save_names("grid_encode", "ipe_lift")
    assert train_lib._remat_save_names(model) == ("grid_encode", "ipe_lift")
    train_lib.set_remat_save_names(None)  # restore auto
    assert train_lib._remat_save_names(model) == ("grid_encode",)

    dataset = datasets.SyntheticSpheres("train", None, config, num_images=2,
                                        resolution=8)
    mesh = mesh_lib.create_mesh()
    variables = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), pytrees.dummy_rays(8),
        train_frac=1.0, train=False,
    )
    state, _ = train_lib.create_optimizer(config, variables)
    state = mesh_lib.replicate(state, mesh)
    step = train_lib.create_train_step(model, config, mesh=mesh)
    batch = mesh_lib.shard_batch(dataset.next_train(), mesh)
    state, stats = step(jax.random.PRNGKey(0), state, batch, 0.5)
    assert np.isfinite(float(stats["loss"]))
