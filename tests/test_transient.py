"""Transient (InvProp) models: time-binned cache + material, learnable light."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_radiance_caching_tpu.engine.configs import Config
from neural_radiance_caching_tpu.models.material_model import TransientMaterialModel
from neural_radiance_caching_tpu.models.nerf_model import TransientNeRFModel
from neural_radiance_caching_tpu.ops import coord, render
from neural_radiance_caching_tpu.utils import pytrees
from test_material_model import MLP, SLF, STRATEGY, TINY_GRID

N_BINS = 16


def make_config():
    return Config(
        near=0.2, far=6.0, secondary_far=2.0, mask_lossmult=False,
        material_loss_radius=2.0, use_transient=True, n_bins=N_BINS,
        exposure_time=0.5, learnable_light=True,
        light_source_position=[0.0, 0.0, 1.0],
    )


def cache_params():
    return {
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
            "use_reflections": True, "use_ambient": False, "use_indirect": True,
            "use_active": True, "surface_lf_params": SLF,
            "net_depth_integrated_brdf": 1, "net_width_integrated_brdf": 8,
            "net_depth_brdf": 1, "net_width_brdf": 8,
            "net_depth_irradiance": 1, "net_width_irradiance": 8,
            "rgb_activation": jax.nn.softplus,
        },
        "resample_secondary": True,
        "train_sampling_strategy": STRATEGY,
        "render_sampling_strategy": STRATEGY,
    }


@pytest.mark.slow
def test_transient_cache_forward():
    config = make_config()
    config = config.__class__(**{**config.__dict__, "learnable_light": False})
    model = TransientNeRFModel(config=config, **cache_params())
    rays = pytrees.dummy_rays(4)
    v = jax.jit(functools.partial(model.init, train_frac=1.0, train=True))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), rays
    )
    out = model.apply(v, jax.random.PRNGKey(2), rays, train_frac=0.5, train=True)
    assert out["render"]["rgb"].shape == (4, N_BINS, 3)
    assert np.isfinite(out["render"]["rgb"]).all()
    assert out["render"]["transient_direct"].shape == (4, N_BINS, 3)
    assert out["render"]["transient_indirect"].shape == (4, N_BINS, 3)


@pytest.mark.slow
def test_transient_material_forward_and_grads():
    config = make_config()
    model = TransientMaterialModel(
        config=config,
        cache_model_params=cache_params(),
        use_light_sampler=True,
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
            "use_brdf_correction": False, "use_active": True, "use_indirect": True,
        },
        resample=True, num_resample=1, slf_variate=False,
    )
    rays = pytrees.dummy_rays(4)
    v = jax.jit(functools.partial(model.init, train_frac=1.0, train=True))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), rays
    )
    out = model.apply(v, jax.random.PRNGKey(2), rays, train_frac=0.5, train=True)
    assert out["render"]["rgb"].shape == (4, N_BINS, 3)
    assert np.isfinite(out["render"]["rgb"]).all()
    # Learnable light calibration params exist under the material shader.
    assert "LightSource" in v["params"]["MaterialShader"]

    def loss(vv):
        o = model.apply(vv, jax.random.PRNGKey(2), rays, train_frac=0.5, train=True)
        return o["render"]["rgb"].sum() + o["cache_main"]["integrator"]["rgb"].sum()

    g = jax.jit(jax.grad(loss))(v)
    assert all(np.isfinite(x).all() for x in jax.tree_util.tree_leaves(g))


def test_bin_direct_pulses_matches_reference_scatter():
    """The MXU two-tap binning must equal the reference's flat scatter-add
    (render.py:452-490)."""
    key = jax.random.PRNGKey(0)
    R, S, C, B = 6, 10, 3, 12
    dists = jax.random.uniform(key, (R, S)) * (B - 2)
    rgbs = jax.random.uniform(key, (R, S, C))
    w = jax.random.uniform(key, (R, S))
    got = render.bin_direct_pulses(dists, rgbs, w, B)

    lo = np.maximum(np.floor(np.array(dists)), 0).astype(int)
    hi = np.ceil(np.array(dists)).astype(int)
    w_hi = np.array(dists) - lo
    ref = np.zeros((R, B, C))
    for r in range(R):
        for s in range(S):
            contrib = np.array(w)[r, s] * np.array(rgbs)[r, s]
            ref[r, lo[r, s]] += contrib * (1 - w_hi[r, s])
            if hi[r, s] < B:
                ref[r, hi[r, s]] += contrib * w_hi[r, s]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_shift_transient_matches_map_coordinates():
    """Two-tap shift must equal the reference's map_coordinates resample
    (render.py:493-507)."""
    import jax.scipy.ndimage

    key = jax.random.PRNGKey(1)
    N, B, C = 5, 12, 3
    t = jax.random.uniform(key, (N, B, C))
    moves = jax.random.uniform(key, (N,)) * 4
    got = render.shift_transient(t, moves, B)

    x, y, z = jnp.meshgrid(jnp.arange(N), jnp.arange(B), jnp.arange(C), indexing="ij")
    y = y - moves[:, None, None]
    ref = jax.scipy.ndimage.map_coordinates(t, jnp.stack([x, y, z]), 1, mode="constant")
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("backend", ["fft", "matmul"])
@pytest.mark.slow
def test_shift_and_integrate_matches_gather_path(backend):
    """The spectral fused shift+integrate (both the native-FFT and the
    matmul-DFT backends) must equal the two-tap gather path (shift then
    weighted sum) in value and in every gradient, across fractional,
    negative, and out-of-window shifts."""
    prev_backend = render._SPECTRAL_BACKEND
    render.set_spectral_backend(backend)
    try:
        key = jax.random.PRNGKey(2)
        kt, km, kw = jax.random.split(key, 3)
        R, S, B, C = 4, 6, 20, 3
        t = jax.random.uniform(kt, (R, S, B, C))
        # Spread shifts over [-1.5B, 1.5B]: in-window, negative, and fully
        # out-of-window rows (which must contribute exactly zero).
        moves = (jax.random.uniform(km, (R, S)) - 0.5) * 3.0 * B
        w = jax.random.uniform(kw, (R, S))

        def ref_path(t, moves, w):
            sh = render.shift_transient(t.reshape(R * S, B, C), moves.reshape(-1), B)
            return (sh.reshape(R, S, B, C) * w[..., None, None]).sum(1)

        got = render.shift_and_integrate_transient(t, moves, w, B)
        ref = ref_path(t, moves, w)
        np.testing.assert_allclose(got, ref, atol=2e-5)

        def loss_new(t, moves, w):
            probe = jnp.cos(jnp.arange(B * C, dtype=jnp.float32)).reshape(B, C)
            return (render.shift_and_integrate_transient(t, moves, w, B) * probe).sum()

        def loss_ref(t, moves, w):
            probe = jnp.cos(jnp.arange(B * C, dtype=jnp.float32)).reshape(B, C)
            return (ref_path(t, moves, w) * probe).sum()

        g_new = jax.grad(loss_new, argnums=(0, 1, 2))(t, moves, w)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(t, moves, w)
        for a, b_, name in zip(g_new, g_ref, ("transient", "bins_move", "weights")):
            np.testing.assert_allclose(a, b_, atol=3e-5, err_msg=name)
    finally:
        render.set_spectral_backend(prev_backend)


@pytest.mark.slow
def test_transient_train_step_e2e():
    """Full sharded train step on the time-binned cache: data loss shapes
    with the extra bins axis (lossmult [B,1] vs target [B,bins,3]) and the
    in-step ray-casting path both regressed silently before this test."""
    from neural_radiance_caching_tpu.data import datasets
    from neural_radiance_caching_tpu.parallel import mesh as mesh_lib
    from neural_radiance_caching_tpu.parallel import train as train_lib

    config = Config(
        near=2.0, far=6.0, mask_lossmult=False, use_transient=True,
        n_bins=N_BINS, exposure_time=0.5, dataset_loader="synthetic_spheres",
        batch_size=32, max_steps=2, lr_init=1e-3, lr_final=1e-3,
        lr_delay_steps=0, data_loss_type="mse",
        interlevel_loss_mults=(0.01, 0.01),
        interlevel_loss_blurs=(0.03, 0.003),
    )
    model = TransientNeRFModel(config=config, **cache_params())
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
    assert batch.rgb.ndim == 3 and batch.rgb.shape[1] == N_BINS
    state, stats = step(jax.random.PRNGKey(0), state, batch, 0.5)
    assert np.isfinite(float(stats["loss"]))


@pytest.mark.slow
def test_transient_material_train_step_e2e():
    """Sharded train step on the TRANSIENT material stage: time-binned data
    loss + consistency losses + gradient debias over the full staged model,
    on real (synthetic-spheres transient) batches."""
    from neural_radiance_caching_tpu.data import datasets
    from neural_radiance_caching_tpu.parallel import mesh as mesh_lib
    from neural_radiance_caching_tpu.parallel import train as train_lib

    config = Config(
        near=2.0, far=6.0, secondary_far=2.0, mask_lossmult=False,
        use_transient=True, n_bins=N_BINS, exposure_time=0.5,
        dataset_loader="synthetic_spheres", batch_size=16, max_steps=2,
        lr_init=1e-3, lr_final=1e-3, lr_delay_steps=0,
        data_loss_type="rawnerf_transient_unbiased", use_gradient_debias=True,
        material_loss_radius=2.0, interlevel_loss_mults=(0.01, 0.01),
        interlevel_loss_blurs=(0.03, 0.003),
        cache_consistency_loss_weight=0.1,
        cache_consistency_loss_type="rawnerf_original",
    )
    model = TransientMaterialModel(
        config=config,
        cache_model_params=cache_params(),
        use_light_sampler=True,
        light_sampler_params={
            "net_depth": 1, "net_width": 8, "bottleneck_width": 8,
            "num_components": 4, "use_density_feature": False,
            "use_grid": True, "grid_params": TINY_GRID,
            "warp_fn": coord.contract_radius_2,
        },
        shader_params={
            "net_depth": 0, "net_width": 8, "bottleneck_width": 8,
            "use_density_feature": False, "use_grid": True,
            "grid_params": TINY_GRID, "warp_fn": coord.contract_radius_2,
            "num_secondary_samples": 4, "render_num_secondary_samples": 4,
            "num_secondary_samples_diff": 2,
            "render_num_secondary_samples_diff": 2,
            "cache_train_sampling_strategy": ((0, 0, 4), (2, 2, 4)),
            "cache_render_sampling_strategy": ((0, 0, 4), (2, 2, 4)),
            "net_depth_brdf": 1, "net_width_brdf": 8,
            "use_brdf_correction": False, "use_active": True,
            "use_indirect": True,
        },
        resample=True, num_resample=1, slf_variate=False,
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
    assert np.isfinite(float(stats["loss"]))
    assert "data" in stats["losses"] and "cache_data" in stats["losses"]


def test_wide_pulse_transient_gt_and_ray_kernel():
    """synthetic_spheres_impulse_sigma>0: the GT transients are the sigma=0
    transients convolved with the sensor kernel, the dataset hands the same
    kernel to rays.impulse_response, and the numpy GT convolution matches
    the model-side jax.scipy convolve exactly (both sides of the IoU carry
    the same pulse — reference trainer.py:1626-1647 metric conditions)."""
    from neural_radiance_caching_tpu.data import datasets
    from neural_radiance_caching_tpu.data.datasets import _convolve_bins

    base_kwargs = dict(
        near=2.0, far=6.0, use_transient=True, n_bins=32, exposure_time=0.5,
        dataset_loader="synthetic_spheres", batch_size=8, max_steps=2,
    )
    cfg0 = Config(**base_kwargs)
    cfg1 = Config(synthetic_spheres_impulse_sigma=2.0, **base_kwargs)
    ds0 = datasets.SyntheticSpheres("train", None, cfg0, num_images=1, resolution=8)
    ds1 = datasets.SyntheticSpheres("train", None, cfg1, num_images=1, resolution=8)

    kernel = ds1.impulse_response
    assert kernel is not None and len(kernel) % 2 == 1
    np.testing.assert_allclose(kernel.sum(), 1.0, atol=1e-6)
    assert ds0.impulse_response is None

    flat0 = ds0.images.reshape(-1, 32, 3)
    flat1 = ds1.images.reshape(-1, 32, 3)
    np.testing.assert_allclose(flat1, _convolve_bins(flat0, kernel), atol=1e-5)
    # Energy preserved away from the clip boundary, pulse widened.
    assert (flat1.max(axis=1) <= flat0.max(axis=1) + 1e-6).all()

    # GT-side numpy conv == model-side jax.scipy conv (integrator path).
    jconv = jax.scipy.signal.convolve(
        jnp.asarray(flat0), jnp.asarray(kernel)[None, :, None], mode="same"
    )
    np.testing.assert_allclose(np.asarray(jconv), _convolve_bins(flat0, kernel),
                               atol=1e-5)

    # The ray batch carries the kernel so the rendering is convolved too.
    batch = ds1.next_train()
    assert batch.rays.impulse_response is not None
    np.testing.assert_allclose(np.asarray(batch.rays.impulse_response), kernel)


@pytest.mark.slow
def test_wide_pulse_train_and_render_on_mesh():
    """The global 1-D sensor kernel must survive the sharded pipeline: the
    8-virtual-device mesh cannot batch-shard a kernel-length leaf
    (shard_batch replicates it; the train step inherits the committed
    shardings) and the eval chunker must not pad it to the chunk size."""
    from neural_radiance_caching_tpu.data import datasets
    from neural_radiance_caching_tpu.engine import renderer
    from neural_radiance_caching_tpu.parallel import mesh as mesh_lib
    from neural_radiance_caching_tpu.parallel import train as train_lib

    config = Config(
        near=2.0, far=6.0, mask_lossmult=False, use_transient=True,
        n_bins=N_BINS, exposure_time=0.5, dataset_loader="synthetic_spheres",
        batch_size=32, max_steps=2, lr_init=1e-3, lr_final=1e-3,
        lr_delay_steps=0, data_loss_type="mse",
        interlevel_loss_mults=(0.01, 0.01),
        interlevel_loss_blurs=(0.03, 0.003),
        synthetic_spheres_impulse_sigma=1.5,
        render_chunk_size=32,
    )
    model = TransientNeRFModel(config=config, **cache_params())
    variables = jax.jit(functools.partial(model.init, train_frac=1.0, train=True))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), pytrees.dummy_rays(4)
    )
    dataset = datasets.SyntheticSpheres("train", None, config, num_images=2,
                                        resolution=8)
    assert dataset.impulse_response is not None
    mesh = mesh_lib.create_mesh()
    state, _ = train_lib.create_optimizer(config, variables)
    state = mesh_lib.replicate(state, mesh)
    step = train_lib.create_train_step(model, config, mesh=mesh)
    batch = mesh_lib.shard_batch(dataset.next_train(), mesh)
    assert batch.rays.impulse_response.shape == dataset.impulse_response.shape
    state, stats = step(jax.random.PRNGKey(0), state, batch, 0.5)
    assert np.isfinite(float(stats["loss"]))

    # Eval path: chunked render with the kernel attached to full-image rays.
    render_fn = train_lib.create_render_fn(model, mesh=mesh)
    eval_batch = dataset.generate_ray_batch(0)
    assert eval_batch.rays.impulse_response is not None
    out = renderer.render_image(
        render_fn, state.params, eval_batch.rays, jax.random.PRNGKey(7),
        config, height=8, width=8, train_frac=1.0,
    )
    assert out["rgb"].shape == (8, 8, N_BINS, 3)
    assert np.isfinite(out["rgb"]).all()
