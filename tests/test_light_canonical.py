"""Canonical (surface-frame) light conditioning for relight generalization.

Covers `nerf_shader.canonical_light_features` math properties and the
`Config.light_canonical_frame` wiring through a cache-model forward
(parity-plus over the reference, which trains one run per fixed
illumination — reference internal/datasets.py:3271-3410).
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.models.nerf_shader import canonical_light_features


def _rot_about_axis(axis, theta):
    """Rodrigues rotation matrix about a unit axis."""
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    k = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    return np.eye(3) + np.sin(theta) * k + (1 - np.cos(theta)) * (k @ k)


def _features(light, mean, normal, viewdir):
    out = canonical_light_features(
        jnp.asarray(light, jnp.float32)[None, None, :],
        jnp.asarray(mean, jnp.float32)[None, None, :],
        jnp.asarray(normal, jnp.float32)[None, None, :],
        jnp.asarray(viewdir, jnp.float32)[None, None, :],
    )
    return np.asarray(out)[0, 0]


def test_joint_azimuth_rotation_invariance():
    """Rotating light AND view about the local normal leaves features fixed
    (the absolute-azimuth gauge an isotropic response cannot depend on)."""
    rng = np.random.RandomState(0)
    mean = np.array([0.3, -0.2, 0.5])
    normal = rng.randn(3)
    normal /= np.linalg.norm(normal)
    light = mean + rng.randn(3)
    viewdir = rng.randn(3)
    viewdir /= np.linalg.norm(viewdir)
    base = _features(light, mean, normal, viewdir)
    for theta in (0.37, 1.9, 4.5):
        rot = _rot_about_axis(normal, theta)
        light_r = mean + rot @ (light - mean)
        view_r = rot @ viewdir
        np.testing.assert_allclose(
            _features(light_r, mean, normal, view_r), base, atol=1e-5
        )


def test_light_only_rotation_changes_only_relative_azimuth():
    """Rotating the light alone keeps elevation/distance channels fixed and
    moves only the relative-azimuth channel (l_t . v_t)."""
    rng = np.random.RandomState(1)
    mean = np.zeros(3)
    normal = np.array([0.0, 0.0, 1.0])
    light = np.array([1.0, 0.5, 1.2])
    viewdir = rng.randn(3)
    viewdir /= np.linalg.norm(viewdir)
    base = _features(light, mean, normal, viewdir)
    rot = _rot_about_axis(normal, 2.0)
    moved = _features(mean + rot @ (light - mean), mean, normal, viewdir)
    # n.l, n.v, |l_t||v_t|, log d unchanged; relative azimuth moved.
    np.testing.assert_allclose(moved[[0, 1, 3, 4]], base[[0, 1, 3, 4]], atol=1e-5)
    assert abs(moved[2] - base[2]) > 1e-3


def test_channel_semantics():
    """Hand-checkable geometry: light overhead, view at 45 degrees."""
    mean = np.zeros(3)
    normal = np.array([0.0, 0.0, 1.0])
    light = np.array([0.0, 0.0, 2.0])
    s = 1.0 / np.sqrt(2.0)
    viewdir = np.array([s, 0.0, -s])  # camera ray pointing down at 45 deg
    f = _features(light, mean, normal, viewdir)
    np.testing.assert_allclose(f[0], 1.0, atol=1e-5)  # n.l: overhead
    np.testing.assert_allclose(f[1], s, atol=1e-5)  # n.v: 45 deg
    np.testing.assert_allclose(f[2], 0.0, atol=1e-5)  # l_t = 0
    np.testing.assert_allclose(f[3], 0.0, atol=1e-5)
    np.testing.assert_allclose(f[4], np.log(2.0), atol=1e-5)


def test_frame_inputs_carry_no_gradient():
    """Conditioning must not drive geometry: d(features)/d(normals) == 0."""
    lights = jnp.ones((1, 1, 3))
    means = jnp.zeros((1, 1, 3))
    viewdirs = jnp.asarray([[[0.0, 0.0, -1.0]]])

    def f(n):
        return canonical_light_features(lights, means, n, viewdirs).sum()

    g = jax.grad(f)(jnp.asarray([[[0.1, 0.2, 0.9]]]))
    np.testing.assert_allclose(np.asarray(g), 0.0)


@pytest.mark.slow
def test_cache_forward_with_canonical_flag():
    """A cache model forward runs (and differs from raw conditioning) with
    Config.light_canonical_frame=True."""
    import functools

    from neural_radiance_caching_tpu.engine.configs import Config
    from neural_radiance_caching_tpu.utils import pytrees
    import bench

    def run(flag):
        config = Config(
            near=0.2, far=6.0, batch_size=16, max_steps=4,
            dataset_loader="synthetic_spheres",
            light_canonical_frame=flag,
        )
        params = bench.flagship_cache_params(config)
        params["shader_params"] = dict(
            params["shader_params"], use_active=True, use_indirect=True,
            use_ambient=True,
        )
        # Tiny shapes for the CPU tier.
        tiny = {"hash_map_size": 512, "max_grid_size": 32, "num_features": 2,
                "bbox_scaling": 2.0}
        small_mlp = {"net_depth": 1, "net_width": 8,
                     "disable_density_normals": True,
                     "enable_pred_normals": True}
        params["sampler_params"]["mlp_params_per_level"] = (
            small_mlp, small_mlp, small_mlp)
        params["sampler_params"]["grid_params_per_level"] = (tiny, tiny, tiny)
        params["sampler_params"]["sampling_strategy"] = (
            (0, 0, 4), (1, 1, 4), (2, 2, 2))
        params["shader_params"] = dict(
            params["shader_params"], net_depth=0, net_width=8,
            bottleneck_width=8, grid_params=tiny,
            net_depth_irradiance=1, net_width_irradiance=8,
        )
        from neural_radiance_caching_tpu.models.nerf_model import NeRFModel

        model = NeRFModel(config=config, **params)
        rays = pytrees.dummy_rays(4)
        variables = jax.jit(
            functools.partial(model.init, train_frac=1.0, train=False)
        )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), rays)
        out = model.apply(
            variables, jax.random.PRNGKey(2), rays, train_frac=1.0, train=False
        )
        return np.asarray(out["render"]["rgb"])

    rgb = run(True)
    assert np.isfinite(rgb).all()
