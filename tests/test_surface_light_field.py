"""Parity pins for the surface-light-field MLP.

Behavioral target: reference internal/surface_light_field.py (the env /
indirect radiance field). These tests pin the numerics of every structural
variant of the module — distance-head sample placement (uniform ladder,
far-sample split, voxel planes), sorting, masking, point offsets, env
alpha, the reflectance-grid + density decode, per-feature output mode,
lights / no-lights trunks, and multi-illumination selection — against a
golden fixture so internal refactors (renames, re-decompositions) are
provably output-preserving.

Regenerate the fixture after an INTENDED numeric change with:
    SLF_GOLDEN_WRITE=1 python -m pytest tests/test_surface_light_field.py -q
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_radiance_caching_tpu.engine.configs import Config
from neural_radiance_caching_tpu.models import surface_light_field
from neural_radiance_caching_tpu.ops import coord, math
from neural_radiance_caching_tpu.utils import pytrees

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "slf_golden.npz")

B, S, K = 4, 3, 4  # rays, samples-per-ray, distance samples


def _inputs():
    rng = jax.random.PRNGKey(3)
    keys = jax.random.split(rng, 6)
    rays = pytrees.random_rays(keys[0], B)
    origins = jax.random.normal(keys[1], (B, S, 3)) * 0.5
    refdirs = jax.random.normal(keys[2], (B, S, 3))
    refdirs = refdirs / jnp.linalg.norm(refdirs, axis=-1, keepdims=True)
    roughness = jax.nn.softplus(jax.random.normal(keys[3], (B, S, 1)))
    bottleneck = jax.random.normal(keys[4], (B, S, 8)) * 0.3
    shader_bottleneck = jax.random.normal(keys[5], (B, S, 16)) * 0.3
    return rays, origins, refdirs, roughness, bottleneck, shader_bottleneck


def _make(config=None, **overrides):
    cfg = config or Config()
    base = dict(
        config=cfg,
        warp_fn=coord.contract,
        use_distance_prediction=True,
        num_distance_samples=K,
        distance_near=0.1,
        distance_far=100.0,
        use_env_alpha=True,
        use_directional_enc=True,
        use_grid=False,
    )
    base.update(overrides)
    return surface_light_field.SurfaceLightFieldMLP(**base)


VARIANTS = {
    # predict_points-level structure
    "pp_default": dict(),
    "pp_offsets": dict(use_point_offsets=True),
    "pp_far_sorted": dict(num_far_samples=2, use_sorted_distances=True),
    "pp_uniform": dict(use_uniform_distance=True),
    "pp_voxel": dict(
        use_voxel_grid=True,
        num_distance_samples=6,
        raydist_fn=(math.power_ladder, math.inv_power_ladder, {"p": -1.5}),
    ),
    # full-call structure
    "call_lights": dict(use_lights=True, use_origins=True),
    "call_no_lights": dict(use_lights=False),
    "call_refgrid": dict(
        use_reflectance_grid=True,
        use_density_prediction=True,
        use_roughness=True,
        reflectance_grid_params={
            "hash_map_size": 2048,
            "max_grid_size": 32,
            "num_features": 4,
            "bbox_scaling": 2.0,
        },
        ref_warp_fn=coord.contract,
    ),
    "call_perref": dict(
        use_reflectance_grid=True,
        per_ref_feature_output=True,
        reflectance_grid_params={
            "hash_map_size": 2048,
            "max_grid_size": 32,
            "num_features": 4,
        },
    ),
    "call_points_sphere": dict(
        use_points=True, use_points_ide=True, use_sphere_points=True,
    ),
    "call_shader_bneck": dict(use_shader_bottleneck=True, use_bottleneck=False),
    "call_multi_illum": dict(
        _config=dict(
            multi_illumination=True,
            num_illuminations=3,
            rotate_illumination=True,
            light_rotations=[0.0, 120.0, 240.0],
        ),
        use_illumination_feature=True,
        rotate_illumination=True,
    ),
}


def _randomize(variables):
    """Replace init params with fixed random values.

    The distance head is zeros-initialized, so at init its output — and any
    slicing of it — is identically zero; goldens captured at init would not
    pin the head's channel decode at all. Random params make every branch
    numerically live.
    """
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(99), len(leaves))
    new = [
        jax.random.normal(k, l.shape, l.dtype) * 0.05
        if jnp.issubdtype(l.dtype, jnp.floating)
        else l
        for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new)


def _run_variant(name):
    spec = dict(VARIANTS[name])
    cfg_over = spec.pop("_config", None)
    cfg = Config(**cfg_over) if cfg_over else Config()
    module = _make(config=cfg, **spec)
    rays, origins, refdirs, roughness, bottleneck, shader_bneck = _inputs()
    rng = jax.random.PRNGKey(17)

    if name.startswith("pp_"):
        method = functools.partial(
            module.apply, method=surface_light_field.BaseSurfaceLightFieldMLP.propose_samples
        )
        variables = module.init(
            jax.random.PRNGKey(1), rng, rays, origins, refdirs, bottleneck, roughness,
            method=surface_light_field.BaseSurfaceLightFieldMLP.propose_samples,
        )
        variables = _randomize(variables)
        out = method(variables, rng, rays, origins, refdirs, bottleneck, roughness)
        keys = ("points", "raw_weights", "ref_mask", "s_distances", "distances",
                "env_rgb", "env_alpha")
        return dict(zip(keys, out))

    call_kwargs = dict(train=False, train_frac=1.0)
    if name == "call_shader_bneck":
        call_kwargs["shader_bottleneck"] = shader_bneck
    variables = module.init(
        jax.random.PRNGKey(1), rng, rays, None, origins, refdirs,
        roughness=roughness, **call_kwargs,
    )
    variables = _randomize(variables)
    out = module.apply(
        variables, rng, rays, None, origins, refdirs,
        roughness=roughness, **call_kwargs,
    )
    return out


def _flatten(name, out):
    return {f"{name}/{k}": np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_slf_golden_parity(variant):
    out = _flatten(variant, _run_variant(variant))
    if os.environ.get("SLF_GOLDEN_WRITE"):
        existing = {}
        if os.path.exists(GOLDEN_PATH):
            existing = dict(np.load(GOLDEN_PATH))
        existing.update(out)
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez(GOLDEN_PATH, **existing)
        pytest.skip("golden written")
    golden = np.load(GOLDEN_PATH)
    for k, v in out.items():
        assert k in golden.files, f"missing golden for {k} — regenerate fixture"
        # Tolerance admits ulp-level reassociation (e.g. the triangle-wave
        # fold written as mod/abs vs floor/frac) amplified by the distance
        # warp's 0.1..100 range — not behavioral drift.
        np.testing.assert_allclose(
            v, golden[k], rtol=5e-5, atol=1e-5,
            err_msg=f"{k} drifted from golden",
        )


def test_env_alpha_disabled_is_ones():
    """use_env_alpha=False must hard-wire alpha to 1 regardless of the head."""
    module = _make(use_env_alpha=False)
    rays, origins, refdirs, roughness, bottleneck, _ = _inputs()
    rng = jax.random.PRNGKey(17)
    variables = module.init(
        jax.random.PRNGKey(1), rng, rays, origins, refdirs, bottleneck, roughness,
        method=surface_light_field.BaseSurfaceLightFieldMLP.propose_samples,
    )
    out = module.apply(
        variables, rng, rays, origins, refdirs, bottleneck, roughness,
        method=surface_light_field.BaseSurfaceLightFieldMLP.propose_samples,
    )
    np.testing.assert_array_equal(np.asarray(out[-1]), 1.0)


def test_fold_keeps_samples_in_unit_interval():
    """Out-of-range ladder shifts must reflect back into [0, 1]."""
    module = _make(distance_scale=50.0)  # huge shifts force folding
    rays, origins, refdirs, roughness, bottleneck, _ = _inputs()
    rng = jax.random.PRNGKey(17)
    variables = module.init(
        jax.random.PRNGKey(1), rng, rays, origins, refdirs, bottleneck, roughness,
        method=surface_light_field.BaseSurfaceLightFieldMLP.propose_samples,
    )
    out = module.apply(
        variables, rng, rays, origins, refdirs, bottleneck, roughness,
        method=surface_light_field.BaseSurfaceLightFieldMLP.propose_samples,
    )
    s = np.asarray(out[3])
    assert (s >= 0.0).all() and (s <= 1.0).all()


def test_sorted_distances_monotone():
    module = _make(use_sorted_distances=True, num_far_samples=2)
    rays, origins, refdirs, roughness, bottleneck, _ = _inputs()
    rng = jax.random.PRNGKey(17)
    variables = module.init(
        jax.random.PRNGKey(1), rng, rays, origins, refdirs, bottleneck, roughness,
        method=surface_light_field.BaseSurfaceLightFieldMLP.propose_samples,
    )
    out = module.apply(
        variables, rng, rays, origins, refdirs, bottleneck, roughness,
        method=surface_light_field.BaseSurfaceLightFieldMLP.propose_samples,
    )
    d = np.asarray(out[4])
    assert (np.diff(d, axis=-1) >= 0).all()
