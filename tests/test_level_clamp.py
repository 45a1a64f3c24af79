"""Secondary-ray LOD (hash-pyramid level clamp): clamped encodes must agree
exactly with the full encode on the kept coarse levels, zero the skipped fine
levels, route no gradient into the skipped tables, and leave primary-ray
queries untouched."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.models import geometry, grids
from neural_radiance_caching_tpu.ops import coord, math


GRID = dict(hash_map_size=512, num_features=2, min_grid_size=4,
            max_grid_size=64, scale_supersample=1.0, bbox_scaling=2.0)


def _encode(enc, variables, x, **kwargs):
    return enc.apply(variables, x,
                     per_level_fn=math.average_across_multisamples, **kwargs)


def test_clamped_encode_matches_coarse_and_zeros_fine():
    enc = grids.HashEncoding(**GRID)
    num_levels = len(enc.grid_sizes)
    assert num_levels >= 4
    x = jax.random.uniform(jax.random.PRNGKey(0), (32, 2, 3), minval=-1.5,
                           maxval=1.5)
    variables = enc.init(jax.random.PRNGKey(1), x,
                         per_level_fn=math.average_across_multisamples)

    full = _encode(enc, variables, x)
    k = num_levels - 2
    clamped = _encode(enc, variables, x, max_levels=k)
    assert clamped.shape == full.shape
    f = GRID["num_features"]
    np.testing.assert_allclose(clamped[..., : k * f], full[..., : k * f],
                               rtol=1e-6)
    np.testing.assert_allclose(clamped[..., k * f:], 0.0, atol=0.0)

    # max_levels >= L is the identity.
    np.testing.assert_allclose(
        _encode(enc, variables, x, max_levels=num_levels), full, rtol=1e-6)


def test_clamp_blocks_gradients_to_fine_tables():
    enc = grids.HashEncoding(**GRID)
    num_levels = len(enc.grid_sizes)
    num_dense = enc.num_dense_levels
    x = jax.random.uniform(jax.random.PRNGKey(2), (64, 1, 3), minval=-1.0,
                           maxval=1.0)
    variables = enc.init(jax.random.PRNGKey(3), x,
                         per_level_fn=math.average_across_multisamples)
    k = num_dense + 1  # keep all dense levels + one hash level

    def loss(v, max_levels):
        out = _encode(enc, v, x, max_levels=max_levels)
        return jnp.sum(out**2)

    g = jax.grad(loss)(variables, k)["params"]["hash_levels"]
    kept_hash = k - num_dense
    assert float(jnp.abs(g[:kept_hash]).max()) > 0.0
    np.testing.assert_allclose(np.asarray(g[kept_hash:]), 0.0, atol=0.0)

    # Clamping into the dense pool: only the first level's rows get grads.
    g_all = jax.grad(loss)(variables, num_dense and 1 or 1)["params"]
    first_rows = int(enc.grid_sizes[0]) ** 3
    dense_g = np.asarray(g_all["dense_levels"])
    assert np.abs(dense_g[:first_rows]).max() > 0.0
    np.testing.assert_allclose(dense_g[first_rows:], 0.0, atol=0.0)
    np.testing.assert_allclose(np.asarray(g_all["hash_levels"]), 0.0, atol=0.0)


def test_density_mlp_secondary_clamp_only_affects_secondary():
    mlp = geometry.DensityMLP(
        net_depth=1, net_width=8, disable_density_normals=True,
        enable_pred_normals=False, warp_fn=coord.contract_radius_2,
        grid_params=dict(GRID), secondary_grid_level_clamp=2,
    )
    n, s = 8, 4
    means = jax.random.uniform(jax.random.PRNGKey(4), (n, s, 3), minval=-1.0,
                               maxval=1.0)
    covs = jnp.tile(jnp.eye(3) * 1e-4, (n, s, 1, 1))
    control_offsets = jnp.zeros((n, s, 1, 3))
    perp_mag = None

    baseline = geometry.DensityMLP(
        net_depth=1, net_width=8, disable_density_normals=True,
        enable_pred_normals=False, warp_fn=coord.contract_radius_2,
        grid_params=dict(GRID),
    )
    variables = baseline.init(
        jax.random.PRNGKey(5), means, covs, control_offsets, perp_mag,
        method=baseline.predict_density)

    def density(model, is_secondary):
        return model.apply(
            variables, means, covs, control_offsets, perp_mag,
            is_secondary=is_secondary, method=model.predict_density)[0]

    # Primary queries are identical with and without the clamp configured.
    np.testing.assert_allclose(
        np.asarray(density(mlp, False)), np.asarray(density(baseline, False)),
        rtol=1e-6)
    # Secondary queries differ (fine levels zeroed) but stay finite.
    sec = np.asarray(density(mlp, True))
    assert np.isfinite(sec).all()
    assert not np.allclose(sec, np.asarray(density(baseline, True)))


def test_density_mlp_primary_clamp_only_affects_primary():
    """primary_grid_level_clamp mirrors the secondary clamp, camera side."""
    mlp = geometry.DensityMLP(
        net_depth=1, net_width=8, disable_density_normals=True,
        enable_pred_normals=False, warp_fn=coord.contract_radius_2,
        grid_params=dict(GRID), primary_grid_level_clamp=2,
    )
    n, s = 8, 4
    means = jax.random.uniform(jax.random.PRNGKey(6), (n, s, 3), minval=-1.0,
                               maxval=1.0)
    covs = jnp.tile(jnp.eye(3) * 1e-4, (n, s, 1, 1))
    control_offsets = jnp.zeros((n, s, 1, 3))
    perp_mag = None

    baseline = geometry.DensityMLP(
        net_depth=1, net_width=8, disable_density_normals=True,
        enable_pred_normals=False, warp_fn=coord.contract_radius_2,
        grid_params=dict(GRID),
    )
    variables = baseline.init(
        jax.random.PRNGKey(7), means, covs, control_offsets, perp_mag,
        method=baseline.predict_density)

    def density(model, is_secondary):
        return model.apply(
            variables, means, covs, control_offsets, perp_mag,
            is_secondary=is_secondary, method=model.predict_density)[0]

    # Secondary queries are untouched by the primary clamp.
    np.testing.assert_allclose(
        np.asarray(density(mlp, True)), np.asarray(density(baseline, True)),
        rtol=1e-6)
    # Primary queries differ (fine levels zeroed) but stay finite.
    pri = np.asarray(density(mlp, False))
    assert np.isfinite(pri).all()
    assert not np.allclose(pri, np.asarray(density(baseline, False)))


def test_primary_and_secondary_clamps_compose():
    """With both clamps set, each ray class gets its own level budget."""
    both = geometry.DensityMLP(
        net_depth=1, net_width=8, disable_density_normals=True,
        enable_pred_normals=False, warp_fn=coord.contract_radius_2,
        grid_params=dict(GRID),
        primary_grid_level_clamp=3, secondary_grid_level_clamp=2,
    )
    only_pri = geometry.DensityMLP(
        net_depth=1, net_width=8, disable_density_normals=True,
        enable_pred_normals=False, warp_fn=coord.contract_radius_2,
        grid_params=dict(GRID), primary_grid_level_clamp=3,
    )
    only_sec = geometry.DensityMLP(
        net_depth=1, net_width=8, disable_density_normals=True,
        enable_pred_normals=False, warp_fn=coord.contract_radius_2,
        grid_params=dict(GRID), secondary_grid_level_clamp=2,
    )
    n, s = 4, 2
    means = jax.random.uniform(jax.random.PRNGKey(8), (n, s, 3), minval=-1.0,
                               maxval=1.0)
    covs = jnp.tile(jnp.eye(3) * 1e-4, (n, s, 1, 1))
    control_offsets = jnp.zeros((n, s, 1, 3))
    variables = only_pri.init(
        jax.random.PRNGKey(9), means, covs, control_offsets, None,
        method=only_pri.predict_density)

    def density(model, is_secondary):
        return model.apply(
            variables, means, covs, control_offsets, None,
            is_secondary=is_secondary, method=model.predict_density)[0]

    np.testing.assert_allclose(
        np.asarray(density(both, False)), np.asarray(density(only_pri, False)),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(density(both, True)), np.asarray(density(only_sec, True)),
        rtol=1e-6)
