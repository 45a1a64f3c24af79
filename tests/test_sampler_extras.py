"""VNDF GGX sampling, quadrature env sampler, grid append_scale/feature_filter."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.models import grids
from neural_radiance_caching_tpu.ops import render_utils


def test_vndf_sampling_self_consistent_pdf():
    sampler = render_utils.MicrofacetSampler(sample_visible=True)
    n = 4096
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    u1 = jax.random.uniform(k1, (2, n))
    u2 = jax.random.uniform(k2, (2, n))
    # A grazing-ish outgoing direction, local frame (+z up).
    wo = jnp.broadcast_to(
        jnp.array([0.6, 0.0, 0.8]), (2, n, 3)
    )
    alpha = jnp.full((2, n, 1), 0.3)
    dirs, pdf = sampler.sample_directions(k3, u1, u2, wo, alpha, None, {})
    assert np.isfinite(np.asarray(dirs)).all()
    assert np.isfinite(np.asarray(pdf)).all()
    # Unit directions.
    norms = np.linalg.norm(np.asarray(dirs), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # pdf() evaluated at the sampled (wo, wi) pairs must match the pdf
    # returned at sample time.
    pdf_eval = sampler.pdf(wo, dirs, alpha, {})
    valid = np.asarray(pdf) > 1e-6
    np.testing.assert_allclose(
        np.asarray(pdf)[valid], np.asarray(pdf_eval)[valid], rtol=1e-3, atol=1e-5
    )


def test_vndf_direction_pdf_integrates_to_one():
    """MC check: the VNDF direction density integrates to ~1 over the sphere."""
    sampler = render_utils.MicrofacetSampler(sample_visible=True)
    n = 200_000
    key = jax.random.PRNGKey(1)
    # Uniform sphere samples.
    z = jax.random.uniform(key, (n,), minval=-1.0, maxval=1.0)
    phi = jax.random.uniform(jax.random.fold_in(key, 1), (n,), minval=-np.pi, maxval=np.pi)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z**2))
    wi = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    wo = jnp.broadcast_to(jnp.array([0.3, 0.1, 0.95]), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    alpha = jnp.full((n, 1), 0.5)
    pdf = sampler.pdf(wo, wi, alpha, {})
    integral = float(jnp.mean(pdf) * 4.0 * np.pi)
    assert abs(integral - 1.0) < 0.05, integral


def test_quadrature_envmap_sampler_integrates_constant():
    """Quadrature over all texels: sum(L/pdf)/N == ∫L dΩ == 4π for L=1."""
    h, w = 16, 32
    _, _, omega_xyz, _ = render_utils.get_directions(h, w)
    env_dirs = omega_xyz.reshape(h * w, 3)
    kwargs = {
        "env_map_dirs": env_dirs,
        "env_map": jnp.ones_like(env_dirs),
    }
    sampler = render_utils.QuadratureEnvmapSampler()
    n = h * w
    u1 = jnp.zeros((1, n))
    dirs, pdf, rgbs = sampler.sample_directions(
        jax.random.PRNGKey(0), u1, u1, jnp.zeros((1, n, 3)), None, None, kwargs
    )
    assert sampler.deterministic and sampler.global_dirs
    integral = float((1.0 / pdf).sum(axis=-1)[0] / n * 1.0)
    # One texel's quadrature weight is 2π² sinθ / N; summing gives ~4π.
    assert abs(integral - 4.0 * np.pi / 1.0 * (1.0 / 1.0)) / (4 * np.pi) < 0.02
    # pdf() agrees with sample-time pdf.
    pdf_eval = sampler.pdf(None, dirs, None, kwargs)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf_eval), rtol=1e-5)


def _tiny_grid(**kw):
    return grids.HashEncoding(
        hash_map_size=512, max_grid_size=32, num_features=2, bbox_scaling=2.0, **kw
    )


def test_append_scale_adds_per_level_feature():
    enc = _tiny_grid(append_scale=True)
    x = jax.random.uniform(jax.random.PRNGKey(0), (16, 4, 3), minval=-1, maxval=1)
    x_scale = jnp.full((16, 4, 1), 0.01)
    params = enc.init(jax.random.PRNGKey(1), x, x_scale=x_scale)
    base = _tiny_grid(append_scale=False)
    params_base = base.init(jax.random.PRNGKey(1), x, x_scale=x_scale)
    out = enc.apply(params, x, x_scale=x_scale)
    out_base = base.apply(params_base, x, x_scale=x_scale)
    num_levels = len(enc.grid_sizes)
    f = enc.num_features
    assert out_base.shape[-1] == num_levels * f
    assert out.shape[-1] == num_levels * (f + 1)
    assert np.isfinite(np.asarray(out)).all()
    # The appended channels carry the 2w-1 scale feature: strictly within
    # ±precondition_scaling * rms bound and monotone in x_scale.
    out_big = enc.apply(params, x, x_scale=jnp.full((16, 4, 1), 10.0))
    scale_feats = np.asarray(out).reshape(16, 4, num_levels, f + 1)[..., -1]
    scale_feats_big = np.asarray(out_big).reshape(16, 4, num_levels, f + 1)[..., -1]
    # Larger footprint → smaller weighting → smaller (more negative) feature.
    assert (scale_feats_big <= scale_feats + 1e-6).all()


def test_feature_filter_zeroes_fine_levels():
    enc = _tiny_grid()
    x = jax.random.uniform(jax.random.PRNGKey(0), (8, 1, 3), minval=-1, maxval=1)
    params = enc.init(jax.random.PRNGKey(1), x)
    filter_size = int(enc.grid_sizes[0])  # only levels finer than the coarsest
    keep = jnp.ones((8, 1, 1), bool)
    drop = jnp.zeros((8, 1, 1), bool)
    out_keep = enc.apply(params, x, feature_filter=keep, feature_filter_size=filter_size)
    out_drop = enc.apply(params, x, feature_filter=drop, feature_filter_size=filter_size)
    out_plain = enc.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_keep), np.asarray(out_plain), rtol=1e-6)
    num_levels = len(enc.grid_sizes)
    f = enc.num_features
    lvl = np.asarray(out_drop).reshape(8, num_levels, f)
    gated = np.asarray(enc.grid_sizes) > filter_size
    assert gated.any() and not gated.all()
    assert np.abs(lvl[:, gated, :]).max() == 0.0
    plain_lvl = np.asarray(out_plain).reshape(8, num_levels, f)
    np.testing.assert_allclose(lvl[:, ~gated, :], plain_lvl[:, ~gated, :], rtol=1e-6)


def test_concat_reduce_returns_flat_level_major_features():
    """per_level_fn=concat_across_multisamples must yield ONE flat
    [..., L*M*F] vector (reference math.concat_across_multisamples +
    grid_utils.py:896-901 level concatenation), ordered level-major with
    (multisample, feature) minor — i.e. each level block equals that
    level's per-multisample features side by side."""
    from neural_radiance_caching_tpu.ops import math as nrc_math

    enc = _tiny_grid()
    m = 4
    x = jax.random.uniform(jax.random.PRNGKey(3), (5, m, 3), minval=-1, maxval=1)
    params = enc.init(jax.random.PRNGKey(1), x)
    out = enc.apply(
        params, x, per_level_fn=nrc_math.concat_across_multisamples
    )
    num_levels = len(enc.grid_sizes)
    f = enc.num_features
    assert out.shape == (5, num_levels * m * f)
    # Per-multisample (no-reduce) features reshaped level-major must match.
    per_sample = enc.apply(params, x, per_level_fn=None)  # [5, m, L*F]
    want = np.moveaxis(
        np.asarray(per_sample).reshape(5, m, num_levels, f), 1, 2
    ).reshape(5, -1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)


def test_append_scale_with_concat_reduce():
    """append_scale + concat: scale features append per (level, multisample)
    BEFORE the reduce (reference grid_utils.py:872-888), giving level blocks
    of M*(F+1) with (multisample, feature) minor."""
    from neural_radiance_caching_tpu.ops import math as nrc_math

    enc = _tiny_grid(append_scale=True)
    m = 3
    x = jax.random.uniform(jax.random.PRNGKey(4), (6, m, 3), minval=-1, maxval=1)
    # Distinct per-multisample footprints so the scale features differ by m.
    x_scale = jnp.stack(
        [jnp.full((6, 1), 0.002 * (i + 1)) for i in range(m)], axis=-2
    )
    params = enc.init(jax.random.PRNGKey(1), x, x_scale=x_scale)
    out = enc.apply(
        params, x, x_scale=x_scale,
        per_level_fn=nrc_math.concat_across_multisamples,
    )
    num_levels = len(enc.grid_sizes)
    f = enc.num_features
    assert out.shape == (6, num_levels * m * (f + 1))
    blocks = np.asarray(out).reshape(6, num_levels, m, f + 1)
    assert np.isfinite(blocks).all()
    # The appended channel must vary across multisamples (distinct x_scale)
    # and be monotone: larger footprint -> smaller weighting -> smaller value.
    scale_feats = blocks[..., -1]  # [6, L, m]
    assert (np.diff(scale_feats, axis=-1) <= 1e-6).all()
    # Feature channels must match the base encoder's concat output.
    base = _tiny_grid(append_scale=False)
    params_base = base.init(jax.random.PRNGKey(1), x, x_scale=x_scale)
    out_base = base.apply(
        params_base, x, x_scale=x_scale,
        per_level_fn=nrc_math.concat_across_multisamples,
    )
    np.testing.assert_allclose(
        blocks[..., :f].reshape(6, -1), np.asarray(out_base),
        rtol=1e-5, atol=1e-6,
    )


def test_sum_feature_aggregator():
    """feature_aggregator='sum' sums per-level blocks (grid_utils.py:898-899)
    instead of concatenating them."""
    enc_cat = _tiny_grid()
    enc_sum = _tiny_grid(feature_aggregator="sum")
    x = jax.random.uniform(jax.random.PRNGKey(6), (10, 2, 3), minval=-1, maxval=1)
    params = enc_cat.init(jax.random.PRNGKey(1), x)
    out_cat = enc_cat.apply(params, x)
    out_sum = enc_sum.apply(params, x)
    num_levels = len(enc_cat.grid_sizes)
    f = enc_cat.num_features
    assert out_sum.shape == (10, 2, f)
    want = np.asarray(out_cat).reshape(10, 2, num_levels, f).sum(axis=-2)
    np.testing.assert_allclose(np.asarray(out_sum), want, rtol=1e-5, atol=1e-6)
