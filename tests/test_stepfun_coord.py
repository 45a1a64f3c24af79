import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_radiance_caching_tpu.ops import coord, render, stepfun


def test_integrate_weights_endpoints():
    w = jnp.array([[0.1, 0.2, 0.3, 0.4]])
    cw = stepfun.integrate_weights(w)
    assert cw.shape == (1, 5)
    assert cw[0, 0] == 0.0 and cw[0, -1] == 1.0
    np.testing.assert_allclose(jnp.diff(cw, axis=-1)[0], w[0], atol=1e-6)


def test_sample_deterministic_uniform():
    # Uniform weights -> deterministic samples should be evenly spread in t.
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
    logits = jnp.zeros((4, 8))
    s = stepfun.sample(None, t, logits, num_samples=16)
    assert s.shape == (4, 16)
    np.testing.assert_allclose(s[0], np.linspace(0, 1 - 1e-7, 16), atol=1e-3)


def test_sample_respects_weights():
    # All the mass in bin 2 of 4 -> samples concentrate there.
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (1, 5))
    logits = jnp.log(jnp.array([[1e-7, 1e-7, 1.0, 1e-7]]))
    key = jax.random.PRNGKey(0)
    s = stepfun.sample(key, t, logits, num_samples=64)
    frac_in_bin = ((s >= 0.5) & (s < 0.75)).mean()
    assert frac_in_bin > 0.95


def test_sample_intervals_sorted_in_domain():
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 33), (8, 33))
    logits = jax.random.normal(jax.random.PRNGKey(1), (8, 32))
    s = stepfun.sample_intervals(
        jax.random.PRNGKey(2), t, logits, num_samples=16, single_jitter=True, domain=(0.0, 1.0)
    )
    assert s.shape == (8, 17)
    assert np.all(np.diff(s, axis=-1) >= 0)
    assert np.all(s >= 0) and np.all(s <= 1)


def test_lossfun_distortion_zero_for_delta():
    # Mass concentrated on a single zero-width interval has ~zero distortion.
    t = jnp.array([[0.0, 0.5, 0.5001, 1.0]])
    w = jnp.array([[0.0, 1.0, 0.0]])
    assert stepfun.lossfun_distortion(t, w)[0] < 1e-3


def test_max_dilate_weights_monotone():
    t = jnp.array([[0.0, 0.25, 0.5, 0.75, 1.0]])
    w = jnp.array([[0.0, 1.0, 0.0, 0.0]])
    t_d, w_d = stepfun.max_dilate_weights(t, w, 0.1, domain=(0.0, 1.0))
    # Dilated support must include the original support.
    p = stepfun.weight_to_pdf(t, w)
    p_d = stepfun.weight_to_pdf(t_d, w_d)
    assert p_d.max() >= p.max() * 0.999


def test_weighted_percentile_median_uniform():
    t = jnp.broadcast_to(jnp.linspace(0.0, 2.0, 11), (2, 11))
    w = jnp.full((2, 10), 0.1)
    p = stepfun.weighted_percentile(t, w, [50])
    np.testing.assert_allclose(p[:, 0], 1.0, atol=1e-3)


def test_resample_conserves_mass():
    rng = np.random.RandomState(0)
    tp = np.sort(rng.rand(3, 9), axis=-1)
    vp = rng.rand(3, 8)
    t = np.stack([np.full(5, tp.min() - 0.1), np.full(5, tp.max() + 0.1)]).T
    t = np.broadcast_to(np.linspace(tp.min() - 0.1, tp.max() + 0.1, 5), (3, 5))
    v = stepfun.resample(jnp.array(t), jnp.array(tp), jnp.array(vp))
    np.testing.assert_allclose(v.sum(-1), vp.sum(-1), rtol=1e-5)


def test_blur_and_resample_weights_conserves_mass():
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (2, 9))
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (2, 8)))
    tq = jnp.broadcast_to(jnp.linspace(-0.5, 1.5, 33), (2, 33))
    wq = stepfun.blur_and_resample_weights(tq, t, w, 0.01)
    np.testing.assert_allclose(wq.sum(-1), 1.0, atol=1e-3)


# --- coord ---


def test_contract_identity_inside_unit_ball():
    x = jnp.array([[0.3, -0.2, 0.1]])
    np.testing.assert_allclose(coord.contract(x), x, atol=1e-6)


def test_contract_bounded():
    x = jax.random.normal(jax.random.PRNGKey(0), (100, 3)) * 100
    z = coord.contract(x)
    assert np.all(np.linalg.norm(z, axis=-1) <= 2.0 + 1e-5)


@pytest.mark.parametrize(
    "fwd,inv",
    [
        (coord.contract, coord.inv_contract),
        (coord.contract_cube, coord.inv_contract_cube),
        (coord.contract_projective, coord.inv_contract_projective),
    ],
)
def test_contract_roundtrip(fwd, inv):
    x = jax.random.normal(jax.random.PRNGKey(1), (50, 3)) * 5
    np.testing.assert_allclose(inv(fwd(x)), x, rtol=1e-4, atol=1e-4)


def test_construct_ray_warps_piecewise():
    near, far = jnp.array([[0.1]]), jnp.array([[100.0]])
    t_to_s, s_to_t = coord.construct_ray_warps("piecewise", near, far)
    np.testing.assert_allclose(t_to_s(near), 0.0, atol=1e-6)
    np.testing.assert_allclose(t_to_s(far), 1.0, atol=1e-6)
    s = jnp.linspace(0, 1, 11)[None]
    np.testing.assert_allclose(t_to_s(s_to_t(s)), s, atol=1e-4)


def test_construct_ray_warps_power_ladder():
    import functools

    from neural_radiance_caching_tpu.ops import math

    near, far = jnp.array([[0.1]]), jnp.array([[50.0]])
    fn = functools.partial(math.power_ladder, p=-1.5, premult=2.0)
    fn_inv = functools.partial(math.inv_power_ladder, p=-1.5, premult=2.0)
    t_to_s, s_to_t = coord.construct_ray_warps(fn, near, far, fn_inv=fn_inv)
    s = jnp.linspace(0, 1, 33)[None]
    t = s_to_t(s)
    np.testing.assert_allclose(t_to_s(t), s, atol=1e-4)
    assert np.all(t >= near - 1e-4) and np.all(t <= far + 1e-2)


def test_integrated_pos_enc_zero_var_matches_pos_enc():
    x = jax.random.uniform(jax.random.PRNGKey(0), (7, 3))
    ipe = coord.integrated_pos_enc(x, jnp.zeros_like(x), 0, 4)
    pe = coord.pos_enc(x, 0, 4, append_identity=False)
    np.testing.assert_allclose(ipe, pe, atol=1e-5)


def test_integrated_pos_enc_high_var_attenuates():
    x = jax.random.uniform(jax.random.PRNGKey(0), (7, 3))
    ipe = coord.integrated_pos_enc(x, 100 * jnp.ones_like(x), 0, 4)
    assert np.abs(ipe).max() < 1e-3


def test_track_linearize_linear_fn_exact():
    a = jnp.array([[2.0, 0.0, 0.0], [0.0, 3.0, 0.0], [0.0, 0.0, 4.0]])
    fn = lambda x: x @ a.T
    mean = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    cov = jnp.broadcast_to(jnp.eye(3), (5, 3, 3))
    m2, c2 = coord.track_linearize(fn, mean, cov)
    np.testing.assert_allclose(m2, fn(mean), atol=1e-5)
    np.testing.assert_allclose(c2, jnp.broadcast_to(a @ a.T, (5, 3, 3)), atol=1e-4)


def test_contract3_isoscale_matches_track_isotropic():
    x = jax.random.normal(jax.random.PRNGKey(0), (20, 3)) * 3
    scale = jnp.ones(x.shape[:-1])
    _, s_full = coord.track_isotropic(coord.contract, x, scale)
    s_fast = coord.contract3_isoscale(x)
    np.testing.assert_allclose(s_full, s_fast, rtol=1e-3)


# --- render ---


def test_compute_alpha_weights_sum_to_one_opaque():
    density = jnp.ones((4, 16)) * 0.5
    tdist = jnp.broadcast_to(jnp.linspace(0.0, 4.0, 17), (4, 17))
    dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 3))
    w, alpha, trans = render.compute_alpha_weights(density, tdist, dirs, opaque_background=True)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    assert np.all(alpha >= 0) and np.all(alpha <= 1)


def test_compute_alpha_weights_transmittance_decreasing():
    density = jax.random.uniform(jax.random.PRNGKey(0), (4, 16)) * 2
    tdist = jnp.broadcast_to(jnp.linspace(0.1, 3.0, 17), (4, 17))
    dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 3))
    _, _, trans = render.compute_alpha_weights(density, tdist, dirs)
    assert np.all(np.diff(trans, axis=-1) <= 1e-6)


def test_cast_rays_cone_means_on_ray():
    tdist = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 5), (2, 5))
    origins = jnp.zeros((2, 3))
    dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (2, 3))
    radii = jnp.full((2, 1), 1e-3)
    means, covs = render.cast_rays(tdist, origins, dirs, radii, "cone", diag=False)
    assert means.shape == (2, 4, 3)
    assert covs.shape == (2, 4, 3, 3)
    # Means should lie along +z within each interval.
    np.testing.assert_allclose(means[..., :2], 0.0, atol=1e-6)
    assert np.all(means[..., 2] > tdist[..., :-1]) and np.all(means[..., 2] < tdist[..., 1:])


def test_volumetric_rendering_full_opacity_color():
    # A single opaque sample renders its own color.
    rgbs = jnp.ones((3, 8, 3)) * jnp.array([1.0, 0.5, 0.25])
    w = jnp.zeros((3, 8)).at[:, 4].set(1.0)
    tdist = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (3, 9))
    out = render.volumetric_rendering(rgbs, w, w, tdist, 0.0, False)
    np.testing.assert_allclose(out["rgb"], np.tile([1.0, 0.5, 0.25], (3, 1)), atol=1e-6)
    np.testing.assert_allclose(out["acc"], 1.0, atol=1e-6)
    np.testing.assert_allclose(out["distance_median"], 0.5625, atol=0.07)
