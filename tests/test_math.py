import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_radiance_caching_tpu.ops import math


def test_safe_exp_matches_exp_in_range():
    x = jnp.linspace(-10, 10, 101)
    np.testing.assert_allclose(math.safe_exp(x), jnp.exp(x), rtol=1e-6)


def test_safe_exp_clips_and_has_finite_grad():
    g = jax.grad(lambda x: math.safe_exp(x))(1000.0)
    assert np.isfinite(g)
    assert np.isfinite(math.safe_exp(1000.0))


def test_safe_log_grad_finite_at_zero():
    g = jax.grad(math.safe_log)(0.0)
    assert np.isfinite(g)


def test_safe_div_no_nan():
    out = math.safe_div(jnp.array([1.0, 2.0]), jnp.array([0.0, 4.0]))
    np.testing.assert_allclose(out, [0.0, 0.5])
    gn, gd = jax.grad(lambda n, d: math.safe_div(n, d).sum(), argnums=(0, 1))(
        jnp.array([1.0]), jnp.array([0.0])
    )
    assert np.all(np.isfinite(gn)) and np.all(np.isfinite(gd))


def test_safe_sqrt_grad_finite_at_zero():
    assert np.isfinite(jax.grad(math.safe_sqrt)(0.0))


@pytest.mark.parametrize("p", [-2.0, -1.5, -0.25, 0.0, 0.5, 1.0, 2.0])
def test_power_ladder_inverse_roundtrip(p):
    x = jnp.linspace(-5, 5, 41)
    y = math.power_ladder(x, p)
    x2 = math.inv_power_ladder(y, p)
    np.testing.assert_allclose(x2, x, atol=5e-4, rtol=5e-4)


def test_power_ladder_premult_postmult():
    x = jnp.linspace(-2, 2, 11)
    y = math.power_ladder(x, -1.5, premult=2.0, postmult=3.0)
    x2 = math.inv_power_ladder(y, -1.5, premult=2.0, postmult=3.0)
    np.testing.assert_allclose(x2, x, atol=1e-5)


def test_learning_rate_decay_endpoints():
    np.testing.assert_allclose(
        math.learning_rate_decay(0, 1e-2, 1e-4, 100), 1e-2, rtol=1e-5
    )
    np.testing.assert_allclose(
        math.learning_rate_decay(100, 1e-2, 1e-4, 100), 1e-4, rtol=1e-5
    )


def test_learning_rate_decay_warmup():
    lr0 = math.learning_rate_decay(0, 1e-2, 1e-4, 100, lr_delay_steps=10, lr_delay_mult=0.01)
    np.testing.assert_allclose(lr0, 1e-4, rtol=1e-5)  # 0.01 * lr_init


def test_sorted_lookup_matches_searchsorted():
    rng = np.random.RandomState(0)
    xp = np.sort(rng.rand(4, 8), axis=-1)
    x = rng.rand(4, 16)
    fp = rng.rand(4, 8)
    (idx0, idx1), ((fp0, fp1),) = math.sorted_lookup(
        jnp.array(x), jnp.array(xp), (jnp.array(fp),)
    )
    for b in range(4):
        idx = np.searchsorted(xp[b], x[b], side="right")
        ref0 = np.maximum(idx - 1, 0)
        ref1 = np.minimum(idx, xp.shape[-1] - 1)
        np.testing.assert_array_equal(idx0[b], ref0)
        np.testing.assert_array_equal(idx1[b], ref1)
        np.testing.assert_allclose(fp0[b], fp[b][ref0])
        np.testing.assert_allclose(fp1[b], fp[b][ref1])


def test_sorted_interp_matches_interp():
    rng = np.random.RandomState(1)
    xp = np.sort(rng.rand(3, 6), axis=-1)
    fp = np.sort(rng.rand(3, 6), axis=-1)
    x = rng.rand(3, 10)
    got = math.sorted_interp(jnp.array(x), jnp.array(xp), jnp.array(fp))
    for b in range(3):
        ref = np.interp(x[b], xp[b], fp[b])
        np.testing.assert_allclose(got[b], ref, atol=1e-6)


def test_interp_matches_numpy():
    rng = np.random.RandomState(2)
    xp = np.sort(rng.rand(2, 5), axis=-1)
    fp = rng.rand(2, 5)
    x = rng.rand(2, 7) * 1.4 - 0.2  # includes out-of-range queries
    got = math.interp(jnp.array(x), jnp.array(xp), jnp.array(fp))
    for b in range(2):
        np.testing.assert_allclose(got[b], np.interp(x[b], xp[b], fp[b]), atol=1e-6)


def test_override_gradient():
    f = lambda x: math.override_gradient(x**2, 3 * x).sum()
    x = jnp.array([2.0])
    assert math.override_gradient(x**2, 3 * x)[0] == 4.0
    np.testing.assert_allclose(jax.grad(f)(x), [3.0])


def test_cholesky3_matches_lax():
    rng = np.random.RandomState(3)
    a = rng.randn(10, 3, 3)
    a = a @ np.transpose(a, (0, 2, 1)) + 3 * np.eye(3)
    got = math.cholesky3(jnp.array(a))
    ref = np.linalg.cholesky(a)
    np.testing.assert_allclose(got, ref, atol=1e-4)
