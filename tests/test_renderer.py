"""Unit tests for the chunked host render pipeline (engine/renderer.py):
padding, one-ahead dispatch ordering, Welford repeats, key filtering, and
the fast (compute_extras=False / keys=rgb) preview path."""

import numpy as np
import jax
import jax.numpy as jnp

from neural_radiance_caching_tpu.engine import renderer
from neural_radiance_caching_tpu.utils import pytrees


class _Cfg:
    render_chunk_size = 8
    debug_mode = False


def _rays(n):
    rays = pytrees.dummy_rays(n)
    # Make origins identifying so output placement is checkable.
    origins = np.zeros((n, 3), np.float32)
    origins[:, 0] = np.arange(n)
    return rays.replace(origins=jnp.asarray(origins))


def test_render_image_chunking_and_order():
    calls = []

    def render_fn(variables, rng, train_frac, rays):
        calls.append(int(rays.origins.shape[0]))
        return {
            "rgb": jnp.tile(rays.origins[:, :1], (1, 3)),
            "depth": rays.origins[:, 0],
            "skipme": jnp.zeros((3,)),  # wrong leading dim: dropped
        }

    n = 21  # 3 chunks: 8 + 8 + 5 (padded to 8)
    out = renderer.render_image(
        render_fn, {}, _rays(n), jax.random.PRNGKey(0), _Cfg(),
    )
    assert calls == [8, 8, 8]
    assert out["rgb"].shape == (n, 3)
    np.testing.assert_allclose(out["rgb"][:, 0], np.arange(n), atol=1e-6)
    assert "skipme" not in out
    # height/width reshape
    out_hw = renderer.render_image(
        render_fn, {}, _rays(24), jax.random.PRNGKey(0), _Cfg(),
        height=4, width=6,
    )
    assert out_hw["rgb"].shape == (4, 6, 3)


def test_render_image_keys_filter():
    fetched = []

    def render_fn(variables, rng, train_frac, rays):
        return {
            "rgb": jnp.ones((rays.origins.shape[0], 3)),
            "huge_aov": jnp.ones((rays.origins.shape[0], 64)),
        }

    out = renderer.render_image(
        render_fn, {}, _rays(8), jax.random.PRNGKey(0), _Cfg(),
        keys=("rgb",),
    )
    assert set(out.keys()) == {"rgb"}


def test_render_image_welford_repeats():
    # Per-repeat outputs vary with the folded rng; the mean/variance over
    # repeats must match a direct computation with the same fold sequence.
    def render_fn(variables, rng, train_frac, rays):
        noise = jax.random.normal(rng, (rays.origins.shape[0], 3))
        return {"rgb": noise}

    rng = jax.random.PRNGKey(3)
    reps = 5
    out = renderer.render_image(
        render_fn, {}, _rays(8), rng, _Cfg(), render_repeats=reps,
    )
    samples = np.stack([
        np.asarray(jax.random.normal(jax.random.fold_in(rng, 0 * 131 + r), (8, 3)))
        for r in range(reps)
    ])
    np.testing.assert_allclose(out["rgb"], samples.mean(0), rtol=1e-5)
    np.testing.assert_allclose(
        out["rgb_variance"], samples.var(0, ddof=1), rtol=1e-4)


def test_render_image_empty_and_single_chunk():
    def render_fn(variables, rng, train_frac, rays):
        return {"rgb": jnp.zeros((rays.origins.shape[0], 3))}

    out = renderer.render_image(
        render_fn, {}, _rays(4), jax.random.PRNGKey(0), _Cfg(),
    )
    assert out["rgb"].shape == (4, 3)
