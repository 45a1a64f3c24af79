"""Small JAX helpers: RNG threading and partial stop-gradients.

Behavioral parity targets: reference internal/utils.py:87-123.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_split(rng):
    """Split an (optional) PRNG key; None stays None for deterministic paths."""
    if rng is None:
        return None, None
    key, rng = jax.random.split(rng)
    return key, rng


def copy_tree(tree):
    """Shallow-copy a pytree container structure (leaves are shared)."""
    return jax.tree_util.tree_map(lambda x: x, tree)


def stopgrad_with_weight(x, weight):
    """Lerp between x and stop_gradient(x): weight=1 keeps grads, 0 blocks them.

    Mirrors reference internal/utils.py:87-95. Integer arrays and None weights
    pass through untouched.
    """
    if x is None or weight is None:
        return x
    if not isinstance(x, jnp.ndarray) or jnp.issubdtype(x.dtype, jnp.integer):
        return x
    if not isinstance(weight, jnp.ndarray):
        if weight == 1.0:
            return x
        if weight == 0.0:
            return jax.lax.stop_gradient(x)
    return (x - jax.lax.stop_gradient(x)) * weight + jax.lax.stop_gradient(x)


def partial_stopgrad_rays(rays, weight):
    """Apply stopgrad_with_weight(w[0]) to every array field of a Rays pytree."""
    if weight is None or weight == (1.0, 1.0):
        return rays
    return jax.tree_util.tree_map(
        lambda x: stopgrad_with_weight(x, weight[0]) if x is not None else x, rays
    )


def apply_stopgrad_fields(results, mapping):
    """Apply per-key stopgrad weights to a dict of outputs."""
    return {
        k: stopgrad_with_weight(v, mapping[k]) if k in mapping else v
        for k, v in results.items()
    }
