"""Barron's general and adaptive robust loss.

Behavioral parity target: reference third_party/robust_loss_jax/general.py
(lossfun) — rho(x, alpha, scale), the shape-interpolating robust loss:
alpha=2 is L2, alpha=1 is Charbonnier/pseudo-Huber, alpha=0 is Cauchy,
alpha=-2 is Geman-McClure, alpha→-inf is Welsch. Implemented with the
standard numerically-stable special-casing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.ops import math


def lossfun(x, alpha, scale, eps=1e-6):
    """rho(x, alpha, scale) (general.py lossfun parity).

    Args:
      x: residuals, any shape.
      alpha: shape parameter (broadcastable); may be +/-inf.
      scale: scale c > 0 (broadcastable).

    Returns:
      loss, same shape as broadcast(x, alpha, scale).
    """
    x, alpha, scale = jnp.broadcast_arrays(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(scale, jnp.float32),
    )
    sq = (x / scale) ** 2

    # Stable branches for the special alphas.
    loss_two = 0.5 * sq
    loss_zero = jnp.log1p(jnp.minimum(0.5 * sq, 3e37))
    loss_neginf = -jnp.expm1(-0.5 * sq)
    loss_posinf = jnp.expm1(jnp.minimum(0.5 * sq, 87.5))

    # General case, computed safely away from the removable singularities.
    b = jnp.abs(alpha - 2) + eps
    d = jnp.where(alpha >= 0, alpha + eps, alpha - eps)
    loss_general = (b / d) * ((sq / b + 1) ** (0.5 * d) - 1)

    return jnp.where(
        alpha == -jnp.inf, loss_neginf,
        jnp.where(
            alpha == 0, loss_zero,
            jnp.where(
                alpha == 2, loss_two,
                jnp.where(alpha == jnp.inf, loss_posinf, loss_general),
            ),
        ),
    )


def charbonnier(x, scale=1.0, padding=1e-3):
    """alpha=1 closed form: sqrt((x/c)^2 + padding^2) (up to constants)."""
    return jnp.sqrt((x / scale) ** 2 + padding**2)


def smape(a, b, eps=1e-6):
    """Symmetric mean absolute percentage residual
    (inverse_render/math.py parity)."""
    return jnp.abs(a - b) / (jnp.abs(a) + jnp.abs(b) + eps)
