"""Reflection directions and (integrated) directional encodings.

Behavioral parity target: reference internal/ref_utils.py. The IDE is the
Ref-NeRF encoding (Eqs. 6-8 of arxiv.org/abs/2112.03907); it is evaluated as
two dense Vandermonde matmuls, which map directly onto the TPU MXU.
"""

from __future__ import annotations

import math as pymath

import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.ops import math


def reflect(viewdirs, normals):
    """Reflect v about unit n: u = 2 (n·v) n − v."""
    return 2.0 * jnp.sum(normals * viewdirs, axis=-1, keepdims=True) * normals - viewdirs


def l2_normalize(x, grad_eps=np.finfo(np.float32).eps, tiny=np.finfo(np.float32).tiny):
    """Unit-normalize with a larger denominator clamp in the backward pass.

    Forward clamps the squared norm at ~1e-38 (value stays unit-norm); the
    gradient path clamps at grad_eps to avoid exploding gradients near zero
    (ref_utils.py:45-70). Zero vectors map to zero.
    """
    grad_eps = max(tiny, grad_eps)
    denom_sq = jnp.sum(x**2, axis=-1, keepdims=True)
    val = x / jnp.sqrt(jnp.maximum(tiny, denom_sq))
    grad = x / jnp.sqrt(jnp.maximum(grad_eps, denom_sq))
    out = math.override_gradient(val, grad)
    return jnp.where(denom_sq < tiny, jnp.zeros_like(out), out)


def compute_weighted_mae(weights, normals, normals_gt):
    """Weighted mean angular error in degrees (unit normals assumed)."""
    angles = math.safe_arccos((normals * normals_gt).sum(axis=-1))
    return (180.0 / jnp.pi) * ((weights * angles).sum() / weights.sum())


def orientation_loss(w, n, v):
    """Penalize normals facing away from the camera (ref_utils.py:213-216)."""
    n_dot_v = (n * v[..., None, :]).sum(axis=-1)
    return jnp.mean((w * jnp.minimum(0.0, n_dot_v) ** 2).sum(axis=-1))


def _gen_binomial(a, k):
    return np.prod(a - np.arange(k)) / pymath.factorial(k)


def _assoc_legendre_coeff(l, m, k):  # noqa: E741
    return (
        (-1) ** m
        * 2**l
        * pymath.factorial(l)
        / pymath.factorial(k)
        / pymath.factorial(l - k - m)
        * _gen_binomial(0.5 * (l + k + m - 1.0), l)
    )


def _sph_harm_coeff(l, m, k):  # noqa: E741
    return (
        np.sqrt(
            (2.0 * l + 1.0) * pymath.factorial(l - m) / (4.0 * np.pi * pymath.factorial(l + m))
        )
        * _assoc_legendre_coeff(l, m, k)
    )


def _ml_array(deg_view):
    ml = []
    for i in range(deg_view):
        l = 2**i  # noqa: E741
        ml.extend((m, l) for m in range(l + 1))
    return np.array(ml).T


def generate_ide_fn(deg_view):
    """Build the integrated directional encoding for vMF-blurred directions."""
    if deg_view > 5:
        raise ValueError("Only deg_view of at most 5 is numerically stable.")
    ml = _ml_array(deg_view)
    l_max = 2 ** (deg_view - 1)

    mat = np.zeros((l_max + 1, ml.shape[1]))
    for i, (m, l) in enumerate(ml.T):  # noqa: E741
        for k in range(l - m + 1):
            mat[k, i] = _sph_harm_coeff(l, m, k)

    def ide_fn(xyz, kappa_inv):
        """xyz: [..., 3] directions; kappa_inv: [..., 1] 1/vMF-concentration."""
        x, y, z = xyz[..., 0:1], xyz[..., 1:2], xyz[..., 2:3]
        vmz = jnp.concatenate([z**i for i in range(mat.shape[0])], axis=-1)
        vmxy = jnp.concatenate([(x + 1j * y) ** m for m in ml[0, :]], axis=-1)
        sph_harms = vmxy * math.matmul(vmz, mat)
        sigma = 0.5 * ml[1, :] * (ml[1, :] + 1)
        ide = sph_harms * jnp.exp(-sigma * kappa_inv)
        return jnp.concatenate([jnp.real(ide), jnp.imag(ide)], axis=-1)

    return ide_fn


def generate_dir_enc_fn(deg_view):
    """Directional encoding = IDE at zero concentration spread."""
    ide_fn = generate_ide_fn(deg_view)
    return lambda xyz: ide_fn(xyz, jnp.zeros_like(xyz[..., :1]))
