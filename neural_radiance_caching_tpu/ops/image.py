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
    """PSNR/SSIM/LPIPS harness (reference internal/image.py:400-500).

    LPIPS is the pure-JAX VGG implementation in ops/lpips.py. Calibrated
    weights are searched at the documented paths (see that module); when
    absent, the harness scores with the deterministic UNCALIBRATED fallback
    (fixed-seed untrained VGG, lpips.fallback_params) and flags the output
    with `lpips_calibrated = 0.0` so tables can't silently mix the two
    regimes. Tests can inject `lpips_params` explicitly (e.g.
    lpips.synthesize_params()) to exercise the path.
    """

    def __init__(self, disable_lpips=False, lpips_params=None,
                 lpips_weights_path=None, **kwargs):
        del kwargs
        self._ssim_fn = jax.jit(ssim)
        self._lpips_params = None
        if not disable_lpips:
            from neural_radiance_caching_tpu.ops import lpips as lpips_lib

            if lpips_params is not None:
                self._lpips_params = lpips_params
            else:
                self._lpips_params = lpips_lib.default_params(lpips_weights_path)
            self._lpips_fn = lpips_lib.lpips

    def __call__(self, rgb_pred, rgb_gt, name_fn=lambda s: s):
        psnr_val = float(psnr(rgb_pred, rgb_gt))
        ssim_val = float(self._ssim_fn(rgb_pred, rgb_gt))
        out = {name_fn("psnr"): psnr_val, name_fn("ssim"): ssim_val}
        if self._lpips_params is not None:
            lpips_val = float(
                self._lpips_fn(self._lpips_params, rgb_pred, rgb_gt)
            )
            out[name_fn("lpips")] = lpips_val
            out[name_fn("lpips_calibrated")] = float(
                bool(self._lpips_params.get("calibrated", False))
            )
            # Geometric mean of MSE, sqrt(DSSIM), LPIPS (image.py:496-506).
            mse = float(np.exp(-0.1 * np.log(10.0) * psnr_val))
            sqrt_dssim = float(np.sqrt((1.0 - ssim_val) / 2.0))
            out[name_fn("avg_err")] = float(
                np.exp(np.mean(np.log([mse, sqrt_dssim, max(lpips_val, 1e-12)])))
            )
        return out


def rgb_to_yuv(rgb):
    """RGB -> YUV (tf.image.rgb_to_yuv kernel; image.py:40-47)."""
    mat = jnp.array([
        [0.299, -0.14714119, +0.61497538],
        [0.587, -0.28886916, -0.51496512],
        [0.114, +0.43601035, -0.10001026],
    ])
    return rgb @ mat


def downsample(img, factor):
    """Area downsample (factor must divide both spatial dims; image.py:214)."""
    sh = img.shape
    if sh[0] % factor or sh[1] % factor:
        raise ValueError(f"factor {factor} does not divide image shape {sh[:2]}")
    img = img.reshape((sh[0] // factor, factor, sh[1] // factor, factor) + sh[2:])
    return img.mean((1, 3))


def compute_vignette(coords, weights, powers=(1, 2, 3)):
    """Polynomial vignetting of image-plane radius (image.py:227-233)."""
    radius_squared = jnp.sum(jnp.square(coords), axis=-1)
    features = radius_squared[..., None] ** jnp.array(powers)
    return jnp.exp(-jnp.sum(jnp.abs(weights) * features[..., None], axis=-2))


def precompute_nlinear_weights(coords, grid_shape):
    """n-linear interpolation corner indices + weights (image.py:247-295)."""
    import itertools

    if coords.shape[-1] != len(grid_shape):
        raise ValueError(
            f"coord dim {coords.shape} does not match grid dim {len(grid_shape)}"
        )
    idx0 = jnp.maximum(
        0,
        jnp.minimum(jnp.floor(coords).astype(jnp.int32), jnp.array(grid_shape) - 1),
    )
    weight0 = 1.0 - (coords - idx0.astype(coords.dtype))
    idxs, weights = [], []
    for bits in itertools.product([0, 1], repeat=len(grid_shape)):
        bits = jnp.array(bits)
        idxs.append(idx0 + bits)
        weights.append(jnp.prod(weight0 * (1 - 2 * bits) + bits, 1))
    return idxs, weights


def splat_to_grid(idxs, weights, hist, values):
    """Splat values into hist at precomputed n-linear corners."""
    hist_idxs = tuple(jnp.concatenate(idxs).T)
    splat_vals = jnp.concatenate([w * values for w in weights])
    return hist.at[hist_idxs].add(splat_vals)


def slice_from_grid(idxs, weights, hist):
    """Slice values out of hist at precomputed n-linear corners."""
    return sum(w * hist[tuple(i.T)] for w, i in zip(weights, idxs))


def correct_local_color(im, im_true, *, num_spatial_bins, num_luma_bins,
                        num_chroma_bins, lstsq_eps=1e-5):
    """Bilateral-grid affine color matching of `im` to `im_true`
    (image.py:308-409): fits a spatially/bilaterally varying per-pixel affine
    transform so metrics ignore low-frequency photometric variation."""
    if (len(im.shape) != 3) or (im.shape[2] != 3) or (im.shape != im_true.shape):
        raise ValueError(f"Invalid input image shapes {im.shape}, {im_true.shape}")

    color_grid_shape = [num_luma_bins] + [num_chroma_bins] * 2
    im_yuv = rgb_to_yuv(im) + jnp.array([0.0, 0.5, 0.5])
    coords_color = im_yuv * (jnp.array(color_grid_shape) - 1)
    # Full-resolution spatial coordinates scaled into the bin grid.
    coords_spatial = jnp.stack(
        jnp.meshgrid(
            *[
                jnp.linspace(0, r - 1, s)
                for s, r in zip(im.shape[:-1], num_spatial_bins)
            ],
            indexing="ij",
        ),
        axis=-1,
    )
    coords = jnp.concatenate([coords_color, coords_spatial], axis=-1).reshape(
        [-1, 5]
    )
    grid_shape = color_grid_shape + list(num_spatial_bins)

    idxs, weights = precompute_nlinear_weights(coords, grid_shape)

    im1 = jnp.concatenate([im, jnp.ones_like(im[..., :1])], axis=-1)
    a_mat = im1.reshape([-1, 4])
    b_vec = im_true.reshape([-1, 3])

    w_sq = [w**2 for w in weights]
    splat_fn = lambda x: splat_to_grid(idxs, w_sq, jnp.zeros(grid_shape), x)
    splat_fn = jax.vmap(
        jax.vmap(splat_fn, in_axes=-1, out_axes=-1), in_axes=-1, out_axes=-1
    )

    aa_mat = a_mat[..., None] * a_mat[..., None, :]
    ab_mat = a_mat[..., None] * b_vec[..., None, :]
    lhs = splat_fn(aa_mat) + lstsq_eps * jnp.eye(4, 4)
    rhs = splat_fn(ab_mat)

    affine_grid = jnp.vectorize(
        lambda x, y: jnp.linalg.lstsq(x, y)[0], signature="(4,4),(4,3)->(4,3)"
    )(lhs, rhs)

    slice_fn = lambda x: slice_from_grid(idxs, weights, x)
    slice_fn = jax.vmap(
        jax.vmap(slice_fn, in_axes=-1, out_axes=-1), in_axes=-1, out_axes=-1
    )
    affine_im = slice_fn(affine_grid).reshape(im.shape[:-1] + (4, 3))

    im_clc = jnp.vectorize(jnp.matmul, signature="(4),(4,3)->(3)")(im1, affine_im)
    return jnp.clip(im_clc, 0, 1)


def compute_shift_invariant_metric(im0, im1, metric_fn, reduction, search_radii,
                                   window_halfwidth, boundary="reflect"):
    """Shift-invariant wrapper over a per-pixel metric (image.py:70-163)."""
    from flax import linen as nn

    if (len(im0.shape) != 3) or (im0.shape[2] != 3) or (im0.shape != im1.shape):
        raise ValueError(f"Invalid input image shapes {im0.shape}, {im1.shape}")
    i_radius, j_radius = search_radii
    im0_pad = jnp.pad(im0, [[i_radius] * 2, [j_radius] * 2, (0, 0)], boundary)

    opt_metric_pooled = None
    opt_metric = opt_di = opt_dj = None
    for di in range(-i_radius, i_radius + 1):
        for dj in range(-j_radius, j_radius + 1):
            im0_rolled = jnp.roll(jnp.roll(im0_pad, -di, 0), -dj, 1)
            im0_cropped = im0_rolled[
                i_radius : im0_rolled.shape[0] - i_radius,
                j_radius : im0_rolled.shape[1] - j_radius,
                :,
            ]
            metric = metric_fn(im0_cropped, im1)
            metric_pooled = nn.avg_pool(
                metric[None, :, :, None],
                (2 * window_halfwidth + 1,) * 2,
                padding="same",
            )[0, :, :, 0]
            if opt_metric_pooled is None:
                opt_metric_pooled, opt_metric = metric_pooled, metric
                opt_di, opt_dj = di, dj
            else:
                if reduction == "argmax":
                    take = metric_pooled >= opt_metric_pooled
                elif reduction == "argmin":
                    take = metric_pooled <= opt_metric_pooled
                else:
                    raise ValueError("reduction must be 'argmax' or 'argmin'")
                opt_metric_pooled = jnp.where(take, metric_pooled, opt_metric_pooled)
                opt_metric = jnp.where(take, metric, opt_metric)
                opt_di = jnp.where(take, di, opt_di)
                opt_dj = jnp.where(take, dj, opt_dj)
    return opt_metric, opt_di, opt_dj


def shift_invariant_mse(img0, img1, *args):
    """Shift-invariant MSE (image.py:185-191)."""
    err_fn = lambda x, y: jnp.mean((x - y) ** 2, axis=-1)
    opt, di, dj = compute_shift_invariant_metric(img0, img1, err_fn, "argmin", *args)
    return jnp.mean(opt), di, dj


def shift_invariant_ssim(img0, img1, *args):
    """Shift-invariant SSIM (image.py:169-182)."""
    pad = 5  # SSIM uses an 11x11 window.

    def score_fn(x, y):
        pad_fn = lambda z: jnp.pad(z, [[pad] * 2, [pad] * 2, [0] * 2], mode="reflect")
        return jnp.mean(ssim(pad_fn(x), pad_fn(y), return_map=True), axis=-1)

    opt, di, dj = compute_shift_invariant_metric(img0, img1, score_fn, "argmax", *args)
    return jnp.mean(opt[pad:-pad, pad:-pad]), di, dj
