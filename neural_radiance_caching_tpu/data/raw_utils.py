"""RawNeRF raw-image processing.

Behavioral parity target: reference internal/raw_utils.py — the compute
pipeline (bilinear Bayer demosaicking, Bayer masks, minimal raw→sRGB
postprocessing, EXIF-driven exposure math, affine metric matching) is
implemented in full; DNG decoding (`load_raw_images`) runs through the
from-scratch TIFF/LJPEG reader in `data/dng.py` (rawpy/libraw is not
installed in this environment).
"""

from __future__ import annotations

import numpy as np

from neural_radiance_caching_tpu.ops import image as image_lib


def postprocess_raw(raw, camtorgb, exposure=None, xnp=np):
    """Demosaicked raw -> sRGB: color matrix, expose-to-white, gamma
    (raw_utils.py:41-75)."""
    if raw.shape[-1] != 3:
        raise ValueError(f"raw.shape[-1] is {raw.shape[-1]}, expected 3")
    if camtorgb.shape != (3, 3):
        raise ValueError(f"camtorgb.shape is {camtorgb.shape}, expected (3, 3)")
    rgb_linear = raw @ xnp.asarray(camtorgb).T
    if exposure is None:
        exposure = xnp.percentile(rgb_linear, 97)
    rgb_linear_scaled = xnp.clip(rgb_linear / exposure, 0, 1)
    return image_lib.linear_to_srgb(rgb_linear_scaled)


def pixels_to_bayer_mask(pix_x, pix_y):
    """Binary RGB Bayer mask values from integer pixel coordinates
    (RGGB: red at (0,0))."""
    r = (pix_x % 2 == 0) * (pix_y % 2 == 0)
    g = (pix_x % 2 == 1) * (pix_y % 2 == 0) + (pix_x % 2 == 0) * (pix_y % 2 == 1)
    b = (pix_x % 2 == 1) * (pix_y % 2 == 1)
    return np.stack([r, g, b], -1).astype(np.float32)


def bilinear_demosaic(bayer, xnp=np):
    """RGGB Bayer mosaic [H, W] -> bilinear RGB [H, W, 3]
    (raw_utils.py:88-157)."""

    def reshape_quads(*planes):
        planes = xnp.stack(planes, -1)
        shape = planes.shape[:-1]
        zup = planes.reshape(shape + (2, 2))
        zup = xnp.transpose(zup, (0, 2, 1, 3))
        return zup.reshape((shape[0] * 2, shape[1] * 2))

    def bilinear_upsample(z):
        zx = 0.5 * (z + xnp.roll(z, -1, axis=-1))
        zy = 0.5 * (z + xnp.roll(z, -1, axis=-2))
        zxy = 0.5 * (zx + xnp.roll(zx, -1, axis=-2))
        return reshape_quads(z, zx, zy, zxy)

    def upsample_green(g1, g2):
        z = xnp.zeros_like(g1)
        z = reshape_quads(z, g1, g2, z)
        alt = 0
        for i in range(4):
            axis = -1 - (i // 2)
            roll = -1 + 2 * (i % 2)
            alt = alt + 0.25 * xnp.roll(z, roll, axis=axis)
        return alt + z

    r, g1, g2, b = [bayer[(i // 2) :: 2, (i % 2) :: 2] for i in range(4)]
    r = bilinear_upsample(r)
    b = bilinear_upsample(b[::-1, ::-1])[::-1, ::-1]
    g = upsample_green(g1, g2)
    return xnp.stack([r, g, b], -1)


def bilinear_demosaic_jax(bayer):
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda x: bilinear_demosaic(x, xnp=jnp))(bayer)


def best_fit_affine(x, y, axis):
    """Least-squares a, b with a * x + b = y (raw_utils.py:401-410)."""
    x_m = x.mean(axis=axis)
    y_m = y.mean(axis=axis)
    xy_m = (x * y).mean(axis=axis)
    xx_m = (x * x).mean(axis=axis)
    a = (xy_m - x_m * y_m) / (xx_m - x_m * x_m)
    b = y_m - a * x_m
    return a, b


def match_images_affine(est, gt, axis=(0, 1)):
    """Affine-match est to gt for raw-mode metrics (raw_utils.py:413-421)."""
    a, b = best_fit_affine(gt, est, axis=axis)
    return (est - b) / a


def process_exif(exifs):
    """Per-image exposure values (shutter * ISO / 1000) from EXIF dicts
    (raw_utils.py:225-282, simplified to the fields the loaders use)."""
    shutters = np.array(
        [float(e.get("ShutterSpeed", e.get("ExposureTime", 1.0))) for e in exifs]
    )
    isos = np.array([float(e.get("ISO", e.get("ISOSpeedRatings", 100.0))) for e in exifs])
    exposures = shutters * isos / 1000.0
    return {
        "ShutterSpeed": shutters,
        "ISO": isos,
        "exposures": exposures,
        "max_exposure": float(exposures.max()),
    }


def load_raw_images(image_dir, image_names=None):
    """Load DNG raw mosaics + EXIF JSON sidecars from a directory.

    Behavioral parity target: reference internal/raw_utils.py:160-199 —
    returns (raws [N, H, W] float32 sensor mosaics, exifs [N] list of dicts).
    The DNG decode is the from-scratch reader in `data/dng.py` (rawpy is
    unavailable here); EXIF sidecars are the `exiftool -json` files the
    reference pipeline produces next to each .dng.
    """
    import glob
    import json
    import os

    from neural_radiance_caching_tpu.data import dng as dng_lib

    if not os.path.isdir(image_dir):
        raise ValueError(f"Raw image folder {image_dir} does not exist.")
    if image_names is None:
        image_names = [
            os.path.basename(f)
            for f in sorted(glob.glob(os.path.join(image_dir, "*.dng")))
        ]
    raws, exifs = [], []
    for name in image_names:
        base = os.path.join(image_dir, os.path.splitext(name)[0])
        raws.append(dng_lib.read_dng(base + ".dng"))
        with open(base + ".json", "rb") as f:
            exif = json.load(f)
            exifs.append(exif[0] if isinstance(exif, list) else exif)
    return np.stack(raws, axis=0).astype(np.float32), exifs
