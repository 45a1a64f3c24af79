"""Environment map loading + importance-sampling tables.

Behavioral parity target: reference internal/datasets.py OpenIllum /
GlossySynthetic env-map blocks (:2113-2154, :2855-2920): an equirectangular
HDR becomes (rgb, pmf, pdf, dirs) tables that the material shader's
EnvironmentSampler importance-samples at secondary-ray time.

The pmf is sin(θ)-weighted intensity normalized over pixels; the pdf is the
solid-angle density pmf·H·W/(2π²·sinθ).
"""

from __future__ import annotations

import numpy as np


def build_env_map_tables(env_map_rgb: np.ndarray, y_up: bool = False,
                         rotation: float = 0.0):
    """Returns dict(env_map, env_map_pmf, env_map_pdf, env_map_dirs, h, w).

    env_map_rgb: [H, W, 3] linear radiance (equirectangular, lat-long).
    """
    light_intensity = env_map_rgb.sum(axis=-1, keepdims=True)  # [H, W, 1]
    h, w, _ = light_intensity.shape
    h_interval = 1.0 / h
    sin_theta = np.sin(
        np.linspace(0 + 0.5 * h_interval, np.pi - 0.5 * h_interval, h)
    )

    pmf = light_intensity * sin_theta.reshape(-1, 1, 1)
    pmf = pmf / pmf.sum()
    pdf = pmf * h * w / (2 * np.pi * np.pi * sin_theta.reshape(-1, 1, 1))

    lat_step = np.pi / h
    lng_step = 2 * np.pi / w
    phi, theta = np.meshgrid(
        np.linspace(np.pi / 2 - 0.5 * lat_step, -np.pi / 2 + 0.5 * lat_step, h),
        np.linspace(np.pi - 0.5 * lng_step, -np.pi + 0.5 * lng_step, w),
        indexing="ij",
    )
    theta = theta + rotation

    x = np.cos(theta) * np.cos(phi)
    y = np.sin(theta) * np.cos(phi)
    z = np.sin(phi)
    if y_up:
        x, y, z = x, z, -y
    dirs = np.stack([x, y, z], axis=-1).reshape(h, w, 3)

    return {
        "env_map": env_map_rgb.reshape(1, h * w, 1, 3).astype(np.float32),
        "env_map_pmf": pmf.reshape(1, h * w, 1).astype(np.float32),
        "env_map_pdf": pdf.reshape(1, h * w, 1).astype(np.float32),
        "env_map_dirs": dirs.reshape(1, h * w, 1, 3).astype(np.float32),
        "env_map_h": h,
        "env_map_w": w,
    }


def load_env_map(path: str, scale: float = 1.0, downsample: int = 1,
                 y_up: bool = False, flip: bool = False):
    """Load an .hdr/.exr environment map and build sampling tables."""
    from neural_radiance_caching_tpu.data import io as io_lib

    if path.endswith(".exr"):
        rgb = io_lib.load_exr(path)[..., :3]
    else:
        rgb = io_lib.read_hdr(path)
    rgb = np.asarray(rgb, np.float32) * scale
    if downsample > 1:
        rgb = io_lib.downsample(rgb, downsample)
    if flip:
        rgb = rgb[::-1, ::-1]
    return build_env_map_tables(rgb, y_up=y_up)
