"""Volume integrators: composite shader samples into per-ray renderings.

Behavioral parity target: reference internal/integration.py.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.ops import coord, image, math, render
from neural_radiance_caching_tpu.utils import jaxutil

# Keys composited by alpha blending when present in shader results.
_EXTRAS_TO_RENDER = [
    "lighting_irradiance",
    "material_albedo",
    "material_roughness",
    "material_F_0",
    "material_metalness",
    "material_diffuseness",
    "material_mirrorness",
    "means",
    "normals",
    "normals_pred",
    "normals_to_use",
    "normals_shading",
    "irradiance_cache",
    "irradiance_cache_rgb",
    "incoming_rgb",
    "incoming_s_dist",
    "person_rgb",
    "person_alpha",
    "diffuse_rgb",
    "specular_rgb",
    "occ",
    "indirect_occ",
    "direct_rgb",
    "indirect_rgb",
    "ambient_rgb",
    "irradiance_rgb",
    "light_radiance_rgb",
    "n_dot_l_rgb",
    "albedo_rgb",
    "direct_diffuse_rgb",
    "direct_specular_rgb",
    "indirect_diffuse_rgb",
    "indirect_specular_rgb",
    "ambient_diffuse_rgb",
    "ambient_specular_rgb",
    "light_dists",
    "ray_dists",
    "transient_indirect",
    "transient_indirect_specular",
    "transient_indirect_diffuse",
    "impulse_response",
]

_EXTRAS_TO_ALWAYS_RENDER = [
    k
    for k in _EXTRAS_TO_RENDER
    if k
    not in (
        "material_albedo",
        "material_roughness",
        "material_F_0",
        "material_metalness",
        "material_diffuseness",
        "material_mirrorness",
        "normals_shading",
        "incoming_rgb",
        "incoming_s_dist",
        "person_rgb",
        "person_alpha",
    )
] + ["beta"]


@gin.configurable
class VolumeIntegrator(nn.Module):
    """Alpha-composite shader results; optional color-correction net."""

    config: Any = None
    bg_intensity_range: Tuple[float, float] = (1.0, 1.0)

    use_color_net: bool = False
    net_activation: Callable[..., Any] = nn.relu
    net_depth: int = 4
    net_width: int = 256
    skip_layer: int = 2
    deg_view: int = 4
    deg_origins: int = 4
    normalize_weights: bool = False

    def setup(self):
        dense = functools.partial(
            nn.Dense, kernel_init=jax.nn.initializers.he_uniform()
        )
        self.layers = [dense(self.net_width, name=f"layer_{i}") for i in range(self.net_depth)]
        self.output_layer = dense(3, name="output_layer")

    def run_color_network(self, viewdirs, origins):
        x = jnp.concatenate(
            [
                coord.pos_enc(viewdirs, 0, self.deg_view, True),
                coord.pos_enc(origins, 0, self.deg_origins, True),
            ],
            axis=-1,
        )
        inputs = x
        for i in range(self.net_depth):
            x = self.net_activation(self.layers[i](x))
            if i % self.skip_layer == 0 and i > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        return self.output_layer(x)

    def _background(self, rng, shader_results, bg_intensity_range):
        """Returns (bg_rgbs, random_background)."""
        if bg_intensity_range[0] == bg_intensity_range[1]:
            return bg_intensity_range[0], False
        if rng is None:
            return ((bg_intensity_range[0] + bg_intensity_range[1]) / 2) * 0.0, False
        key, rng = jaxutil.random_split(rng)
        bg = jax.random.normal(key, shape=shader_results["weights"].shape[:-1] + (3,)) * (
            bg_intensity_range[1] - bg_intensity_range[0]
        )
        return bg, True

    @nn.compact
    def __call__(
        self,
        rng,
        rays,
        shader_results,
        train_frac=1.0,
        train=True,
        percentiles=(5, 50, 95),
        linear_rgb=False,
        compute_extras=False,
        compute_distance=True,
        bg_intensity_range=None,
        vignette=None,
        **kwargs,
    ):
        if bg_intensity_range is None:
            bg_intensity_range = self.bg_intensity_range
        bg_rgbs, random_background = self._background(rng, shader_results, bg_intensity_range)

        if "batch" in kwargs and kwargs["batch"] is not None:
            shader_results["rgb"] = jnp.minimum(
                kwargs["batch"].rgb[..., :3].reshape(shader_results["rgb"].shape[:-2] + (-1, 3)),
                shader_results["rgb"],
            )

        extras_keys = _EXTRAS_TO_RENDER if compute_extras else _EXTRAS_TO_ALWAYS_RENDER
        rendering = render.volumetric_rendering(
            shader_results["rgb"],
            shader_results["weights"],
            shader_results["weights_no_filter"],
            shader_results["tdist"],
            bg_rgbs,
            compute_extras,
            extras={k: v for k, v in shader_results.items() if k in extras_keys},
            percentiles=percentiles,
            compute_distance=compute_distance,
        )

        if random_background:
            rendering["bg_noise"] = (
                1.0 - shader_results["weights"].sum(axis=-1, keepdims=True)
            ) * bg_rgbs
            rendering["rgb"] = rendering["rgb"] - rendering["bg_noise"]

        if self.use_color_net and not linear_rgb:
            correction = math.safe_exp(self.run_color_network(rays.viewdirs, rays.origins))
            rendering["rgb"] = rendering["rgb"] * correction

        if vignette is not None:
            rendering["rgb"] = rendering["rgb"] * vignette

        if not linear_rgb and self.config.linear_to_srgb and rendering["rgb"] is not None:
            rendering["rgb"] = jnp.clip(image.linear_to_srgb(rendering["rgb"]), 0.0, float("inf"))

        if "beta" in rendering:
            acc = rendering["acc"]
            rendering["beta"] = (
                shader_results["beta"]
                * jax.lax.stop_gradient(shader_results["weights"][..., None])
            ).sum(axis=-2)
            rendering["beta"] = rendering["beta"] + jax.lax.stop_gradient(1.0 - acc[..., None])

        return rendering


@gin.configurable
class GeometryVolumeIntegrator(VolumeIntegrator):
    """Composites geometry buffers (means/normals/covs) for the light sampler."""

    config: Any = None
    bg_intensity_range: Tuple[float, float] = (1.0, 1.0)

    def setup(self):
        pass

    @nn.compact
    def __call__(self, rng, sampler_results, train_frac=1.0, train=True, **kwargs):
        extras = ["normals_to_use", "normals", "normals_pred", "feature", "means", "covs"]
        sampler_results = dict(sampler_results)
        sampler_results["covs"] = sampler_results["covs"].reshape(
            sampler_results["covs"].shape[:-2] + (9,)
        )
        weights = sampler_results["weights"]
        if self.normalize_weights:
            weights = weights / (weights.sum(axis=-1, keepdims=True) + 1e-8)

        rendering = render.volumetric_rendering(
            sampler_results["means"],
            weights,
            weights,
            sampler_results["tdist"],
            0.0,
            True,
            extras={k: v for k, v in sampler_results.items() if k in extras},
            normalize_weights_for_extras=False,
        )
        del rendering["rgb"]
        rendering["covs"] = rendering["covs"].reshape(rendering["covs"].shape[:-1] + (3, 3))
        return jax.tree_util.tree_map(lambda x: x[..., None, :], rendering)


@gin.configurable
class TransientVolumeIntegrator(VolumeIntegrator):
    """Time-resolved compositing (integration.py:342-551)."""

    config: Any = None
    bg_intensity_range: Tuple[float, float] = (1.0, 1.0)

    def setup(self):
        pass

    @nn.compact
    def __call__(
        self,
        rng,
        rays,
        shader_results,
        train_frac=1.0,
        train=True,
        percentiles=(5, 50, 95),
        linear_rgb=False,
        compute_extras=False,
        compute_distance=True,
        bg_intensity_range=None,
        vignette=None,
        is_secondary=False,
        radiance_cache=None,
        material=False,
        **kwargs,
    ):
        if bg_intensity_range is None:
            bg_intensity_range = self.bg_intensity_range
        bg_rgbs, random_background = self._background(rng, shader_results, bg_intensity_range)

        if self.config.learnable_light and radiance_cache is not None:
            # The learnable light lives on the material shader
            # (integration.py:477-489); standalone cache models fall back to
            # the configured constants.
            transient_shift = radiance_cache.shader.learnable_light.get_transient_shift()
            dark_level = radiance_cache.shader.learnable_light.get_dark_level()
        else:
            transient_shift = self.config.transient_shift
            dark_level = 0.0
        if material:
            transient_shift = jax.lax.stop_gradient(transient_shift)
            dark_level = jax.lax.stop_gradient(dark_level)

        extras_keys = _EXTRAS_TO_RENDER if compute_extras else _EXTRAS_TO_ALWAYS_RENDER
        filter_primary = not is_secondary or not self.config.filter_indirect
        rendering = render.volumetric_transient_rendering(
            shader_results["direct_rgb"],
            shader_results["transient_indirect"],
            shader_results["weights"],
            shader_results["weights_no_filter"],
            shader_results["tdist"],
            bg_rgbs,
            compute_extras,
            extras={k: v for k, v in shader_results.items() if k in extras_keys},
            percentiles=percentiles,
            compute_distance=compute_distance,
            n_bins=self.config.n_bins,
            shift=transient_shift if not is_secondary else 0.0,
            dark_level=dark_level if not is_secondary else 0.0,
            impulse_response=rays.impulse_response if filter_primary else None,
            tfilter_sigma=self.config.tfilter_sigma if filter_primary else 0.0,
            exposure_time=self.config.exposure_time,
            filter_indirect=self.config.filter_indirect,
            filter_median=(self.config.filter_median and not is_secondary),
            filter_median_thresh=self.config.filter_median_thresh,
            no_shift_direct=self.config.no_shift_direct and self.config.vis_only,
            itof=self.config.use_itof,
        )

        if random_background:
            rendering["bg_noise"] = (
                1.0 - shader_results["weights"].sum(axis=-1, keepdims=True)
            ) * bg_rgbs
            rendering["rgb"] = rendering["rgb"] - rendering["bg_noise"]

        if self.use_color_net and not linear_rgb:
            correction = math.safe_exp(self.run_color_network(rays.viewdirs, rays.origins))
            rendering["rgb"] = rendering["rgb"] * correction

        if vignette is not None:
            rendering["rgb"] = rendering["rgb"] * vignette[..., None, :]

        if not linear_rgb and self.config.linear_to_srgb and rendering["rgb"] is not None:
            rendering["rgb"] = jnp.clip(image.linear_to_srgb(rendering["rgb"]), 0.0, float("inf"))

        if "beta" in rendering:
            acc = rendering["acc"]
            rendering["beta"] = (
                shader_results["beta"]
                * jax.lax.stop_gradient(shader_results["weights"][..., None])
            ).sum(axis=-2)
            rendering["beta"] = rendering["beta"] + jax.lax.stop_gradient(1.0 - acc[..., None])

        return rendering
