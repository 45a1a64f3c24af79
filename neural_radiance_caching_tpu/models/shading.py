"""Shared shader base: appearance features from density features + own grid.

Behavioral parity target: reference internal/shading.py (BaseShader).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.models import grids
from neural_radiance_caching_tpu.ops import coord, geopoly, math
from neural_radiance_caching_tpu.utils import jaxutil


@gin.configurable
class BaseShader(nn.Module):
    """Base class for all shaders (radiance cache, material, SLF)."""

    config: Any = None

    weight_init: str = "he_uniform"
    net_activation: Callable[..., Any] = nn.relu
    net_depth: int = 8
    net_width: int = 256
    bottleneck_width: int = 256
    bottleneck_noise: float = 0.0
    min_deg_point: int = 0
    max_deg_point: int = 4
    skip_layer: int = 4
    use_posenc_with_grid: bool = False
    # Secondary-ray LOD: clamp the appearance hash pyramid to its coarsest K
    # levels for is_secondary queries (see geometry.BaseDensityMLP —
    # same knob, same rationale; no reference counterpart).
    secondary_grid_level_clamp: Optional[int] = None

    num_rgb_channels: int = 3
    rgb_premultiplier: float = 1.0
    rgb_activation: Callable[..., Any] = nn.sigmoid
    rgb_bias: float = 0.0
    rgb_bias_diffuse: float = -1.0
    rgb_padding: float = 0.001

    isotropize_gaussians: bool = False
    gaussian_covariance_scale: float = 1.0
    gaussian_covariance_pad: float = 0.0
    squash_before: bool = False
    warp_fn: Callable[..., Any] = None

    basis_shape: str = "icosahedron"
    basis_subdivisions: int = 2
    unscented_mip_basis: str = "mean"
    unscented_sqrt_fn: str = "sqrtm"
    unscented_scale_mult: float = 0.0

    use_density_feature: bool = True
    affine_density_feature: bool = False
    use_grid: bool = False
    grid_representation: str = "ngp"
    grid_params: Any = None

    normals_target: str = "normals_to_use"
    backfacing_target: str = "normals_to_use"
    use_bf16_compute: bool = False
    backfacing_noise: float = 0.0
    backfacing_noise_rate: float = float("inf")
    backfacing_near: float = 1e-1

    def _make_dense_layer_factory(self):
        import jax.numpy as jnp

        return functools.partial(
            nn.Dense,
            kernel_init=getattr(jax.nn.initializers, self.weight_init)(),
            # bf16 matmul compute (full-rate MXU); params/outputs stay f32 via
            # the callers' output-layer handling.
            dtype=jnp.bfloat16 if getattr(self, "use_bf16_compute", False) else None,
        )

    def _make_grid(self, name="appearance_grid"):
        if not self.use_grid:
            return None
        grid_cls = grids.GRID_REPRESENTATION_BY_NAME[self.grid_representation.lower()]
        return grid_cls(name=name, **dict(self.grid_params or {}))

    def run_network(self, x):
        inputs = x
        for i in range(self.net_depth):
            x = self.net_activation(self.layers[i](x))
            if i % self.skip_layer == 0 and i > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        return x

    def predict_appearance_feature(self, sampler_results, train=True, train_frac=1.0,
                                   is_secondary=False, **kwargs):
        """Per-sample appearance feature: density feature ⊕ own grid ⊕ posenc."""
        means, covs = sampler_results["means"], sampler_results["covs"]
        if self.isotropize_gaussians:
            covs = coord.isotropize(covs)
        if self.gaussian_covariance_scale != 1:
            covs = covs * self.gaussian_covariance_scale
        if self.gaussian_covariance_pad > 0:
            covs = covs + jnp.diag(jnp.full(covs.shape[-1], self.gaussian_covariance_pad))

        x = []
        if self.use_density_feature:
            x.append(sampler_results["feature"])

        if self.grid is not None:
            control_offsets = kwargs["control_offsets"]
            control = means[..., None, :] + control_offsets
            perp_mag = kwargs["perp_mag"]
            scale = None
            if not self.squash_before and self.warp_fn is not None:
                if perp_mag is not None and self.unscented_scale_mult > 0:
                    warp = getattr(self.warp_fn, "__wrapped__", self.warp_fn)
                    if warp is coord.contract:
                        s = coord.contract3_isoscale(control)
                        scale = self.unscented_scale_mult * (perp_mag * s)[..., None]
                        control = self.warp_fn(control)
                    else:
                        control, perp_mag = coord.track_isotropic(self.warp_fn, control, perp_mag)
                        scale = self.unscented_scale_mult * perp_mag[..., None]
                else:
                    control = self.warp_fn(control)
            grid_kwargs = {}
            if is_secondary and self.secondary_grid_level_clamp is not None:
                grid_kwargs["max_levels"] = self.secondary_grid_level_clamp
            x.append(
                self.grid(
                    control,
                    x_scale=scale,
                    per_level_fn=math.average_across_multisamples,
                    train=train,
                    train_frac=train_frac,
                    **grid_kwargs,
                )
            )
            if self.use_posenc_with_grid:
                if not self.squash_before and self.warp_fn is not None:
                    means, covs = coord.track_linearize(self.warp_fn, means, covs)
                lifted_means, lifted_vars = coord.lift_and_diagonalize(
                    means, covs, self.pos_basis_t
                )
                x.append(
                    coord.integrated_pos_enc(
                        lifted_means, lifted_vars, self.min_deg_point, self.max_deg_point
                    )
                )

        x = jnp.concatenate(x, axis=-1)
        return self.run_network(x)

    def get_predict_appearance_kwargs(self, rng, rays, sampler_results, **kwargs):
        predict_appearance_kwargs = {}
        if self.grid is not None:
            means, covs = sampler_results["means"], sampler_results["covs"]
            key, rng = jaxutil.random_split(rng)
            if "tdist" in sampler_results:
                control, perp_mag = coord.compute_control_points(
                    means,
                    covs,
                    rays,
                    sampler_results["tdist"],
                    key,
                    self.unscented_mip_basis,
                    self.unscented_sqrt_fn,
                    self.unscented_scale_mult,
                )
            else:
                control = means[..., None, :]
                perp_mag = jnp.zeros_like(control)
            predict_appearance_kwargs["control_offsets"] = control - means[..., None, :]
            predict_appearance_kwargs["perp_mag"] = perp_mag
        return dict(**predict_appearance_kwargs, **kwargs)

    def get_bottleneck_feature(self, rng, feature):
        if self.bottleneck_width > 0:
            bottleneck = self.bottleneck_layer(feature)
            if rng is not None and self.bottleneck_noise > 0:
                key, rng = jaxutil.random_split(rng)
                bottleneck += self.bottleneck_noise * jax.random.normal(key, bottleneck.shape)
            return bottleneck
        return jnp.zeros_like(feature[..., 0:0])

    @nn.compact
    def __call__(
        self,
        rng,
        rays,
        sampler_results,
        train_frac=1.0,
        train=True,
        is_secondary=None,
        shading_only=False,
        **kwargs,
    ):
        key, rng = jaxutil.random_split(rng)
        shading_results = self.predict_appearance(
            rng=key,
            rays=rays,
            sampler_results=sampler_results,
            train_frac=train_frac,
            train=train,
            is_secondary=is_secondary,
            **kwargs,
        )

        # Backfacing regularization noise on colors (shading.py:301-324).
        if train and rng is not None and self.backfacing_noise > 0:
            dotprod = math.dot(
                sampler_results[self.backfacing_target], -rays.directions[..., None, :]
            )
            app_mask = dotprod > 0.0
            key, rng = jaxutil.random_split(rng)
            rgb_noise = (
                jax.random.normal(key, shading_results["rgb"].shape)
                * self.backfacing_noise
                * jnp.clip(1.0 - train_frac / self.backfacing_noise_rate, 0.0, 1.0)
            )
            noisy = rgb_noise + jax.lax.stop_gradient(shading_results["rgb"])
            shading_results["rgb"] = jnp.where(app_mask, shading_results["rgb"], noisy)

        if shading_only:
            return shading_results
        return dict(
            **shading_results,
            **{k: v for k, v in sampler_results.items() if k not in shading_results},
        )
