"""Density field: hash-grid features + small MLP + analytic/predicted normals.

Behavioral parity target: reference internal/geometry.py (BaseDensityMLP).
TPU-first delta: analytic density normals are computed with ONE vector-Jacobian
product over the whole sample batch (gradient of sum(raw_density) w.r.t. the
means). Because every sample's density depends only on its own mean, the
gradient of the sum is exactly the per-sample gradient — mathematically
identical to the reference's per-sample `vmap(value_and_grad)`
(geometry.py:434-460) but one backward pass instead of N, which removes the
reference's most compile-heavy construct.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.models import grids
from neural_radiance_caching_tpu.ops import coord, geopoly, math, ref_utils
from neural_radiance_caching_tpu.utils import jaxutil


@gin.configurable
class BaseDensityMLP(nn.Module):
    """Density MLP over grid features (+ optional IPE posenc)."""

    config: Any = None

    net_depth: int = 8
    net_width: int = 256
    net_activation: Callable[..., Any] = nn.relu
    weight_init: str = "he_uniform"
    skip_layer: int = 4

    use_posenc_with_grid: bool = False
    min_deg_point: int = 0
    max_deg_point: int = 4

    density_activation: Callable[..., Any] = nn.softplus
    density_bias: float = -1.0
    density_noise: float = 0.0

    enable_pred_normals: bool = False
    enable_normals_offset: bool = False
    use_corrected_normals: bool = False
    disable_density_normals: bool = False
    # Run the trunk matmuls in bf16 (full-rate MXU; fp32 matmuls are
    # multi-pass on TPU). Parameters and outputs stay f32.
    use_bf16_compute: bool = False

    isotropize_gaussians: bool = False
    gaussian_covariance_scale: float = 1.0
    gaussian_covariance_pad: float = 0.0

    warp_fn: Callable[..., Any] = None

    basis_shape: str = "icosahedron"
    basis_subdivisions: int = 2
    unscented_mip_basis: str = "mean"
    unscented_sqrt_fn: str = "sqrtm"
    unscented_scale_mult: float = 0.0
    squash_before: bool = False

    use_grid: bool = True
    grid_representation: str = "ngp"
    grid_params: Any = None

    backfacing_target: str = "normals"
    backfacing_near: float = 2e-1
    use_backfacing_near: bool = False
    filter_backfacing: bool = False
    normals_for_filter_only: bool = False

    use_feature_filter: bool = False
    use_feature_filter_secondary_only: bool = True
    # Secondary-ray LOD (TPU-first knob, no reference counterpart): clamp
    # the hash pyramid to its coarsest K levels for is_secondary queries.
    # Wide secondary footprints erf-suppress fine levels anyway, and the
    # fine hash levels are the dominant gather/scatter cost of the material
    # stage's secondary fan-out (BASELINE.md round-3 traces).
    secondary_grid_level_clamp: Optional[int] = None
    # Primary-ray LOD (same argument, camera side): at training resolution
    # the pixel cone footprint can exceed the finest hash cells, so the
    # finest levels carry variance the render integral cannot resolve while
    # dominating the scatter backward's update count (43% of the cache step,
    # BASELINE.md round-3 instance trace). Quality-guarded A/B knob.
    primary_grid_level_clamp: Optional[int] = None
    use_feature_filter_far_field: bool = False
    feature_filter_radius: float = float("inf")
    feature_filter_size: int = 64

    def setup(self):
        self.pos_basis_t = jnp.array(
            geopoly.generate_basis(self.basis_shape, self.basis_subdivisions)
        ).T
        dense = functools.partial(
            nn.Dense,
            kernel_init=getattr(jax.nn.initializers, self.weight_init)(),
            # Matmul compute dtype: bf16 runs the MXU at full rate (fp32
            # matmuls are multi-pass on v5e); params stay f32.
            dtype=jnp.bfloat16 if self.use_bf16_compute else None,
        )
        self.density_layers = [dense(self.net_width) for _ in range(self.net_depth)]
        self.output_density_layer = dense(1)
        self.pred_normals_layer = dense(3)
        self.normals_offset_layer = nn.Dense(3, kernel_init=jax.nn.initializers.zeros)

        if self.use_grid:
            grid_cls = grids.GRID_REPRESENTATION_BY_NAME[self.grid_representation.lower()]
            self.grid = grid_cls(name="density_grid", **dict(self.grid_params or {}))
        else:
            self.grid = None

    def _run_trunk(self, x):
        inputs = x
        for i, layer in enumerate(self.density_layers):
            x = self.net_activation(layer(x))
            if i % self.skip_layer == 0 and i > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        raw_density = self.output_density_layer(x)[..., 0].astype(jnp.float32)
        return raw_density, x.astype(jnp.float32)

    def _encode(self, means, covs, control_offsets, perp_mag, is_secondary,
                viewdirs=None):
        """Build the network input features for each sample mean."""
        x = []
        if self.grid is not None:
            control = means[..., None, :] + control_offsets
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

            # Feature-radius filter (geometry.py:259-289): zero fine grid
            # levels for far-field points, optionally re-pointing them at a
            # distant along-view position so coarse levels still see them.
            feature_filter = None
            if self.use_feature_filter and (
                is_secondary or not self.use_feature_filter_secondary_only
            ):
                feature_filter = (
                    jnp.linalg.norm(means[..., None, :], axis=-1, keepdims=True)
                    < self.feature_filter_radius
                )
                if self.use_feature_filter_far_field and viewdirs is not None:
                    vd = viewdirs
                    while vd.ndim < control.ndim:
                        vd = vd[..., None, :]
                    far = jnp.ones_like(control) * vd * 100.0
                    if self.warp_fn is not None:
                        far = self.warp_fn(far)
                    control = jnp.where(feature_filter, control, far)
            grid_kwargs = {}
            if is_secondary and self.secondary_grid_level_clamp is not None:
                grid_kwargs["max_levels"] = self.secondary_grid_level_clamp
            elif not is_secondary and self.primary_grid_level_clamp is not None:
                grid_kwargs["max_levels"] = self.primary_grid_level_clamp
            x.append(
                self.grid(
                    control,
                    x_scale=scale,
                    per_level_fn=math.average_across_multisamples,
                    feature_filter=feature_filter,
                    feature_filter_size=self.feature_filter_size,
                    **grid_kwargs,
                )
            )
        if self.grid is None or self.use_posenc_with_grid:
            if not self.squash_before and self.warp_fn is not None:
                means, covs = coord.track_linearize(self.warp_fn, means, covs)
            lifted_means, lifted_vars = coord.lift_and_diagonalize(means, covs, self.pos_basis_t)
            x.append(
                coord.integrated_pos_enc(
                    lifted_means, lifted_vars, self.min_deg_point,
                    self.max_deg_point,
                    # The trunk matmul casts operands to bf16 anyway; running
                    # the IPE lift in bf16 moves that cast before the huge
                    # [..., n_dims * n_freqs] intermediates (one f32
                    # scaled-mean buffer at the material stage's secondary
                    # fan-out is ~2GB).
                    dtype=jnp.bfloat16 if self.use_bf16_compute else None,
                )
            )
        return jnp.concatenate(x, axis=-1)

    def predict_density(
        self, means, covs, control_offsets, perp_mag, density_key=None, is_secondary=False,
        viewdirs=None,
    ):
        """Raw density (pre-activation) and trunk feature for each sample."""
        if self.isotropize_gaussians:
            covs = coord.isotropize(covs)
        if self.gaussian_covariance_scale != 1:
            covs = covs * self.gaussian_covariance_scale
        if self.gaussian_covariance_pad > 0:
            covs = covs + jnp.diag(jnp.full(covs.shape[-1], self.gaussian_covariance_pad))

        x = self._encode(means, covs, control_offsets, perp_mag, is_secondary,
                         viewdirs=viewdirs)
        raw_density, feat = self._run_trunk(x)
        if density_key is not None and self.density_noise > 0:
            raw_density += self.density_noise * jax.random.normal(density_key, raw_density.shape)
        return raw_density, feat

    def convert_raw_density(self, raw_density, means):
        """Activation + bias, with zero density outside the grid bbox."""
        density = self.density_activation(raw_density + self.density_bias)
        if self.grid is not None:
            warped = self.warp_fn(means) if self.warp_fn is not None else means
            valid = jnp.all((warped > self.grid.bbox[0]) & (warped < self.grid.bbox[1]), axis=-1)
            density = jnp.where(valid, density, 0.0)
        return density

    @nn.compact
    def __call__(
        self,
        rng,
        rays,
        gaussians,
        tdist=None,
        train_frac=1.0,
        train=True,
        mesh_normals=None,
        is_secondary=False,
        **kwargs,
    ):
        means, covs = gaussians

        # Unscented control points for the grid (geometry.py:343-379).
        control_offsets = None
        perp_mag = None
        if self.grid is not None:
            key, rng = jaxutil.random_split(rng)
            control, perp_mag = coord.compute_control_points(
                means,
                covs,
                rays,
                tdist,
                key,
                self.unscented_mip_basis,
                self.unscented_sqrt_fn,
                self.unscented_scale_mult,
            )
            control_offsets = control - means[..., None, :]

        density_key, rng = jaxutil.random_split(rng)

        viewdirs = getattr(rays, "viewdirs", None) if rays is not None else None
        if self.disable_density_normals or mesh_normals is not None:
            raw_density, feat = self.predict_density(
                means, covs, control_offsets, perp_mag, density_key, is_secondary,
                viewdirs=viewdirs,
            )
            raw_grad_density = None
            normals = None
        else:
            # One VJP over the whole batch: d(sum sigma)/d(means) is the
            # per-sample spatial gradient because the map means -> sigma_i is
            # pointwise (see module docstring). The outer loss differentiates
            # through these normals (second-order AD), which the Pallas
            # scatter VJP does not support — the whole inner graph uses the
            # pure-XLA encoder.
            from neural_radiance_caching_tpu.ops import hashgrid

            def density_of_means(m):
                with hashgrid.xla_encoder_scope():
                    return self.predict_density(
                        m, covs, control_offsets, perp_mag, density_key,
                        is_secondary, viewdirs=viewdirs,
                    )

            (raw_density, feat), vjp_fn = jax.vjp(density_of_means, means, has_aux=False)
            # Pull back a ones-cotangent on raw_density only.
            raw_grad_density = vjp_fn((jnp.ones_like(raw_density), jnp.zeros_like(feat)))[0]
            normals = jnp.nan_to_num(-ref_utils.l2_normalize(raw_grad_density))

        density = self.convert_raw_density(raw_density, means)

        if self.enable_pred_normals:
            grad_pred = self.pred_normals_layer(feat)
            normals_pred = jnp.nan_to_num(-ref_utils.l2_normalize(grad_pred))
            if self.use_corrected_normals:
                flip = lambda n: jnp.where(
                    math.dot(n, rays.viewdirs[..., None, :]) < 0, n, -n
                )
                if normals is not None:
                    normals = flip(normals)
                normals_pred = flip(normals_pred)
            normals_to_use = normals_pred
        else:
            grad_pred = None
            normals_pred = None
            normals_to_use = normals

        if mesh_normals is not None:
            normals = normals_pred = normals_to_use = raw_grad_density = mesh_normals
            density = 1e5 * jnp.ones_like(density)

        normals_shading = None
        if self.enable_normals_offset:
            normals_shading = ref_utils.l2_normalize(
                normals_to_use + self.normals_offset_layer(feat)
            )

        ray_dists = jnp.linalg.norm(rays.origins[..., None, :] - means, axis=-1, keepdims=True)
        light_dists = jnp.linalg.norm(rays.lights[..., None, :] - means, axis=-1, keepdims=True)

        results = dict(
            feature=feat,
            density=density,
            raw_grad_density=raw_grad_density,
            grad_pred=grad_pred,
            normals=normals,
            normals_pred=normals_pred,
            normals_to_use=normals_to_use,
            normals_shading=normals_shading,
            ray_dists=ray_dists,
            light_dists=light_dists,
        )

        # Zero density for backfacing points close along secondary rays
        # (geometry.py:551-560).
        target = results.get(self.backfacing_target)
        if target is not None:
            dotprod = math.dot(target, -rays.directions[..., None, :])[..., 0]
            if is_secondary and self.use_backfacing_near:
                results["density"] = results["density"] * (
                    (dotprod > 0.0) | (tdist[..., :-1] > self.backfacing_near)
                )

        if self.normals_for_filter_only:
            results["normals"] = None
            results["normals_to_use"] = None
            results["normals_pred"] = None

        return results


@gin.configurable
class DensityMLP(BaseDensityMLP):
    pass


@gin.configurable
class TransientDensityMLP(BaseDensityMLP):
    pass
