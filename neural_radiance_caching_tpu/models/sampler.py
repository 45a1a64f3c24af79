"""Hierarchical proposal sampling (mip-NeRF 360 style).

Behavioral parity target: reference internal/sampling.py (ProposalVolumeSampler).
The level loop is static Python (3 levels), each level: dilate the previous
histogram, anneal its logits (Schlick bias), draw new intervals by inverse-CDF
sampling (TPU mask-reduction lookup), warp s→t, lift to Gaussians, evaluate the
level's DensityMLP, and composite alpha weights. Secondary-ray extras (normal
offset near-plane, radius/FOV density filters, uniform-radius weight
redistribution) follow sampling.py:182-205 and :422-637.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.models import geometry
from neural_radiance_caching_tpu.ops import coord, math, ref_utils, render, stepfun
from neural_radiance_caching_tpu.utils import jaxutil


@gin.configurable
class ProposalVolumeSampler(nn.Module):
    """Multi-level proposal sampler producing per-level ray results."""

    config: Any = None

    # (mlp_idx, grid_idx, num_samples) per level.
    sampling_strategy: Tuple[Tuple[int, Optional[int], int], ...] = (
        (0, None, 64),
        (0, None, 64),
        (1, None, 32),
    )
    mlp_params_per_level: Tuple[Any, ...] = ({}, {})
    grid_params_per_level: Tuple[Any, ...] = ()

    # Proposal-logit annealing schedule (Schlick bias over train_frac).
    stop_level_grad: bool = True
    anneal_clip: float = 1.0
    anneal_end: float = 1.0
    anneal_slope: float = 10.0
    sampling_anneal_blur_start: float = 1.0
    sampling_anneal_blur_stop: float = 0.05
    sampling_anneal_rate: float = 0.025

    # Secondary-ray density filters: each enable flag gates a spatial clamp
    # on the proposal weights (sampling.py:422-637).
    use_uniform_radius: bool = False
    use_normal_radius: bool = False
    use_density_radius: bool = False
    use_far_field_radius: bool = False
    use_vertical_filter: bool = False
    use_horizontal_filter: bool = False
    use_backwards_filter: bool = False
    use_uniform_radius_secondary_only: bool = True
    normalize_uniform_weights: bool = False
    uniform_radius: float = float("inf")
    normal_radius: float = float("inf")
    density_radius: float = float("inf")
    far_field_radius: float = float("inf")
    vertical_fov: float = np.pi
    horizontal_fov: float = np.pi

    # Interval drawing / compositing knobs.
    ray_shape: str = "cone"
    disable_integration: bool = False
    single_jitter: bool = True
    dilation_multiplier: float = 0.5
    dilation_bias: float = 0.0025
    near_anneal_rate: Optional[float] = None
    near_anneal_init: float = 0.95
    resample_padding: float = 0.0
    normalize_weights: bool = False
    opaque_background: bool = False
    use_sample_network: bool = False

    raydist_fn: Union[Tuple[Callable, ...], Callable, None] = None
    grid_representation: str = "ngp"

    def setup(self):
        grid_params = self.grid_params_per_level or tuple(
            None for _ in self.mlp_params_per_level
        )
        self.mlps = [
            geometry.DensityMLP(
                config=self.config,
                name=f"MLP_{i}",
                grid_params=grid_params[i] if i < len(grid_params) else None,
                **dict(params),
            )
            for i, params in enumerate(self.mlp_params_per_level)
        ]
        if self.use_sample_network:
            from neural_radiance_caching_tpu.models import sample_net

            self.sample_net = sample_net.SampleNetwork(
                config=self.config, name="SampleNetwork"
            )

    def _ray_warps(self, rays, use_raydist_fn):
        if not use_raydist_fn:
            return coord.construct_ray_warps(None, rays.near, rays.far)
        if isinstance(self.raydist_fn, tuple):
            fn, fn_inv, kw = self.raydist_fn
            return coord.construct_ray_warps(
                functools.partial(fn, **kw),
                rays.near,
                rays.far,
                fn_inv=functools.partial(fn_inv, **kw),
            )
        return coord.construct_ray_warps(self.raydist_fn, rays.near, rays.far)

    def _anneal(self, train_frac):
        """Proposal-logit sharpening over training (Schlick's bias curve)."""
        if self.anneal_slope <= 0:
            return self.anneal_clip
        x = train_frac / self.anneal_end
        s = self.anneal_slope
        return jnp.clip((s * x) / ((s - 1) * x + 1), 0.0, self.anneal_clip)

    @nn.compact
    def __call__(
        self,
        rng,
        rays,
        train_frac=1.0,
        train=True,
        deterministic=False,
        stopgrad_proposal=False,
        stopgrad_weights=False,
        stopgrad_samples=False,
        sampling_strategy=None,
        use_raydist_fn=True,
        **render_kwargs,
    ):
        mesh = render_kwargs.pop("mesh", None)
        use_mesh = render_kwargs.pop("use_mesh", True)
        is_secondary = render_kwargs.get("is_secondary", False)
        if deterministic or (not train and is_secondary):
            rng = jax.random.PRNGKey(0)

        # Secondary rays: push the near plane off the surface along the normal
        # (sampling.py:182-205).
        if is_secondary and rays.normals is not None:
            dotprod = math.dot(rays.viewdirs, jax.lax.stop_gradient(rays.normals), keepdims=True)
            offset = jnp.clip(
                self.config.shadow_normal_eps_dot_min / jnp.maximum(dotprod, 1e-5),
                rays.near,
                rays.far,
            )
            offset = jax.lax.stop_gradient(jnp.where(dotprod > 0, offset, rays.near))
            rays = rays.replace(near=jnp.maximum(rays.near, offset.reshape(rays.near.shape)))
            rays = rays.replace(near=jnp.clip(rays.near, 1e-5, rays.far - 1e-5))

        if sampling_strategy is None:
            sampling_strategy = self.sampling_strategy
        max_mlp = max(level[0] for level in sampling_strategy)
        if max_mlp >= len(self.mlps):
            raise ValueError(
                f"sampling_strategy {tuple(sampling_strategy)} indexes MLP "
                f"{max_mlp} but mlp_params_per_level only defines "
                f"{len(self.mlps)} MLP(s); bind "
                "ProposalVolumeSampler.mlp_params_per_level with one entry "
                "per distinct MLP index (reference sampling.py:60-63 leaves "
                "this consistency to the user)."
            )

        # Mesh-intersection shortcut (sampling.py:217-233): with a known
        # surface mesh, intersect once up front; `use_mesh=True` later
        # replaces volume sampling with the single surface sample, while
        # `use_mesh=False` keeps volume sampling but annotates each sample
        # with its distance to the mesh surface (sampling.py:576-592).
        mesh_t = mesh_normals = None
        if mesh is not None:
            hit_t, _, smooth_n, face_n, hit_valid = mesh.intersect(
                rays.origins, rays.directions
            )
            # Missed rays fall back to the far plane (the reference leaves
            # +inf in; a finite fallback keeps downstream math NaN-free).
            mesh_t = jnp.where(hit_valid, hit_t, rays.far[..., 0])
            toward = lambda n: jnp.where(
                math.dot(n, rays.directions, keepdims=True) < 0, n, -n
            )
            mesh_normals = toward(
                face_n if self.config.use_mesh_face_normals else smooth_n
            )[..., None, :]

        t_to_s, s_to_t = self._ray_warps(rays, use_raydist_fn)

        # Normalized-distance domain; the near edge optionally anneals open
        # from near_anneal_init toward 0 early in training.
        init_s_far = 1.0
        init_s_near = (
            0.0
            if self.near_anneal_rate is None
            else jnp.clip(
                1 - train_frac / self.near_anneal_rate, 0, self.near_anneal_init
            )
        )
        sdist = jnp.concatenate(
            [jnp.full_like(rays.near, init_s_near), jnp.full_like(rays.far, init_s_far)],
            axis=-1,
        )
        resample_weights = jnp.ones_like(rays.near)
        ray_history = []
        prod_num_samples = 1

        for i_level, (i_mlp, _, num_samples) in enumerate(sampling_strategy):
            is_last = i_level == len(sampling_strategy) - 1
            if mesh is not None and use_mesh and not is_last:
                # The mesh already answers "where is the surface": proposal
                # levels have nothing to refine (sampling.py:286-291).
                continue
            mlp = self.mlps[i_mlp]

            if mesh is not None and use_mesh:
                # One surface sample at the intersection; the density MLP is
                # still evaluated there for features (sampling.py:369-382).
                means = (
                    rays.origins + rays.directions * mesh_t[..., None]
                )[..., None, :]
                covs = jnp.broadcast_to(
                    rays.radii.ravel()[0] * jnp.eye(3), means.shape + (3,)
                )
                gaussians = (means, covs)
                tdist = jnp.concatenate(
                    [jnp.zeros_like(mesh_t[..., None]), mesh_t[..., None] + 0.1],
                    axis=-1,
                )
            else:
                dilation = (
                    self.dilation_bias
                    + self.dilation_multiplier * (init_s_far - init_s_near) / prod_num_samples
                )
                use_dilation = self.dilation_bias > 0 or self.dilation_multiplier > 0
                if prod_num_samples > 1 and use_dilation:
                    sdist, resample_weights = stepfun.max_dilate_weights(
                        sdist,
                        resample_weights,
                        dilation,
                        domain=(init_s_near, init_s_far),
                        renormalize=True,
                    )
                    sdist = sdist[..., 1:-1]
                    resample_weights = resample_weights[..., 1:-1]

                prod_num_samples *= num_samples

                logits_resample = self._anneal(train_frac) * math.safe_log(
                    resample_weights + self.resample_padding
                )
                key, rng = jaxutil.random_split(rng)
                sdist = stepfun.sample_intervals(
                    key, sdist, logits_resample, num_samples,
                    single_jitter=self.single_jitter,
                    domain=(init_s_near, init_s_far),
                )

                if self.stop_level_grad:
                    sdist = jax.lax.stop_gradient(sdist)

                tdist = s_to_t(sdist)
                gaussians = render.cast_rays(
                    tdist, rays.origins, rays.directions, rays.radii, self.ray_shape, diag=False
                )

            if self.disable_integration:
                gaussians = (gaussians[0], jnp.zeros_like(gaussians[1]))

            if self.use_sample_network and is_last:
                # Learned sample refinement (sampling.py:389-406): offset the
                # final level's sample points by the eased network prediction.
                sh = gaussians[0].shape
                ones = jnp.ones_like(gaussians[0])
                offsets = self.sample_net(
                    train_frac,
                    gaussians[0].reshape(-1, 3),
                    (rays.origins[..., None, :] * ones).reshape(-1, 3),
                    (rays.viewdirs[..., None, :] * ones).reshape(-1, 3),
                    (rays.cam_idx[..., None, :1] * jnp.ones_like(ones[..., :1])).reshape(-1, 1),
                )
                gaussians = (
                    gaussians[0] + offsets["point_offset"].reshape(sh),
                    gaussians[1],
                )

            key, rng = jaxutil.random_split(rng)
            ray_results = mlp(
                rng=key,
                rays=rays,
                gaussians=gaussians,
                tdist=tdist,
                train_frac=train_frac,
                train=train,
                mesh_normals=mesh_normals if use_mesh else None,
                **render_kwargs,
            )

            means = gaussians[0]
            radius = lambda keepdims: jnp.linalg.norm(means, axis=-1, keepdims=keepdims)

            if self.use_normal_radius and is_last:
                far = radius(True) > self.normal_radius
                for k in ("normals", "normals_pred", "normals_to_use"):
                    if ray_results.get(k) is not None:
                        ray_results[k] = jnp.where(
                            far, jax.lax.stop_gradient(ray_results[k]), ray_results[k]
                        )

            if self.use_density_radius and is_secondary and is_last:
                ray_results["density"] = jnp.where(
                    radius(False) > self.density_radius, 0.0, ray_results["density"]
                )

            if self.use_vertical_filter and is_secondary and is_last:
                up = rays.up[..., None, :]
                origins = rays.cam_origins[..., None, :]
                y = jnp.abs(math.dot(means - origins, up, keepdims=False))
                x = jnp.linalg.norm(means - origins, axis=-1)
                angle = jnp.arctan2(y, x)
                ray_results["density"] = jnp.where(
                    angle > self.vertical_fov, 0.0, ray_results["density"]
                )

            if self.use_horizontal_filter and is_secondary and is_last:
                look = rays.look[..., None, :]
                up = rays.up[..., None, :]
                origins = rays.cam_origins[..., None, :]
                right = jnp.cross(up, look)
                y = jnp.abs(math.dot(means - origins, right, keepdims=False))
                x = jnp.linalg.norm(means - origins, axis=-1)
                angle = jnp.arctan2(y, x)
                ray_results["density"] = jnp.where(
                    angle > self.horizontal_fov, 0.0, ray_results["density"]
                )

            if self.use_backwards_filter and is_secondary and is_last:
                look = rays.look[..., None, :]
                origins = rays.cam_origins[..., None, :]
                dotprod = math.dot(means - origins, look, keepdims=False)
                ray_results["density"] = jnp.where(dotprod < 0, 0.0, ray_results["density"])

            ray_results["points"] = means
            ray_results["means"] = means
            ray_results["covs"] = gaussians[1]

            if self.use_far_field_radius:
                far = radius(True) > self.far_field_radius
                for k in ("means", "points"):
                    ray_results[k] = jnp.where(
                        far,
                        ref_utils.l2_normalize(ray_results[k]) * self.far_field_radius * 2.0,
                        ray_results[k],
                    )

            # Rectified normals: flip sign so surfaces face the camera.
            rectified = {}
            for k, v in ray_results.items():
                if k.startswith("normals") and v is not None:
                    p = jnp.sum(v * rays.viewdirs[..., None, :], axis=-1, keepdims=True)
                    rectified[k + "_rectified"] = v * jnp.where(p > 0, -1, 1)
            ray_results.update(rectified)

            weights, alphas, trans = render.compute_alpha_weights(
                ray_results["density"],
                tdist,
                rays.directions,
                opaque_background=self.opaque_background,
            )
            resample_weights = weights

            if self.normalize_weights:
                weights = weights / (weights.sum(axis=-1, keepdims=True) + 1e-8)
            elif (
                self.use_uniform_radius
                and self.normalize_uniform_weights
                and (not self.use_uniform_radius_secondary_only or is_secondary)
            ):
                r = radius(False)
                inside = jnp.where(r < self.uniform_radius, weights, 0.0).sum(-1, keepdims=True)
                outside = weights.sum(-1, keepdims=True) - inside
                n_out = (r > self.uniform_radius).sum(-1, keepdims=True)
                weights = jnp.where(
                    (r > self.uniform_radius) & (n_out > 0),
                    weights
                    + jax.lax.stop_gradient(((1.0 - inside) - outside) / jnp.maximum(n_out, 1.0)),
                    weights,
                )

            if mesh is not None and use_mesh:
                # The surface sample is certain: unit compositing weight
                # (sampling.py:576-577).
                weights = jnp.ones_like(weights)
            elif mesh is not None:
                # Volume samples annotated with the mesh surface: per-sample
                # signed distance-to-surface along the ray plus the surface
                # point/normal (sampling.py:578-592).
                ones = jnp.ones_like(means)
                surf = (
                    rays.origins + rays.directions * mesh_t[..., None]
                )[..., None, :] * ones
                ray_results["mesh_points"] = surf
                ray_results["mesh_normals"] = mesh_normals[..., 0:1, :] * ones
                dist_to = lambda p: jnp.linalg.norm(
                    p - rays.origins[..., None, :], axis=-1, keepdims=True
                )
                ray_results["t_to_nearest"] = dist_to(surf) - dist_to(means)

            ray_results["tdist"] = jnp.copy(tdist)
            ray_results["sdist"] = jnp.copy(sdist)

            if stopgrad_weights:
                sg = jax.lax.stop_gradient
                ray_results["weights"] = sg(jnp.copy(weights))
                ray_results["alphas"] = sg(jnp.copy(alphas))
                ray_results["trans"] = sg(jnp.copy(trans))
            else:
                ray_results["weights"] = jnp.copy(weights)
                ray_results["alphas"] = jnp.copy(alphas)
                ray_results["trans"] = jnp.copy(trans)

            if (stopgrad_proposal and not is_last) or stopgrad_samples:
                ray_results = jax.tree_util.tree_map(jax.lax.stop_gradient, ray_results)

            # Uniform resampling weights outside a radius (secondary rays see
            # far-field geometry uniformly, sampling.py:617-637).
            if self.use_uniform_radius and (
                not self.use_uniform_radius_secondary_only or is_secondary
            ):
                r = radius(False)
                inside = jnp.where(r < self.uniform_radius, resample_weights, 0.0).sum(
                    -1, keepdims=True
                )
                n_out = (r > self.uniform_radius).sum(-1, keepdims=True)
                resample_weights = jnp.where(
                    (r > self.uniform_radius) & (n_out > 0),
                    (jnp.ones_like(resample_weights) - inside) / jnp.maximum(n_out, 1.0),
                    resample_weights,
                )

            ray_history.append(ray_results)

        for results in ray_history:
            results["lossmult"] = rays.lossmult

        return ray_history
