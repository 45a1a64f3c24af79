"""Surface light field / environment map MLPs.

Behavioral parity target: reference internal/surface_light_field.py. A
SurfaceLightFieldMLP answers "what radiance arrives at point o from direction
d" without marching the full volume: it predicts a handful of distances along
the query ray, looks up an NGP "reflectance grid" at those 3D points, and
decodes RGB + alpha with a view-dependent MLP (IDE-encoded for roughness-aware
prefiltering). Used as the cache's indirect/ambient specular source, the env
map, and the material stage's control variate.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.models import grids, shading
from neural_radiance_caching_tpu.ops import coord, math, ref_utils, render
from neural_radiance_caching_tpu.utils import jaxutil


@gin.configurable
class BaseSurfaceLightFieldMLP(shading.BaseShader):
    config: Any = None

    # Conditioning inputs: which encodings of (origin, direction, lights,
    # 3D points) feed the view branch.
    use_bottleneck: bool = True
    use_shader_bottleneck: bool = False
    use_directional_enc: bool = False
    use_ide: bool = False
    use_origins: bool = False
    deg_origins: int = 4
    use_lights: bool = True
    deg_lights: int = 2
    use_points: bool = False
    use_points_ide: bool = False
    deg_points: int = 4
    use_sphere_points: bool = False
    deg_sphere_points: int = 4
    sphere_radius: float = 5.0
    use_far_field_points: bool = False
    use_env_alpha: bool = False

    # View-conditioned decoder trunk.
    net_depth_viewdirs: int = 1
    net_width_viewdirs: int = 128
    bottleneck_viewdirs: int = 128
    skip_layer_dir: int = 4
    deg_view: int = 4

    # Distance head (where along the query ray the radiance originates).
    use_distance_prediction: bool = False
    net_depth_distance: int = 1
    net_width_distance: int = 128
    skip_layer_distance: int = 4
    deg_view_distance: int = 2
    use_distance_ide: bool = False
    use_sorted_distances: bool = False

    # Optional per-point density head + alpha decode.
    use_density_prediction: bool = False
    net_depth_density: int = 2
    net_width_density: int = 64
    skip_layer_density: int = 2
    density_activation: Callable[..., Any] = math.safe_exp
    density_bias: float = -1.0
    density_noise: float = 0.0
    alpha_bias: float = 2.0
    alpha_activation: Callable[..., Any] = nn.sigmoid

    # Distance-sample placement along the query ray.
    num_distance_samples: int = 1
    num_far_samples: int = 0
    distance_near: float = 1e-3
    distance_far: float = 1e6
    distance_far_field: float = float("inf")
    distance_scale: float = 1.0
    distance_bias: float = -2.0
    use_uniform_distance: bool = False
    use_uniform_loss: bool = False
    use_indirect: bool = False
    use_uniform_grid: bool = True
    use_voxel_grid: bool = False
    voxel_start: float = 0.0
    voxel_end: float = 10.0

    raydist_fn: Union[Tuple[Callable, ...], Callable, None] = None

    use_point_offsets: bool = False
    point_offset_scale: float = 0.25
    point_offset_bias: float = -3.0
    window_points_frac: float = 0.0

    use_reflectance_grid: bool = False
    reflectance_grid_representation: str = "ngp"
    reflectance_grid_params: Any = None
    ref_warp_fn: Callable[..., Any] = None
    use_roughness: bool = False
    roughness_scale: float = 0.001
    per_ref_feature_output: bool = False

    num_light_features: int = 64
    use_illumination_feature: bool = False
    multiple_illumination_outputs: bool = True
    rotate_illumination: bool = False

    rgb_max: float = float("inf")
    ambient_rgb_max: float = float("inf")
    ambient_rgb_activation: Callable[..., Any] = nn.softplus
    ambient_rgb_bias: float = -1.0

    def setup(self):
        dense = self._make_dense_layer_factory()
        zeros = functools.partial(nn.Dense, kernel_init=jax.nn.initializers.zeros)

        # Encoders.
        if self.use_ide:
            self.dir_enc_fn = ref_utils.generate_ide_fn(self.deg_view)
        else:
            self.dir_enc_fn = lambda d, _: coord.pos_enc(d, 0, self.deg_view, True)
        self.origins_enc_fn = lambda o: coord.pos_enc(o, 0, self.deg_origins, True)
        self.lights_enc_fn = lambda l: coord.pos_enc(l, 0, self.deg_lights, True)
        self.sphere_points_enc_fn = lambda p: coord.pos_enc(p, 0, self.deg_sphere_points, True)
        if self.use_points_ide:
            self.points_enc_fn = ref_utils.generate_ide_fn(self.deg_points)
        else:
            self.points_enc_fn = lambda p, _: coord.pos_enc(p, 0, self.deg_points, True)
        if self.use_distance_prediction:
            if self.use_distance_ide:
                self.dir_enc_fn_distance = ref_utils.generate_ide_fn(self.deg_view_distance)
            else:
                self.dir_enc_fn_distance = lambda d, _: coord.pos_enc(
                    d, 0, self.deg_view_distance, True
                )

        # Multi-illumination.
        if self.config.multi_illumination:
            self.light_vecs = nn.Embed(
                self.config.num_illuminations, self.num_light_features, name="light_vecs"
            )
            self.num_illumination_outputs = (
                self.config.num_illuminations if self.config.multiple_illumination_outputs else 1
            )
        else:
            self.num_illumination_outputs = 1
        if self.rotate_illumination and self.config.rotate_illumination:
            mats = []
            for i in range(self.config.num_illuminations):
                a = jnp.float32(self.config.light_rotations[i] / 180 * jnp.pi)
                mats.append(
                    jnp.array(
                        [
                            [jnp.cos(a), -jnp.sin(a), 0],
                            [jnp.sin(a), jnp.cos(a), 0],
                            [0, 0, 1],
                        ],
                        dtype=jnp.float32,
                    )
                )
            self.light_rotation_matrix = jnp.stack(mats, axis=0)

        # Grids.
        self.grid = self._make_grid(name="distance_grid")
        if self.use_reflectance_grid:
            grid_cls = grids.GRID_REPRESENTATION_BY_NAME[
                self.reflectance_grid_representation.lower()
            ]
            self.reflectance_grid = grid_cls(
                name="reflectance_grid", **dict(self.reflectance_grid_params or {})
            )
        else:
            self.reflectance_grid = None

        # Layers.
        self.layers = [dense(self.net_width) for _ in range(self.net_depth)]
        self.bottleneck_layer = dense(self.bottleneck_width)
        self.view_dependent_layers = [
            dense(self.net_width_viewdirs, name=f"layer_{i}")
            for i in range(self.net_depth_viewdirs - 1)
        ] + [dense(self.bottleneck_viewdirs, name="layer_bottleneck")]
        self.ambient_view_dependent_layers = [
            dense(self.net_width_viewdirs, name=f"ambient_layer_{i}")
            for i in range(self.net_depth_viewdirs - 1)
        ] + [dense(self.bottleneck_viewdirs, name="ambient_layer_bottleneck")]

        output_channels = self.config.num_rgb_channels
        if self.use_indirect:
            output_channels *= self.config.n_bins
        self.output_rgba_layer = dense(
            output_channels * self.num_illumination_outputs + 1, name="output_rgba_layer"
        )
        self.output_ambient_rgb_layer = dense(
            self.config.num_rgb_channels * self.num_illumination_outputs,
            name="output_ambient_rgb_layer",
        )
        if self.use_distance_prediction:
            self.distance_layers = [
                dense(self.net_width_distance, name=f"distance_layer_{i}")
                for i in range(self.net_depth_distance)
            ]
            self.output_distance_layer = zeros(
                8 * self.num_distance_samples + 4, name="distance_output_layer"
            )
        if self.use_density_prediction:
            self.density_layers = [
                dense(self.net_width_density, name=f"density_layer_{i}")
                for i in range(self.net_depth_density)
            ]
        self.output_density_layer = dense(1, name="output_density_layer")

    # --- helpers -----------------------------------------------------------

    def get_light_vec(self, rays, feature):
        light_vec = jnp.zeros_like(feature[..., 0:0])
        if self.config.multi_illumination:
            light_idx = rays.light_idx[..., 0]
            light_vec = self.light_vecs(light_idx)
            light_vec = light_vec[..., None, :] * jnp.ones_like(feature[..., 0:1])
        return light_vec

    def _run_skip_mlp(self, x, layers, depth, skip):
        inputs = x
        for i in range(depth):
            x = self.net_activation(layers[i](x))
            if i % skip == 0 and i > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        return x

    def run_distances_network(self, bottleneck, origins, refdirs, roughness):
        dir_enc = self.dir_enc_fn_distance(refdirs, roughness)
        origins_enc = self.origins_enc_fn(self.warp_fn(origins))
        x = jnp.concatenate([bottleneck, origins_enc, dir_enc], axis=-1)
        x = self._run_skip_mlp(
            x, self.distance_layers, self.net_depth_distance, self.skip_layer_distance
        )
        return self.output_distance_layer(x)

    def run_density_network(self, feat):
        x = self._run_skip_mlp(
            feat, self.density_layers, self.net_depth_density, self.skip_layer_density
        )
        raw = self.output_density_layer(x)[..., 0]
        return self.density_activation(raw + self.density_bias)

    def get_raydist_fns(self, rays_near):
        if self.raydist_fn is not None:
            fn, fn_inv, kw = self.raydist_fn
        else:
            fn = lambda x: x
            fn_inv = lambda x: x
            kw = {}
        t_to_s, s_to_t = coord.construct_ray_warps(
            functools.partial(fn, **kw),
            jnp.ones_like(rays_near) * self.distance_near,
            jnp.ones_like(rays_near) * self.distance_far,
            fn_inv=functools.partial(fn_inv, **kw),
        )
        if self.use_uniform_distance:
            s_to_t = lambda x: x * (self.distance_far - self.distance_near) + self.distance_near
            t_to_s = lambda x: (x - self.distance_near) / (self.distance_far - self.distance_near)
        elif self.use_uniform_loss:
            t_to_s = lambda x: (x - self.distance_near) / (self.distance_far - self.distance_near)
        return t_to_s, s_to_t

    def get_voxel_raydist_fns(self, rays_near):
        fn, fn_inv, kw = self.raydist_fn
        t_to_s, s_to_t = coord.construct_ray_warps(
            functools.partial(fn, **kw),
            jnp.ones_like(rays_near) * self.voxel_start,
            jnp.ones_like(rays_near) * self.voxel_end,
            fn_inv=functools.partial(fn_inv, **kw),
        )
        if self.use_uniform_grid:
            s_to_t = lambda x: x * (self.voxel_end - self.voxel_start) + self.voxel_start
            t_to_s = lambda x: (x - self.voxel_start) / (self.voxel_end - self.voxel_start)
        return t_to_s, s_to_t

    def convert_to_sdist(self, rays, tdist):
        t_to_s, _ = self.get_raydist_fns(rays.near)
        return t_to_s(tdist)

    def predict_points(self, rng, rays, origins, refdirs, bottleneck, roughness, near=0.0,
                       far=float("inf"), **kwargs):
        """Predict per-ray sample distances/points + env color and alpha.

        Mirrors surface_light_field.py:594-780: a zeros-initialized head emits
        per-sample distance offsets folded around a uniform s-ladder, then
        mapped to metric distance with the raydist warp.
        """
        del rng, kwargs
        t_to_s, s_to_t = self.get_raydist_fns(rays.near[..., None])
        out = self.run_distances_network(bottleneck, origins, refdirs, roughness)

        env_rgb = self.rgb_activation(self.rgb_premultiplier * out[..., -4:-1] + self.rgb_bias)
        if self.use_env_alpha:
            env_alpha = self.alpha_activation(out[..., -1:] + self.alpha_bias)
        else:
            env_alpha = jnp.ones_like(out[..., -1:])

        out = out[..., :-4]
        out = out.reshape(
            out.shape[:-1] + (self.num_distance_samples, out.shape[-1] // self.num_distance_samples)
        )
        distance_offsets = out[..., 0]
        distance_sigma = out[..., 1]
        point_sigma = out[..., 2]
        raw_weights = out[..., 4]
        point_offsets = out[..., 5:8]

        distance_offsets = (
            distance_offsets
            * self.distance_scale
            / self.num_distance_samples
            * nn.sigmoid(distance_sigma + self.distance_bias)
        )

        if self.use_voxel_grid:
            _, voxel_s_to_t = self.get_voxel_raydist_fns(rays.near[..., None, None])
            distance_offsets = distance_offsets.reshape(distance_offsets.shape[:-1] + (-1, 3))
            distance_offsets = 2.0 * distance_offsets + jnp.linspace(
                -1.0, 1.0, self.num_distance_samples // 3
            ).reshape(tuple(1 for _ in distance_offsets.shape[:-2]) + (-1, 1))
            distance_offsets = voxel_s_to_t(jnp.abs(distance_offsets)) * jnp.sign(distance_offsets)
            d = jnp.where(jnp.abs(refdirs) < 1e-5, 1e12, refdirs)
            distances = (distance_offsets - origins[..., None, :]) / d[..., None, :]
            distances = distances.reshape(
                distance_offsets.shape[:-2] + (self.num_distance_samples,)
            )
            s_distances = t_to_s(distances)
        else:
            if self.num_far_samples > 0:
                s1 = jnp.linspace(1e-8, 0.9, self.num_distance_samples - self.num_far_samples)
                s2 = jnp.linspace(0.9, 1.0 - 1e-8, self.num_far_samples)
                start = jnp.concatenate([s1, s2], axis=-1)
            else:
                start = jnp.linspace(1e-8, 1.0 - 1e-8, self.num_distance_samples)
            start = start.reshape(tuple(1 for _ in distance_offsets.shape[:-1]) + (-1,))
            s = distance_offsets + start
            # Fold out-of-range samples back into [0, 1] (triangle wave).
            s_floor = jnp.floor(s).astype(jnp.int32)
            s_frac = s - s_floor.astype(jnp.float32)
            s_distances = jnp.where((s_floor % 2) == 0, s_frac, 1.0 - s_frac)
            distances = s_to_t(s_distances)

        if self.use_sorted_distances:
            idx = jnp.argsort(distances, axis=-1)
            take = lambda v: jnp.take_along_axis(v, idx, axis=-1)
            distances, s_distances = take(distances), take(s_distances)
            raw_weights, point_sigma = take(raw_weights), take(point_sigma)
            point_offsets = jnp.take_along_axis(
                point_offsets, jnp.repeat(idx[..., None], 3, axis=-1), axis=-1
            )

        ref_mask = (
            (distances > self.distance_near)
            & (distances < self.distance_far)
            & (distances > near)
            & (distances < far)
        ).astype(jnp.float32)
        distances = jnp.clip(distances, self.distance_near, self.distance_far)

        points = origins[..., None, :] + distances[..., None] * refdirs[..., None, :]
        if self.use_point_offsets:
            point_offsets = (
                nn.tanh(point_offsets)
                * self.point_offset_scale
                * nn.sigmoid(point_sigma + self.point_offset_bias)[..., None]
            )
            points = points + point_offsets

        return points, raw_weights, ref_mask, s_distances, distances, env_rgb, env_alpha

    @nn.compact
    def __call__(
        self,
        rng,
        rays,
        sampler_results,
        origins,
        refdirs,
        roughness: Any = None,
        shader_bottleneck: Any = None,
        train: bool = True,
        train_frac: float = 1.0,
        dist_only: bool = False,
        **kwargs,
    ):
        outputs = {}
        origins = origins.reshape(refdirs.shape[:-2] + (-1, 3)) * jnp.ones_like(refdirs)

        if "cache_tdist" in kwargs:
            outputs["cache_sdist"] = self.convert_to_sdist(rays, kwargs["cache_tdist"])
            if dist_only:
                return outputs

        if self.rotate_illumination and self.config.rotate_illumination:
            light_idx = rays.light_idx
            sh = light_idx.shape
            rot = self.light_rotation_matrix.reshape(
                tuple(1 for _ in sh[:-1]) + (self.config.num_illuminations, 9)
            )
            rot = jnp.take_along_axis(rot, light_idx[..., None], axis=-2)[..., 0, :]
            rot = rot.reshape(sh[:-1] + (1, 3, 3))
            refdirs = (
                rot[..., :3, 0] * refdirs[..., 0:1]
                + rot[..., :3, 1] * refdirs[..., 1:2]
                + rot[..., :3, 2] * refdirs[..., 2:3]
            )

        x = []
        if self.use_origins:
            x.append(self.origins_enc_fn(origins))

        if self.use_grid:
            key, rng = jaxutil.random_split(rng)
            pa_kwargs = self.get_predict_appearance_kwargs(key, rays, sampler_results)
            bottleneck = self.predict_appearance_feature(
                sampler_results, train=train, **pa_kwargs
            ) * jnp.ones_like(refdirs[..., :1])
        elif self.use_shader_bottleneck:
            bottleneck = shader_bottleneck
        else:
            bottleneck = jnp.zeros_like(refdirs)

        if self.use_bottleneck:
            x.append(bottleneck)
        if self.config.multi_illumination and self.use_illumination_feature:
            x.append(self.get_light_vec(rays, bottleneck))
        if self.use_shader_bottleneck:
            x.append(shader_bottleneck)

        s_distances = jnp.zeros_like(bottleneck[..., 0:1])
        distances = jnp.zeros_like(bottleneck[..., 0:1])
        raw_weights = jnp.ones_like(bottleneck[..., 0:1])
        ref_weights = jnp.ones_like(bottleneck[..., 0:1])
        ref_mask = jnp.ones_like(bottleneck[..., 0:1])
        env_rgb = jnp.zeros_like(bottleneck[..., 0:3])
        env_alpha = jnp.zeros_like(bottleneck[..., 0:1])
        points = None

        if self.use_distance_prediction:
            key, rng = jaxutil.random_split(rng)
            (points, raw_weights, ref_mask, s_distances, distances, env_rgb, env_alpha) = (
                self.predict_points(key, rays, origins, refdirs, bottleneck, roughness, **kwargs)
            )
            points = self.ref_warp_fn(points) if self.ref_warp_fn is not None else points
            ref_weights = jax.nn.softmax(raw_weights, axis=-1)
            s_distances = (s_distances * ref_weights).sum(axis=-1, keepdims=True)
            ref_weights = ref_weights * ref_mask * env_alpha

        if self.use_far_field_points:
            points = ref_utils.l2_normalize(refdirs)[..., None, :]

        if self.use_reflectance_grid:
            ref_roughness = (
                roughness[..., None, :] * distances[..., None] * self.roughness_scale
                if self.use_roughness
                else None
            )
            ref_grid_feat = self.reflectance_grid(
                points,
                x_scale=ref_roughness,
                per_level_fn=lambda f: f,
                train=train,
                train_frac=train_frac,
            )
            if self.use_density_prediction:
                ref_density = self.run_density_network(ref_grid_feat)
                ref_weights, _, _ = render.compute_alpha_weights(
                    ref_density * self.density_activation(raw_weights + self.density_bias),
                    None,
                    refdirs,
                    opaque_background=False,
                    delta=jnp.ones_like(distances) / self.num_distance_samples,
                )
                ref_weights = ref_weights * ref_mask
                s_distances = (s_distances * ref_weights).sum(axis=-1, keepdims=True)

            if self.per_ref_feature_output:
                feat_x = self._run_skip_mlp(
                    ref_grid_feat,
                    self.view_dependent_layers,
                    self.net_depth_viewdirs,
                    self.skip_layer_dir,
                )
                raw_rgba = self.output_rgba_layer(feat_x)
                rgb = self.rgb_activation(self.rgb_premultiplier * raw_rgba[..., :3] + self.rgb_bias)
                alpha = nn.sigmoid(raw_rgba[..., -1:] - 1.0)
                rgb = (rgb[..., :3] * ref_weights[..., None]).sum(axis=-2)
                outputs["incoming_rgb"] = rgb
                outputs["incoming_alpha"] = alpha
                outputs["incoming_env_rgba"] = jnp.concatenate([env_rgb, env_alpha], axis=-1)
                outputs["incoming_weights"] = ref_weights
                outputs["incoming_s_dist"] = s_distances
                outputs["incoming_dist"] = distances
                outputs["incoming_acc"] = ref_weights.sum(axis=-1)
                return outputs

            ref_grid_feat = (ref_grid_feat * ref_weights[..., None]).sum(axis=-2)
            x.append(ref_grid_feat)
        else:
            s_distances = s_distances.mean(axis=-1, keepdims=True)

        if self.use_points:
            p = ref_utils.l2_normalize(points)
            if self.use_points_ide:
                x.append(self.points_enc_fn(p, roughness[..., None, :]).reshape(
                    origins.shape[:-1] + (-1,)
                ))
            else:
                x.append(self.points_enc_fn(p, train_frac).reshape(origins.shape[:-1] + (-1,)))

        if self.use_sphere_points:
            sphere_points = ref_utils.l2_normalize(origins + self.sphere_radius * refdirs)
            x.append(self.sphere_points_enc_fn(sphere_points))

        if self.use_directional_enc:
            x.append(self.dir_enc_fn(refdirs, roughness))

        x = jnp.concatenate(x, axis=-1)
        if self.use_lights:
            ambient_x = self._run_skip_mlp(
                x, self.ambient_view_dependent_layers, self.net_depth_viewdirs, self.skip_layer_dir
            )
            lights_enc = self.lights_enc_fn(
                self.warp_fn(rays.lights[..., None, :] * jnp.ones_like(origins))
                if self.warp_fn is not None
                else rays.lights[..., None, :] * jnp.ones_like(origins)
            )
            x = self._run_skip_mlp(
                jnp.concatenate([x, lights_enc], axis=-1),
                self.view_dependent_layers,
                self.net_depth_viewdirs,
                self.skip_layer_dir,
            )
        else:
            x = self._run_skip_mlp(
                x, self.view_dependent_layers, self.net_depth_viewdirs, self.skip_layer_dir
            )
            ambient_x = x

        raw_rgba = self.output_rgba_layer(x)
        rgb = self.rgb_activation(self.rgb_premultiplier * raw_rgba[..., :-1] + self.rgb_bias)
        alpha = jnp.clip(self.alpha_activation(raw_rgba[..., -1:] + self.alpha_bias), 0.0, 1.0)

        if self.config.multi_illumination and self.multiple_illumination_outputs:
            light_idx = rays.light_idx[..., None, :] * jnp.ones_like(bottleneck[..., 0:1]).astype(
                rays.light_idx.dtype
            )
            rgb = rgb.reshape(rgb.shape[:-1] + (self.num_illumination_outputs, -1))
            rgb = jnp.take_along_axis(rgb, light_idx[..., None], axis=-2)[..., 0, :]

        ambient_rgb = self.ambient_rgb_activation(
            self.output_ambient_rgb_layer(ambient_x) + self.ambient_rgb_bias
        )

        outputs["incoming_rgb"] = jnp.clip(rgb, 0.0, self.rgb_max)
        outputs["incoming_ambient_rgb"] = jnp.clip(ambient_rgb, 0.0, self.ambient_rgb_max)
        outputs["incoming_alpha"] = alpha
        outputs["incoming_weights"] = ref_weights
        outputs["incoming_s_dist"] = s_distances
        outputs["incoming_dist"] = distances
        outputs["incoming_env_rgba"] = jnp.concatenate([env_rgb, env_alpha], axis=-1)
        outputs["incoming_acc"] = ref_weights.sum(axis=-1)
        return outputs


@gin.configurable
class SurfaceLightFieldMLP(BaseSurfaceLightFieldMLP):
    pass


@gin.configurable
class TransientSurfaceLightFieldMLP(BaseSurfaceLightFieldMLP):
    use_indirect: bool = True
