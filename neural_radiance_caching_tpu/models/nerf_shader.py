"""The radiance-cache shader (NeRFMLP / TransientNeRFMLP).

Behavioral parity target: reference internal/nerf.py (BaseNeRFMLP). Per-point
radiance decomposes into:
  * direct: learned light power x falloff x BRDF nets, shadowed by firing
    shadow rays back into the radiance cache with weights_only=True
    (nerf.py:1196-1342),
  * indirect: tint * integrated-BRDF * surface-light-field reflection +
    an irradiance net (transient variant emits per-point time-binned
    indirect radiance, nerf.py:1656-1777),
  * ambient: an irradiance head + env-map specular.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.models import shading, surface_light_field
from neural_radiance_caching_tpu.ops import coord, geopoly, math, ref_utils
from neural_radiance_caching_tpu.ops import render_utils
from neural_radiance_caching_tpu.utils import jaxutil
from neural_radiance_caching_tpu.utils.jaxutil import stopgrad_with_weight


def canonical_light_features(lights, means, normals, viewdirs):
    """Azimuth-invariant light conditioning in the local surface frame.

    lights/viewdirs broadcast against means/normals `[..., S, 3]`. Returns
    `[..., S, 5]`: [n·l, n·v, l_t·v_t, |l_t||v_t|, log d] with l the unit
    point→light direction, v the unit outgoing view direction, *_t their
    tangential components, d the light distance. The channels depend only
    on elevations, relative view↔light azimuth, and distance — jointly
    rotating light and view about the local normal leaves them unchanged
    (the absolute-azimuth gauge an isotropic response cannot depend on).
    A novel light azimuth at eval therefore lands inside the bounded,
    densely-sampled canonical ranges instead of outside the raw-position
    encoding's support (the relight-generalization gap on the physical
    multi-illum row, BASELINE.md r3). The frame inputs are stop-gradiented:
    conditioning must not drive geometry.
    """
    sg = jax.lax.stop_gradient
    mu = sg(means)
    n = sg(normals)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
    offset = lights - mu
    dist = jnp.linalg.norm(offset, axis=-1, keepdims=True)
    l_dir = offset / jnp.maximum(dist, 1e-6)
    v_dir = -viewdirs * jnp.ones_like(n)
    v_dir = v_dir / jnp.maximum(
        jnp.linalg.norm(v_dir, axis=-1, keepdims=True), 1e-6
    )
    cos_l = math.dot(n, l_dir)
    cos_v = math.dot(n, v_dir)
    l_tan = l_dir - cos_l * n
    v_tan = v_dir - cos_v * n
    tan_dot = math.dot(l_tan, v_tan)
    sin_prod = jnp.linalg.norm(l_tan, axis=-1, keepdims=True) * jnp.linalg.norm(
        v_tan, axis=-1, keepdims=True
    )
    return jnp.concatenate(
        [cos_l, cos_v, tan_dot, sin_prod, jnp.log(jnp.maximum(dist, 1e-6))],
        axis=-1,
    )


@gin.configurable
class BaseNeRFMLP(shading.BaseShader):
    config: Any = None

    use_reflections: bool = False
    use_occlusions: bool = False
    cull_backfacing: bool = True
    use_normals_feature: bool = False
    use_pred_normals_feature: bool = False

    enable_pred_roughness: bool = False
    roughness_activation: Callable[..., Any] = nn.softplus
    roughness_bias: float = -1.0
    use_specular_tint: bool = False

    use_learned_vignette_map: bool = False
    use_exposure_at_bottleneck: bool = False

    num_glo_features: int = 0
    num_glo_embeddings: int = 1000

    num_light_features: int = 64
    use_illumination_feature: bool = False
    multiple_illumination_outputs: bool = True

    net_depth_integrated_brdf: int = 2
    net_width_integrated_brdf: int = 64
    skip_layer_integrated_brdf: int = 4

    deg_brdf: int = 2
    net_depth_brdf: int = 2
    net_width_brdf: int = 64
    skip_layer_brdf: int = 4
    brdf_bias: float = -1.09861228867

    simple_brdf: bool = False
    use_ambient: bool = True
    use_indirect: bool = True
    use_active: bool = False
    run_surface_light_field: bool = True

    use_corrected_normals: bool = False
    stopgrad_normals_weight: float = 1.0
    stopgrad_shading_normals_weight: float = 1.0

    surface_lf_distance_near: float = float("inf")
    surface_lf_distance_far: float = float("inf")
    surface_lf_params: Any = None

    rgb_max: float = float("inf")

    use_env_map: bool = False
    env_map_near: float = float("inf")
    env_map_far: float = float("inf")
    env_map_params: Any = None

    weight_thold: float = 0.0
    irradiance_activation: Callable[..., Any] = nn.softplus
    irradiance_bias: float = -2.0
    ambient_irradiance_activation: Callable[..., Any] = nn.softplus
    ambient_irradiance_bias: float = -2.0
    albedo_activation: Callable[..., Any] = nn.sigmoid
    albedo_bias: float = -1.0

    deg_lights: int = 2
    net_depth_irradiance: int = 2
    net_width_irradiance: int = 64
    bottleneck_irradiance: int = 64
    skip_layer_irradiance: int = 4

    optimize_light: bool = True
    light_power_bias: float = 200.0
    light_power_activation: Callable[..., Any] = math.abs
    light_max_angle: float = 0.0

    stopgrad_occ_weight: Tuple[float, float] = (0.0, 0.0)
    stopgrad_direct_weight: float = 1.0
    stopgrad_indirect_weight: float = 1.0
    stopgrad_ambient_weight: float = 1.0
    stopgrad_light_radiance_weight: float = 1.0
    indirect_scale: float = 1.0

    def setup(self):
        self.pos_basis_t = jnp.array(
            geopoly.generate_basis(self.basis_shape, self.basis_subdivisions)
        ).T
        dense = self._make_dense_layer_factory()
        self.layers = [dense(self.net_width) for _ in range(self.net_depth)]
        self.bottleneck_layer = dense(self.bottleneck_width)

        if self.config.multi_illumination:
            self.light_vecs = nn.Embed(
                num_embeddings=self.config.num_illuminations,
                features=self.num_light_features,
                name="light_vecs",
            )

        self.grid = self._make_grid(name="appearance_grid")

        # Surface light field (+ env map).
        slf_params = dict(self.surface_lf_params or {})
        slf_params["distance_near"] = self.surface_lf_distance_near
        if self.use_env_map and self.config.env_map_distance < float("inf"):
            slf_params["distance_far"] = self.config.env_map_distance
        else:
            slf_params["distance_far"] = self.surface_lf_distance_far

        slf_cls = (
            surface_light_field.TransientSurfaceLightFieldMLP
            if self.config.use_transient
            else surface_light_field.SurfaceLightFieldMLP
        )
        self.surface_lf = slf_cls(
            name="SurfaceLightField", use_env_alpha=True, config=self.config, **slf_params
        )
        if not self.config.use_transient and self.use_env_map:
            env_params = dict(self.env_map_params or {})
            env_params["distance_near"] = self.env_map_near
            env_params["distance_far"] = self.env_map_far
            self.env_map = surface_light_field.SurfaceLightFieldMLP(
                name="EnvMap", config=self.config, **env_params
            )

        # Output heads.
        self.irradiance_layer = dense(self.config.num_rgb_channels)
        if self.config.use_transient:
            self.transient_indirect_layer = dense(
                self.config.num_rgb_channels * self.config.n_bins
            )
        else:
            self.indirect_layer = dense(self.config.num_rgb_channels)
        self.ambient_irradiance_layer = dense(self.config.num_rgb_channels)
        self.albedo_layer = dense(self.config.num_rgb_channels)
        self.direct_tint_layer = dense(self.config.num_rgb_channels)
        self.tint_layer = dense(self.config.num_rgb_channels)
        self.roughness_layer = dense(1)

        # BRDF nets.
        self.integrated_brdf_layers = [
            dense(self.net_width_integrated_brdf) for _ in range(self.net_depth_integrated_brdf)
        ]
        self.output_integrated_brdf_layer = dense(1)
        self.brdf_layers = [dense(self.net_width_brdf) for _ in range(self.net_depth_brdf)]
        self.output_brdf_layer = dense(1)
        self.brdf_enc_fn = lambda d: coord.pos_enc(d, 0, self.deg_brdf, True)

        # Irradiance net.
        self.lights_enc_fn = lambda l: coord.pos_enc(l, 0, self.deg_lights, True)
        self.irradiance_layers = [
            dense(self.net_width_irradiance) for _ in range(self.net_depth_irradiance - 1)
        ] + [dense(self.bottleneck_irradiance)]

        # Light power (learnable or constant).
        if self.optimize_light:
            self.light_power = self.param(
                "light_power", lambda key, shape: jnp.full(shape, self.light_power_bias), (1,)
            )
        else:
            self.light_power = self.light_power_bias

    # --- small nets ----------------------------------------------------------

    def _skip_mlp(self, x, layers, depth, skip):
        inputs = x
        for i in range(depth):
            x = self.net_activation(layers[i](x))
            if i % skip == 0 and i > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        return x

    def run_irradiance_network(self, x):
        return self._skip_mlp(
            x, self.irradiance_layers, self.net_depth_irradiance, self.skip_layer_irradiance
        )

    def get_light_vec(self, rays, feature):
        light_vec = jnp.zeros_like(feature[..., 0:0])
        if self.config.multi_illumination:
            light_idx = rays.light_idx[..., 0]
            light_vec = self.light_vecs(light_idx)
            light_vec = light_vec[..., None, :] * jnp.ones_like(feature[..., 0:1])
        return light_vec

    def get_bottleneck_feature(self, rng, feature, exposure=None):
        if self.bottleneck_width > 0:
            bottleneck = self.bottleneck_layer(feature)
            if rng is not None and self.bottleneck_noise > 0:
                key, rng = jaxutil.random_split(rng)
                bottleneck += self.bottleneck_noise * jax.random.normal(key, bottleneck.shape)
            if self.use_exposure_at_bottleneck and exposure is not None:
                bottleneck += jnp.log(exposure)[..., None, :]
            return bottleneck
        return jnp.zeros_like(feature[..., 0:0])

    def get_integrated_brdf(self, normals, viewdirs, bottleneck):
        """Hemisphere-integrated BRDF scalar from (bottleneck, n.v)."""
        dotprod = math.dot(normals, -viewdirs[..., None, :])
        x = jnp.concatenate([bottleneck, dotprod], axis=-1)
        x = self._skip_mlp(
            x,
            self.integrated_brdf_layers,
            self.net_depth_integrated_brdf,
            self.skip_layer_integrated_brdf,
        )
        return nn.sigmoid(self.output_integrated_brdf_layer(x) + jnp.log(3.0))

    def get_brdf_light(self, normals, viewdirs, lightdirs, bottleneck, roughness):
        """Point-light BRDF net conditioned on the shading dot products."""
        del roughness
        halfdirs = math.normalize(-viewdirs[..., None, :] + lightdirs)
        brdf_dot = math.dot(normals, halfdirs)
        if self.simple_brdf:
            brdf_input = jnp.concatenate([brdf_dot, brdf_dot], axis=-1)
        else:
            n_dot_v = math.dot(normals, -viewdirs[..., None, :])
            n_dot_l = math.dot(normals, lightdirs)
            pair = jnp.concatenate([n_dot_v, n_dot_l], axis=-1)
            brdf_input = jnp.concatenate([jnp.sort(pair, axis=-1), brdf_dot], axis=-1)
        brdf_input = jnp.concatenate([bottleneck, self.brdf_enc_fn(brdf_input)], axis=-1)
        x = self._skip_mlp(brdf_input, self.brdf_layers, self.net_depth_brdf, self.skip_layer_brdf)
        return nn.softplus(self.output_brdf_layer(x) + self.brdf_bias)

    def get_irradiance(self, lights, bottleneck):
        x = jnp.concatenate([bottleneck, self.lights_enc_fn(lights)], axis=-1)
        x = self.run_irradiance_network(x)
        return self.irradiance_activation(self.irradiance_layer(x) + self.irradiance_bias)

    def light_conditioning(self, rays, means, normals):
        """Per-sample light conditioning for the indirect nets.

        Default: the raw world light position broadcast per sample (the
        reference's convention). With `Config.light_canonical_frame`, the
        absolute-azimuth-free surface-frame encoding of
        `canonical_light_features` (see its docstring), the relight-
        generalization lever for the multi-illum rows (BASELINE.md r3).
        """
        lights = rays.lights[..., None, :] * jnp.ones_like(normals)
        if not getattr(self.config, "light_canonical_frame", False):
            return lights
        return canonical_light_features(
            rays.lights[..., None, :], means, normals, rays.viewdirs[..., None, :]
        )

    def _get_refdirs(self, viewdirs, normals, kwargs):
        if "refdirs" in kwargs:
            refdirs = kwargs.pop("refdirs").reshape(normals.shape[:-2] + (-1, 3))
        else:
            refdirs = ref_utils.reflect(-viewdirs[..., None, :], normals)
        if not self.use_reflections:
            refdirs = viewdirs[..., None, :] * jnp.ones_like(refdirs)
        return refdirs

    def get_predict_appearance_kwargs(self, rng, rays, sampler_results, **kwargs):
        out = super().get_predict_appearance_kwargs(rng, rays, sampler_results, **kwargs)
        if self.grid is not None:
            out["viewdirs"] = (
                jnp.ones_like(sampler_results["means"][..., None, :])
                * rays.viewdirs[..., None, None, :]
            )
        return out

    # --- lighting components -------------------------------------------------

    def _compute_light_radiance(
        self, rng, rays, sampler_results, radiance_cache, light_dirs, light_power, light_dists,
        **kwargs,
    ):
        """Light radiance at each sample (power, falloff, cone cutoff, SL)."""
        del rng
        light_radiance_mult = jnp.ones_like(light_dists)

        if self.config.learnable_light and radiance_cache and radiance_cache.share_light_power:
            means = sampler_results["means"]
            ones = jnp.ones_like(means)
            light_radiance, light_radiance_mult = radiance_cache.shader.learnable_light(
                means,
                rays.viewdirs[..., None, :] * ones,
                rays.lights[..., None, :] * ones,
                rays.vcam_look[..., None, :] * ones,
                rays.vcam_up[..., None, :] * ones,
                rays.vcam_origins[..., None, :] * ones,
                env_map=kwargs.get("env_map"),
                env_map_w=kwargs.get("env_map_w"),
                env_map_h=kwargs.get("env_map_h"),
            )
        else:
            if (light_power is None) or not (radiance_cache and radiance_cache.share_light_power):
                light_radiance = jnp.ones_like(light_dists) * self.light_power_activation(
                    self.light_power
                )
            else:
                light_radiance = jnp.ones_like(light_dists) * light_power
            if self.config.use_falloff:
                light_radiance = light_radiance / jnp.maximum(light_dists**2, 1e-5)
            if self.light_max_angle > 0.0:
                angle_dot = math.dot(-light_dirs, rays.vcam_look[..., None, :], keepdims=True)
                angle = jnp.arccos(angle_dot)
                mask = ((angle * 180.0 / jnp.pi) <= (self.light_max_angle / 2.0)) & (
                    angle_dot > 0.0
                )
                light_radiance = jnp.where(mask, light_radiance, 0.0)

        if self.config.light_zero:
            light_radiance = jnp.where(
                light_dists < self.config.light_near, 0.0, light_radiance
            )

        light_radiance_before_occ = light_radiance

        if self.config.sl_relight:
            means = sampler_results["means"]
            ones = jnp.ones_like(means)
            sl_mult = render_utils.get_sl_color(
                kwargs["env_map"],
                kwargs["env_map_w"],
                kwargs["env_map_h"],
                rays.vcam_up[..., None, :] * ones,
                rays.vcam_look[..., None, :] * ones,
                means,
                rays.vcam_origins[..., None, :] * ones,
                hfov=self.config.sl_hfov,
                vfov=self.config.sl_vfov,
                shift=self.config.sl_shift,
                mult=self.config.sl_mult,
                invert=self.config.sl_invert,
            )
            light_radiance = light_radiance * sl_mult

        light_radiance = stopgrad_with_weight(
            light_radiance, self.stopgrad_light_radiance_weight
        )
        return light_radiance, light_radiance_mult, light_radiance_before_occ

    def _compute_occlusions(
        self, rng, rays, sampler_results, shading_normals, light_dirs, light_dists,
        radiance_cache, train_frac, train, is_secondary, **kwargs,
    ):
        """Shadow rays from each sample toward the light, traced in the cache."""
        del sampler_results, shading_normals, light_dirs
        if (
            not self.config.use_occlusions
            or (not is_secondary and self.config.occlusions_secondary_only)
            or (is_secondary and self.config.occlusions_primary_only)
        ):
            occ = jnp.zeros_like(light_dists)
            return jnp.repeat(occ, self.num_rgb_channels, axis=-1)

        filtered = kwargs["filtered_sampler_results"]

        if self.config.shadow_near_rate > 0:
            w = jnp.clip(
                (train_frac - self.config.shadow_near_start_frac) / self.config.shadow_near_rate,
                0.0,
                1.0,
            )
            shadow_near = w * self.config.shadow_near_min + (1.0 - w) * self.config.shadow_near_max
        else:
            shadow_near = self.config.shadow_near_min

        key, rng = jaxutil.random_split(rng)
        ref_rays, _ = render_utils.get_secondary_rays(
            key,
            rays,
            filtered["means"],
            rays.viewdirs,
            filtered[self.config.shadow_normals_target],
            {"roughness": jnp.ones_like(light_dists)},
            refdir_eps=shadow_near,
            normal_eps=self.config.secondary_normal_eps,
            random_generator_2d=radiance_cache.random_generator_2d if radiance_cache else None,
            stratified_sampling=False,
            use_mis=True,
            samplers=radiance_cache.active_importance_samplers if radiance_cache else None,
            num_secondary_samples=1,
            light_sampler_results={
                "origins": filtered["means"][..., None, :],
                "lights": rays.lights[..., None, None, :]
                * jnp.ones_like(filtered["means"][..., None, :]),
            },
            offset_origins=False,
            far=self.config.secondary_far,
        )

        light_offset = rays.lights[..., None, :] - filtered["means"]
        single_light_dists = jnp.linalg.norm(light_offset, axis=-1, keepdims=True)
        ref_rays = ref_rays.replace(
            far=jnp.clip(
                single_light_dists.reshape(ref_rays.far.shape) - self.config.light_near,
                ref_rays.near,
                ref_rays.far,
            ),
            normals=jax.lax.stop_gradient(
                filtered[self.config.shadow_normals_target].reshape(ref_rays.viewdirs.shape)
            ),
        )

        key, rng = jaxutil.random_split(rng)
        ref_outputs = radiance_cache.cache(
            key,
            ref_rays,
            train_frac=train_frac,
            train=train,
            compute_extras=False,
            stopgrad_proposal=True,
            stopgrad_weights=True,
            is_secondary=True,
            weights_only=True,
            radiance_cache=radiance_cache,
            stopgrad_cache_weight=self.stopgrad_occ_weight,
        )
        acc = ref_outputs["render"]["acc"].reshape(single_light_dists.shape[:-1] + (1,))
        occ = jax.lax.stop_gradient(jnp.repeat(acc, self.num_rgb_channels, axis=-1))

        baseline = jnp.linalg.norm(
            rays.lights[..., None, :] - rays.origins[..., None, :], axis=-1, keepdims=True
        )
        occ = jnp.where(baseline < 1e-3, jnp.zeros_like(occ), occ)

        if self.config.occ_threshold_rate > 0:
            w = jnp.clip(
                (train_frac - self.config.occ_threshold_start_frac)
                / self.config.occ_threshold_rate,
                0.0,
                1.0,
            )
            occ_threshold = (
                w * self.config.occ_threshold_min + (1.0 - w) * self.config.occ_threshold_max
            )
        else:
            occ_threshold = self.config.occ_threshold_min
        return jnp.where(occ <= occ_threshold, jnp.zeros_like(occ), occ)

    def _compute_direct_lighting(
        self, rng, rays, sampler_results, feature, shading_normals, roughness, bottleneck,
        normals, n_dot_l, light_radiance, light_dirs, radiance_cache, train_frac, train,
    ):
        del rng, sampler_results, normals, radiance_cache, train_frac, train
        if not self.use_active:
            zero = jnp.zeros_like(feature[..., : self.config.num_rgb_channels])
            return zero, zero, zero

        albedo = self.albedo_activation(self.albedo_layer(feature) + self.albedo_bias)
        direct_tint = nn.sigmoid(self.direct_tint_layer(feature))
        light_brdf = self.get_brdf_light(
            shading_normals, rays.viewdirs, light_dirs, bottleneck, roughness
        )
        light_brdf = jnp.where(n_dot_l == 0.0, jnp.zeros_like(light_brdf), light_brdf)

        direct_diffuse = albedo * n_dot_l * light_radiance / jnp.pi
        direct_specular = direct_tint * light_brdf * light_radiance
        direct_diffuse = jnp.clip(direct_diffuse, 0.0, self.rgb_max)
        direct_specular = jnp.clip(direct_specular, 0.0, self.rgb_max)
        direct_diffuse = stopgrad_with_weight(direct_diffuse, self.stopgrad_direct_weight)
        direct_specular = stopgrad_with_weight(direct_specular, self.stopgrad_direct_weight)
        return albedo, direct_diffuse, direct_specular

    def _compute_ambient_specular(
        self, normals, viewdirs, feature, bottleneck, tint, integrated_brdf, ref_rgb
    ):
        del normals, viewdirs, feature, bottleneck
        return tint * integrated_brdf * ref_rgb

    def _query_reflected_light(self, rng, module, rays, sampler_results, means,
                               normals, roughness, bottleneck, train,
                               train_frac, kwargs):
        """Evaluate a surface-light-field-style module (SLF memory or env
        map) along the reflected view direction at the given points."""
        return module(
            rng, rays, sampler_results, means,
            self._get_refdirs(rays.viewdirs, normals, dict(kwargs)),
            roughness=roughness, shader_bottleneck=bottleneck,
            train=train, train_frac=train_frac,
        )

    # --- top-level appearance --------------------------------------------------

    def predict_appearance(
        self, rng, rays, sampler_results, train_frac=1.0, train=True, zero_glo=False,
        is_secondary=False, radiance_cache=None, light_power=None, passes=(), **kwargs,
    ):
        key, rng = jaxutil.random_split(rng)
        pa_kwargs = self.get_predict_appearance_kwargs(key, rays, sampler_results)
        feature = self.predict_appearance_feature(
            sampler_results, train=train, train_frac=train_frac,
            is_secondary=bool(is_secondary), **pa_kwargs
        )

        if self.config.multi_illumination and self.use_illumination_feature:
            feature = jnp.concatenate([feature, self.get_light_vec(rays, feature)], axis=-1)

        key, rng = jaxutil.random_split(rng)
        bottleneck = self.get_bottleneck_feature(key, feature, rays.exposure_values)

        roughness = self.roughness_activation(self.roughness_layer(feature) + self.roughness_bias)

        normals = sampler_results[self.normals_target]
        if self.stopgrad_normals_weight < 1.0:
            normals = stopgrad_with_weight(normals, self.stopgrad_normals_weight)
        shading_normals = sampler_results[self.normals_target]
        if self.stopgrad_shading_normals_weight < 1.0:
            shading_normals = stopgrad_with_weight(
                shading_normals, self.stopgrad_shading_normals_weight
            )

        fn = self._predict_appearance_active if self.use_active else self._predict_appearance_passive
        key, rng = jaxutil.random_split(rng)
        return fn(
            key, rays, sampler_results, feature, bottleneck, roughness,
            normals, shading_normals,
            train_frac=train_frac, train=train, zero_glo=zero_glo,
            is_secondary=is_secondary, radiance_cache=radiance_cache,
            light_power=light_power, passes=passes, **kwargs,
        )

    def _predict_appearance_active(
        self, rng, rays, sampler_results, feature, bottleneck, roughness, normals,
        shading_normals, train_frac=1.0, train=True, zero_glo=False, is_secondary=False,
        radiance_cache=None, light_power=None, passes=("direct", "occ", "indirect"), **kwargs,
    ):
        means = sampler_results["means"]
        viewdirs = rays.viewdirs
        outputs = {}

        light_offset = rays.lights[..., None, :] - means
        light_dists = jnp.linalg.norm(light_offset, axis=-1, keepdims=True)
        light_dirs = light_offset / jnp.maximum(light_dists, 1e-5)

        key, rng = jaxutil.random_split(rng)
        light_radiance, light_radiance_mult, light_radiance_before_occ = (
            self._compute_light_radiance(
                key, rays, sampler_results, radiance_cache, light_dirs, light_power, light_dists,
                **kwargs,
            )
        )

        n_dot_l = jnp.maximum(0.0, math.dot(shading_normals, light_dirs))

        if len(passes) == 0 or "occ" in passes:
            key, rng = jaxutil.random_split(rng)
            occ = self._compute_occlusions(
                key, rays, sampler_results, shading_normals, light_dirs, light_dists,
                radiance_cache, train_frac, train, is_secondary, **kwargs,
            )
        else:
            occ = jnp.zeros_like(n_dot_l)
        occ = jnp.where(n_dot_l <= 0.0, jnp.ones_like(occ), occ)
        light_radiance = light_radiance * (1.0 - occ)

        key, rng = jaxutil.random_split(rng)
        albedo, direct_diffuse, direct_specular = self._compute_direct_lighting(
            key, rays, sampler_results, feature, shading_normals, roughness, bottleneck,
            normals, n_dot_l, light_radiance, light_dirs, radiance_cache, train_frac, train,
        )
        direct = direct_diffuse + direct_specular

        key, rng = jaxutil.random_split(rng)
        incoming_outputs = self._query_reflected_light(
            key, self.surface_lf, rays, sampler_results, means, normals,
            roughness, bottleneck, train, train_frac, kwargs,
        )
        ref_rgb = incoming_outputs["incoming_rgb"]
        ambient_ref_rgb = incoming_outputs["incoming_ambient_rgb"]

        (
            indirect_diffuse,
            indirect_specular,
            transient_indirect,
            transient_indirect_diffuse,
            transient_indirect_specular,
        ) = self._compute_indirect_lighting(
            feature, means, normals, shading_normals, ref_rgb, bottleneck, viewdirs, roughness,
            rays, light_dirs, light_radiance_mult,
        )

        ambient_irradiance = self.ambient_irradiance_activation(
            self.ambient_irradiance_layer(feature) + self.ambient_irradiance_bias
        )
        if self.use_ambient:
            tint = nn.sigmoid(self.tint_layer(feature))
            integrated_brdf = self.get_integrated_brdf(normals, viewdirs, bottleneck)
            ambient_diffuse = ambient_irradiance
            ambient_specular = self._compute_ambient_specular(
                normals, viewdirs, feature, bottleneck, tint, integrated_brdf, ambient_ref_rgb
            )
        else:
            ambient_diffuse = jnp.zeros_like(ambient_ref_rgb)
            ambient_specular = jnp.zeros_like(ambient_ref_rgb)

        # Gradient damping per lighting component: ambient additionally
        # clamps to rgb_max before the partial stop-gradient.
        damp_ambient = lambda x: stopgrad_with_weight(
            jnp.clip(x, 0.0, self.rgb_max), self.stopgrad_ambient_weight
        )
        damp_indirect = lambda x: stopgrad_with_weight(
            x, self.stopgrad_indirect_weight
        )
        ambient_diffuse, ambient_specular = map(
            damp_ambient, (ambient_diffuse, ambient_specular)
        )
        indirect_diffuse, indirect_specular = map(
            damp_indirect, (indirect_diffuse, indirect_specular)
        )
        ambient = ambient_diffuse + ambient_specular
        indirect = indirect_diffuse + indirect_specular

        if len(passes) > 0 and "indirect" not in passes:
            # Direct-only probe pass: the indirect machinery above still ran
            # (it shares RNG draws with the full pass) but is discarded.
            return {
                "rgb": direct,
                "direct_rgb": direct,
                "indirect_rgb": None,
                "transient_indirect": None,
            }

        rgb = direct + ambient + indirect
        like_rgb = lambda x: x * jnp.ones_like(rgb)
        outputs.update(
            rgb=rgb,
            direct_rgb=direct,
            ambient_rgb=ambient,
            albedo_rgb=albedo,
            # Per-channel splits; ambient folds into the indirect buffers.
            diffuse_rgb=direct_diffuse + indirect_diffuse + ambient_diffuse,
            specular_rgb=direct_specular + indirect_specular + ambient_specular,
            indirect_rgb=indirect + ambient,
            direct_diffuse_rgb=direct_diffuse,
            direct_specular_rgb=direct_specular,
            indirect_diffuse_rgb=indirect_diffuse + ambient_diffuse,
            indirect_specular_rgb=indirect_specular + ambient_specular,
            ambient_diffuse_rgb=ambient_diffuse,
            ambient_specular_rgb=ambient_specular,
            # Shadowing: primary occ is zeroed when the sampler already
            # carries one (resampled secondary shading).
            occ=(
                like_rgb(occ) if "occ" not in sampler_results
                else jnp.zeros_like(rgb)
            ),
            indirect_occ=like_rgb(incoming_outputs["incoming_acc"][..., None]),
            n_dot_l_rgb=like_rgb(n_dot_l),
            light_radiance_rgb=like_rgb(light_radiance_mult),
            irradiance_rgb=n_dot_l * light_radiance_before_occ / jnp.pi,
            ray_dists=jnp.linalg.norm(
                rays.origins[..., None, :] - means, axis=-1, keepdims=True
            ),
            light_dists=light_dists,
        )

        if transient_indirect is None:
            outputs["transient_indirect"] = None
        else:
            outputs["transient_indirect"] = damp_indirect(transient_indirect)
            outputs["transient_indirect_diffuse"] = damp_indirect(
                transient_indirect_diffuse
            )
            outputs["transient_indirect_specular"] = damp_indirect(
                transient_indirect_specular
            )
        return outputs

    def _predict_appearance_passive(
        self, rng, rays, sampler_results, feature, bottleneck, roughness, normals,
        shading_normals, train_frac=1.0, train=True, zero_glo=False, is_secondary=False,
        radiance_cache=None, light_power=None, passes=("diffuse", "specular"), **kwargs,
    ):
        means = sampler_results["means"]
        viewdirs = rays.viewdirs
        outputs = {}

        ambient_irradiance = self.ambient_irradiance_activation(
            self.ambient_irradiance_layer(feature) + self.ambient_irradiance_bias
        )
        ambient_diffuse = stopgrad_with_weight(
            jnp.clip(ambient_irradiance, 0.0, self.rgb_max), self.stopgrad_ambient_weight
        )

        tint = nn.sigmoid(self.tint_layer(feature))
        integrated_brdf = self.get_integrated_brdf(normals, viewdirs, bottleneck)

        if self.use_env_map:
            key, rng = jaxutil.random_split(rng)
            env_outputs = self._query_reflected_light(
                key, self.env_map, rays, sampler_results, means, normals,
                roughness, bottleneck, train, train_frac, kwargs,
            )
            env_rgb = env_outputs["incoming_ambient_rgb"]
        else:
            env_rgb = jnp.zeros_like(ambient_diffuse)

        indirect_irradiance = self.irradiance_activation(
            self.irradiance_layer(feature) + self.irradiance_bias
        )
        indirect_diffuse = stopgrad_with_weight(
            jnp.clip(indirect_irradiance, 0.0, self.rgb_max), self.stopgrad_indirect_weight
        )

        key, rng = jaxutil.random_split(rng)
        incoming_outputs = self._query_reflected_light(
            key, self.surface_lf, rays, sampler_results, means, normals,
            roughness, bottleneck, train, train_frac, kwargs,
        )
        ref_rgb = incoming_outputs["incoming_ambient_rgb"]
        ref_acc = incoming_outputs["incoming_acc"][..., None]

        ambient_specular = jnp.clip(
            self._compute_ambient_specular(
                normals, viewdirs, feature, bottleneck, tint, integrated_brdf,
                env_rgb * (1.0 - ref_acc),
            ),
            0.0,
            self.rgb_max,
        )
        indirect_specular = jnp.clip(
            self._compute_ambient_specular(
                normals, viewdirs, feature, bottleneck, tint, integrated_brdf, ref_rgb * ref_acc
            ),
            0.0,
            self.rgb_max,
        )

        ambient = ambient_diffuse + ambient_specular
        indirect = indirect_diffuse + indirect_specular
        rgb = ambient + indirect
        diffuse = ambient_diffuse + indirect_diffuse
        specular = ambient_specular + indirect_specular

        if len(passes) > 0 and "specular" not in passes:
            return {"rgb": diffuse, "diffuse_rgb": diffuse, "specular_rgb": None}

        # Passive shading has no point light: the "direct" buffers alias the
        # ambient component so downstream consumers see a uniform contract.
        zero = jnp.zeros_like(rgb)
        outputs.update(
            rgb=rgb,
            diffuse_rgb=diffuse,
            specular_rgb=specular,
            ambient_rgb=ambient,
            indirect_rgb=indirect,
            albedo_rgb=tint,
            occ=zero,
            indirect_occ=ref_acc * jnp.ones_like(rgb),
            direct_rgb=ambient,
            direct_diffuse_rgb=ambient_diffuse,
            direct_specular_rgb=ambient_specular,
            indirect_diffuse_rgb=indirect_diffuse,
            indirect_specular_rgb=indirect_specular,
            ambient_diffuse_rgb=ambient_diffuse,
            ambient_specular_rgb=ambient_specular,
            transient_indirect=None,
            n_dot_l_rgb=zero,
            light_radiance_rgb=zero,
            irradiance_rgb=zero,
            ray_dists=jnp.linalg.norm(
                rays.origins[..., None, :] - means, axis=-1, keepdims=True
            ),
        )
        return outputs


@gin.configurable
class NeRFMLP(BaseNeRFMLP):
    """Steady-state cache shader: indirect via lights-conditioned net."""

    use_active: bool = False

    def _compute_indirect_lighting(
        self, feature, means, normals, shading_normals, ref_rgb, bottleneck, viewdirs,
        roughness, rays, light_dirs, light_radiance_mult,
    ):
        if not self.use_indirect:
            zero = jnp.zeros_like(feature[..., : self.config.num_rgb_channels])
            return zero, zero, None, None, None

        integrated_brdf = self.get_integrated_brdf(normals, viewdirs, bottleneck)
        tint = nn.sigmoid(self.tint_layer(feature))

        indirect_diffuse = (
            self.get_indirect(
                lights=self.light_conditioning(rays, means, shading_normals),
                bottleneck=feature,
            )
            * self.indirect_scale
        )
        indirect_specular = tint * integrated_brdf * ref_rgb * self.indirect_scale

        if self.config.light_intensity_conditioning:
            scale = (
                light_radiance_mult * self.config.light_intensity_conditioning_scale
                + self.config.light_intensity_conditioning_bias
            )
            indirect_diffuse = indirect_diffuse * scale
            indirect_specular = indirect_specular * scale
        return indirect_diffuse, indirect_specular, None, None, None

    def get_indirect(self, lights, bottleneck):
        x = jnp.concatenate([bottleneck, self.lights_enc_fn(lights)], axis=-1)
        x = self.run_irradiance_network(x)
        return self.irradiance_activation(self.indirect_layer(x) + self.irradiance_bias)


@gin.configurable
class TransientNeRFMLP(BaseNeRFMLP):
    """Time-resolved cache shader: per-point time-binned indirect radiance."""

    use_active: bool = True

    def _compute_indirect_lighting(
        self, feature, means, normals, shading_normals, ref_rgb, bottleneck, viewdirs,
        roughness, rays, light_dirs, light_radiance_mult,
    ):
        n_bins = self.config.n_bins
        num_ch = self.config.num_rgb_channels
        if not self.use_indirect:
            zero = jnp.zeros_like(feature[..., :num_ch])
            zero_t = jnp.repeat(zero[..., None, :], n_bins, axis=-2)
            return zero, zero, zero_t, zero_t, zero_t

        integrated_brdf = self.get_integrated_brdf(normals, viewdirs, bottleneck)
        tint = nn.sigmoid(self.tint_layer(feature))
        tint_expanded = jnp.repeat(tint[..., None, :], n_bins, axis=-2).reshape(ref_rgb.shape)

        transient_indirect_diffuse = (
            self.get_indirect(
                lights=self.light_conditioning(rays, means, shading_normals),
                bottleneck=feature,
            )
            * self.indirect_scale
        )
        transient_indirect_specular = (
            tint_expanded * integrated_brdf * ref_rgb * self.indirect_scale
        )

        if self.config.light_intensity_conditioning:
            scale = (
                light_radiance_mult * self.config.light_intensity_conditioning_scale
                + self.config.light_intensity_conditioning_bias
            )
            transient_indirect_diffuse = transient_indirect_diffuse * scale
            transient_indirect_specular = transient_indirect_specular * scale

        sh = transient_indirect_diffuse.shape
        transient_indirect_diffuse = transient_indirect_diffuse.reshape(
            sh[:-1] + (n_bins, num_ch)
        )
        transient_indirect_specular = transient_indirect_specular.reshape(
            sh[:-1] + (n_bins, num_ch)
        )

        transient_indirect_diffuse, transient_indirect_specular = render_utils.zero_invalid_bins(
            transient_indirect_diffuse, transient_indirect_specular, rays, means, self.config
        )
        transient_indirect_diffuse = jnp.clip(transient_indirect_diffuse, 0.0, self.rgb_max)
        transient_indirect_specular = jnp.clip(transient_indirect_specular, 0.0, self.rgb_max)

        indirect_diffuse = transient_indirect_diffuse.sum(-2)
        indirect_specular = transient_indirect_specular.sum(-2)
        transient_indirect = transient_indirect_diffuse + transient_indirect_specular
        return (
            indirect_diffuse,
            indirect_specular,
            transient_indirect,
            transient_indirect_diffuse,
            transient_indirect_specular,
        )

    def get_indirect(self, lights, bottleneck):
        x = jnp.concatenate([bottleneck, self.lights_enc_fn(lights)], axis=-1)
        x = self.run_irradiance_network(x)
        return self.irradiance_activation(
            self.transient_indirect_layer(x) + self.irradiance_bias
        )
