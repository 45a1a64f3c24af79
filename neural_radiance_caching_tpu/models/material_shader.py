"""Physically-based material shader (Flash Cache / InvProp).

Behavioral parity target: reference internal/material.py (BaseMaterialMLP).
The shader predicts Disney-ish microfacet BRDF parameters from an NGP grid,
then estimates outgoing radiance by importance-sampling secondary rays per
(direct/indirect) x (diffuse/specular) lobe with MIS, querying the radiance
cache (or surface-light-field control variate / env map / active light)
along those rays, and Monte-Carlo integrating the clipped products.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.models import light_sampler as light_sampler_lib
from neural_radiance_caching_tpu.models import shading
from neural_radiance_caching_tpu.ops import coord, math, render_utils
from neural_radiance_caching_tpu.utils import jaxutil
from neural_radiance_caching_tpu.utils.jaxutil import stopgrad_with_weight

_DEFAULT_BRDF_BIAS = {
    "albedo": -1.0,
    "specular_albedo": -1.0,
    "roughness": 3.0,
    "F_0": 1.0,
    "metalness": 0.0,
    "diffuseness": 0.0,
    "mirrorness": 0.0,
    "specular_multiplier": 0.0,
    "diffuse_multiplier": 0.0,
}
_DEFAULT_BRDF_ACTIVATION = {
    "albedo": jax.nn.sigmoid,
    "specular_albedo": jax.nn.sigmoid,
    "roughness": jax.nn.softplus,
    "F_0": jax.nn.sigmoid,
    "metalness": jax.nn.sigmoid,
    "diffuseness": jax.nn.sigmoid,
    "mirrorness": jax.nn.sigmoid,
}
_DEFAULT_BRDF_STOPGRAD = {
    "albedo": 1.0,
    "specular_albedo": 1.0,
    "roughness": 1.0,
    "F_0": 1.0,
    "metalness": 1.0,
    "diffuseness": 1.0,
    "mirrorness": 1.0,
}


@gin.configurable
class BaseMaterialMLP(shading.BaseShader):
    config: Any = None

    num_secondary_samples_diff: int = 4
    num_secondary_samples: int = 32
    render_num_secondary_samples_diff: int = 4
    render_num_secondary_samples: int = 32

    random_generator_2d: Any = render_utils.RandomGenerator2D(1, 1, False)
    separate_integration_diffuse_specular: bool = True
    diffuse_sample_fraction: float = 0.5

    diffuse_importance_sampler_configs: Any = (("cosine", 1),)
    diffuse_render_importance_sampler_configs: Any = (("cosine", 1),)
    importance_sampler_configs: Any = (("microfacet", 1), ("cosine", 1))
    render_importance_sampler_configs: Any = (("microfacet", 1), ("cosine", 1))
    env_importance_samplers: Any = ((render_utils.EnvironmentSampler(), 1.0),)
    active_importance_samplers: Any = ((render_utils.ActiveSampler(), 1.0),)

    use_indirect: bool = True
    use_active: bool = False
    use_env_map: bool = False
    shadow_eps_indirect: bool = False

    material_type: str = "microfacet"
    use_mis: bool = True
    stratified_sampling: bool = False

    use_constant_material: bool = False
    use_constant_fresnel: bool = True
    use_constant_metalness: bool = False
    use_diffuseness: bool = False
    use_mirrorness: bool = False
    use_specular_albedo: bool = False
    reparam_roughness: bool = False

    min_roughness: float = 0.04
    default_F_0: float = 0.04
    max_F_0: float = 1.0

    brdf_bias: Any = None
    brdf_activation: Any = None
    brdf_stopgrad: Any = None

    rgb_emission_activation: Callable[..., Any] = nn.sigmoid
    rgb_bias_emission: float = -1.0
    rgb_residual_albedo_activation: Callable[..., Any] = nn.sigmoid
    rgb_bias_residual_albedo: float = -1.0

    use_brdf_correction: bool = True
    anisotropic_brdf_correction: bool = False
    per_point_brdf_correction: bool = False
    global_brdf_correction: bool = False

    use_diffuse_emission: bool = False
    use_residual_albedo: bool = False
    emission_window_frac: float = 0.0
    emission_variate_weight_start: float = 1.0
    emission_variate_weight_end: float = 1.0

    use_irradiance_cache: bool = False
    irradiance_cache_weight: float = 1.0
    irradiance_cache_stopgrad_weight: float = 1.0
    irradiance_cache_decay_rate: float = 1.0
    rgb_irradiance_activation: Any = math.safe_exp
    rgb_bias_irradiance: float = 0.0

    net_width_brdf: int = 64
    net_depth_brdf: int = 2
    deg_brdf: int = 2
    deg_brdf_anisotropic: int = 2

    stopgrad_cache_weight: Tuple[float, float] = (1.0, 1.0)
    stopgrad_slf_weight: Tuple[float, float] = (1.0, 1.0)
    stopgrad_env_map_weight: Tuple[float, float] = (1.0, 1.0)
    stopgrad_shading_weight: float = 1.0
    stopgrad_variate_weight: float = 1.0

    use_mesh_points: bool = True
    use_mesh_points_for_prediction: bool = True
    use_mesh_normals: bool = True
    use_corrected_normals: bool = False
    normals_target: str = "normals_to_use"

    stopgrad_samples: bool = False
    stopgrad_rays: bool = False
    stopgrad_rgb: bool = False
    stopgrad_material: bool = True
    stopgrad_light: bool = True

    near_rate: float = 0.1
    near_start_frac: float = 0.1
    near_max: float = 5e-1
    near_min: float = 1e-1

    use_surface_light_field: bool = False
    resample_cache: bool = True
    cache_train_sampling_strategy: Any = None
    cache_render_sampling_strategy: Any = None

    num_light_features: int = 64
    use_illumination_feature: bool = False
    multiple_illumination_outputs: bool = True

    optimize_light: bool = True
    light_power_bias: float = 200.0
    light_power_activation: Callable[..., Any] = math.abs
    light_max_angle: float = 0.0

    stopgrad_occ_weight: float = 0.0
    stopgrad_direct_weight: float = 1.0
    stopgrad_indirect_weight: float = 1.0
    rgb_max: float = float("inf")

    # --- setup --------------------------------------------------------------

    def setup(self):
        dense = self._make_dense_layer_factory()
        self.layers = [dense(self.net_width) for _ in range(self.net_depth)]
        self.bottleneck_layer = dense(self.bottleneck_width)

        if self.use_diffuse_emission:
            self.rgb_diffuse_emission_layer = dense(self.num_rgb_channels)
        if self.use_residual_albedo:
            self.rgb_residual_albedo_layer = dense(self.num_rgb_channels)

        brdf_output_sizes = {"microfacet": 10, "phong": 7, "lambertian": 3}
        if self.material_type not in brdf_output_sizes:
            raise ValueError(f"Unsupported material type: {self.material_type}")
        self.pred_brdf_layer = dense(brdf_output_sizes[self.material_type])

        self.brdf_enc_fn = lambda d: coord.pos_enc(d, 0, self.deg_brdf, True)
        self.brdf_enc_fn_anisotropic = lambda d: coord.pos_enc(
            d, 0, self.deg_brdf_anisotropic, True
        )
        self.brdf_correction_layers = [
            dense(self.net_width_brdf) for _ in range(self.net_depth_brdf)
        ]
        self.output_brdf_correction_layer = dense(2)

        if self.config.multi_illumination:
            self.light_vecs = nn.Embed(
                num_embeddings=self.config.num_illuminations,
                features=self.num_light_features,
                name="light_vecs",
            )
            self.num_illumination_outputs = (
                self.config.num_illuminations
                if self.config.multiple_illumination_outputs
                else 1
            )
        else:
            self.num_illumination_outputs = 1

        self.grid = self._make_grid(name="material_grid")
        self.pred_normals_layer = nn.Dense(3, kernel_init=jax.nn.initializers.zeros)

        make_samplers = lambda confs: [
            (render_utils.IMPORTANCE_SAMPLER_BY_NAME[c[0]](), c[1]) for c in confs
        ]
        self.importance_samplers = make_samplers(self.importance_sampler_configs)
        self.render_importance_samplers = make_samplers(self.render_importance_sampler_configs)
        self.diffuse_importance_samplers = make_samplers(
            self.diffuse_importance_sampler_configs
        )
        self.diffuse_render_importance_samplers = make_samplers(
            self.diffuse_render_importance_sampler_configs
        )

        if self.optimize_light:
            self.light_power = self.param(
                "light_power", lambda key, shape: jnp.full(shape, self.light_power_bias), (1,)
            )
        else:
            self.light_power = self.light_power_bias

        if self.config.learnable_light:
            self.learnable_light = light_sampler_lib.LightSourceMap(
                config=self.config, name="LightSource"
            )

        self._integration_strategy = self._build_integration_strategy()

    def _build_integration_strategy(self):
        """Output-key -> (sub-keys, reduce-dims, scale) (material.py:2705-2909)."""
        raise NotImplementedError

    # --- sampler / material tables --------------------------------------------

    def get_cache_sampling_strategy(self, train):
        return self.cache_train_sampling_strategy if train else (
            self.cache_render_sampling_strategy
        )

    def get_diffuse_importance_samplers(self, train):
        if not self.separate_integration_diffuse_specular:
            return self.get_specular_importance_samplers(train)
        if self.config.compute_relight_metrics or (
            self.config.use_ground_truth_illumination and self.config.multi_illumination
        ):
            return self.env_importance_samplers
        return self.diffuse_importance_samplers if train else (
            self.diffuse_render_importance_samplers
        )

    def get_specular_importance_samplers(self, train):
        if self.config.compute_relight_metrics or (
            self.config.use_ground_truth_illumination and self.config.multi_illumination
        ):
            return self.env_importance_samplers
        return self.importance_samplers if train else self.render_importance_samplers

    def get_num_secondary_samples(self, train):
        return self.num_secondary_samples if train else self.render_num_secondary_samples

    def get_num_secondary_samples_diff(self, train):
        return (
            self.num_secondary_samples_diff
            if train
            else self.render_num_secondary_samples_diff
        )

    def _sampling_parameters(self, num_secondary_samples, light_mode, light_component,
                             train):
        """(num_samples, samplers, material_type) per lobe (material.py:846-952)."""
        frac = self.diffuse_sample_fraction if self.separate_integration_diffuse_specular else 1.0
        if light_mode == "direct" and self.use_active:
            samplers = self.active_importance_samplers
            n = num_secondary_samples
        elif light_component == "diffuse":
            samplers = self.get_diffuse_importance_samplers(train)
            n = int(np.round(num_secondary_samples * frac))
        else:
            samplers = self.get_specular_importance_samplers(train)
            n = int(np.round(num_secondary_samples * (1.0 - frac)))
        material_type = f"microfacet_{light_component}"
        return n, samplers, material_type

    # --- material decode -------------------------------------------------------

    def get_material(self, brdf_params):
        if self.material_type == "phong":
            return {
                "albedo": jax.nn.sigmoid(brdf_params[..., 0:3]),
                "specular_albedo": jax.nn.sigmoid(brdf_params[..., 3:6]),
                "specular_exponent": math.safe_exp(brdf_params[..., 6:7] - 0.5),
            }
        if self.material_type == "lambertian":
            return {"albedo": jax.nn.sigmoid(brdf_params[..., 0:3])}

        bias = dict(_DEFAULT_BRDF_BIAS, **(self.brdf_bias or {}))
        act = dict(_DEFAULT_BRDF_ACTIVATION, **(self.brdf_activation or {}))
        sg = dict(_DEFAULT_BRDF_STOPGRAD, **(self.brdf_stopgrad or {}))

        # 10-channel decode with reference slice positions (material.py:957-1023).
        specs = {
            "albedo": (slice(0, self.num_rgb_channels), False, None, None),
            "specular_albedo": (slice(5, 6), False, None, None),
            "roughness": (slice(6, 7), False, None, self._post_process_roughness),
            "F_0": (
                slice(9, 10),
                self.use_constant_fresnel,
                self.default_F_0,
                None,
            ),
            "metalness": (slice(8, 9), self.use_constant_metalness, 0.0, None),
            "diffuseness": (slice(3, 4), not self.use_diffuseness, 0.0, None),
            "mirrorness": (slice(4, 5), not self.use_mirrorness, 0.0, None),
        }
        material = {}
        for prop, (sl, constant, const_val, post) in specs.items():
            raw = brdf_params[..., sl]
            if constant:
                material[prop] = jnp.full_like(raw, const_val)
                continue
            value = act[prop](raw + bias[prop])
            value = stopgrad_with_weight(value, sg[prop])
            if prop == "F_0" and not self.use_constant_fresnel:
                value = value * self.max_F_0
            if post is not None:
                value = post(value)
            material[prop] = value
        return material

    def _post_process_roughness(self, roughness):
        if self.reparam_roughness:
            roughness = 1.0 / (roughness + 1.0)
        return roughness * (1.0 - self.min_roughness**2) + self.min_roughness**2

    # --- BRDF correction net ----------------------------------------------------

    def get_brdf_correction(self, x_input, ref_samples, num_secondary_samples):
        """Learned 2-channel (specular, diffuse) correction (material.py:1125-1223)."""
        if self.per_point_brdf_correction:
            out = self.output_brdf_correction_layer(x_input)
            return self._process_brdf_output(out, True, num_secondary_samples)

        brdf_input = jnp.concatenate(
            [
                jnp.broadcast_to(
                    ref_samples["local_viewdirs"][..., 2:3],
                    ref_samples["local_lightdirs"].shape[:-1] + (1,),
                ),
                ref_samples["local_lightdirs"][..., 2:3],
            ],
            axis=-1,
        )
        brdf_input = jnp.concatenate(
            [
                jnp.sort(brdf_input, axis=-1),
                math.dot(ref_samples["local_viewdirs"], ref_samples["local_lightdirs"]),
            ],
            axis=-1,
        )
        brdf_input = self.brdf_enc_fn(brdf_input)
        if self.anisotropic_brdf_correction:
            aniso = jnp.concatenate(
                [
                    ref_samples["global_viewdirs"] + ref_samples["global_lightdirs"],
                    jnp.abs(
                        ref_samples["global_viewdirs"] - ref_samples["global_lightdirs"]
                    ),
                ],
                axis=-1,
            )
            brdf_input = jnp.concatenate(
                [brdf_input, self.brdf_enc_fn_anisotropic(aniso)], axis=-1
            )
        if not self.global_brdf_correction:
            pos = jnp.repeat(
                x_input.reshape(-1, 1, x_input.shape[-1]), num_secondary_samples, axis=-2
            )
            brdf_input = jnp.concatenate([brdf_input, pos], axis=-1)

        x = brdf_input
        for layer in self.brdf_correction_layers[: self.net_depth_brdf]:
            x = self.net_activation(layer(x))
        return self._process_brdf_output(self.output_brdf_correction_layer(x))

    def _process_brdf_output(self, x, per_point=False, num_secondary_samples=None):
        bias = dict(_DEFAULT_BRDF_BIAS, **(self.brdf_bias or {}))
        specular = nn.sigmoid(x[..., 0:1] + bias["specular_multiplier"])
        diffuse = nn.sigmoid(x[..., 1:2] + bias["diffuse_multiplier"])
        out = jnp.concatenate([specular, diffuse], axis=-1)
        if per_point and num_secondary_samples is not None:
            out = jnp.repeat(
                out.reshape(-1, 1, out.shape[-1]), num_secondary_samples, axis=-2
            )
        return out

    # --- feature prediction -------------------------------------------------------

    def predict_bottleneck_feature(self, rng, rays, sampler_results, train=True):
        key, rng = jaxutil.random_split(rng)
        pa_kwargs = self.get_predict_appearance_kwargs(key, rays, sampler_results)
        feature = self.predict_appearance_feature(sampler_results, train=train, **pa_kwargs)
        if self.bottleneck_width > 0:
            key, rng = jaxutil.random_split(rng)
            feature = self.get_bottleneck_feature(key, feature)
        return feature

    def get_light_vec(self, rays, feature):
        light_vec = jnp.zeros_like(feature[..., 0:0])
        if self.config.multi_illumination:
            light_idx = rays.light_idx[..., 0]
            light_vec = self.light_vecs(light_idx)
            light_vec = light_vec[..., None, :] * jnp.ones_like(feature[..., 0:1])
        return light_vec

    def _predict_material_and_feature(self, rng, rays, sampler_results, train_frac=1.0,
                                      train=True, mesh=None, radiance_cache=None, **kwargs):
        if self.use_constant_material:
            sr = jaxutil.copy_tree(sampler_results)
            sr["points"] = jnp.zeros_like(sr["points"])
            sr["means"] = jnp.zeros_like(sr["means"])
            sampler_for_bottleneck = sr
        else:
            sampler_for_bottleneck = sampler_results

        key, rng = jaxutil.random_split(rng)
        feature = self.predict_bottleneck_feature(key, rays, sampler_for_bottleneck, train)
        brdf_params = self.pred_brdf_layer(feature)
        material = self.get_material(brdf_params)

        if kwargs.get("albedo_ratio") is not None:
            ar = kwargs["albedo_ratio"]
            sh = material["albedo"].shape
            material["albedo"] = jnp.clip(
                material["albedo"].reshape(-1, self.num_rgb_channels)
                * ar.reshape(-1, self.num_rgb_channels),
                0.0,
                1.0,
            ).reshape(sh)

        if self.use_constant_material:
            material["metalness"] = jnp.ones_like(material["metalness"])
            material["roughness"] = jnp.ones_like(material["roughness"]) * 0.01
        return feature, material

    # --- light sources / closures --------------------------------------------------

    def _compute_near(self, train_frac):
        if self.near_rate > 0:
            w = jnp.clip((train_frac - self.near_start_frac) / self.near_rate, 0.0, 1.0)
            return w * self.near_min + (1.0 - w) * self.near_max
        return self.near_min

    def _prepare_direct_light_sampler_results(self, sampler_results, rays):
        lights = (
            jax.lax.stop_gradient(
                self.learnable_light.get_lights(rays.lights, rays.vcam_look, rays.vcam_up)
            )
            if self.config.learnable_light
            else rays.lights
        )
        return {
            "origins": sampler_results["means"][..., None, :],
            "lights": lights[..., None, None, :]
            * jnp.ones_like(sampler_results["means"][..., None, :]),
        }

    def _make_radiance_cache_fn(self, rays, sampler_results, radiance_cache, mesh,
                                train_frac, train, **kwargs):
        """Closure that runs secondary rays through the full cache model
        (material.py:2174-2231)."""

        def radiance_cache_fn(rng, ref_rays, ref_samples, ref_sampler_results):
            normals = sampler_results[self.config.shadow_normals_target].reshape(
                ref_rays.origins.shape[:-2] + (-1, 3)
            ) * jnp.ones_like(ref_rays.origins)
            ref_rays = ref_rays.replace(
                normals=normals if self.shadow_eps_indirect else None
            )
            # Flatten the (points, secondary) axes for the cache forward:
            # rank-1 ray batches give XLA plain 2D matmuls and uniform
            # layouts — the rank-3 form forces batched dots plus a chain of
            # layout copies/slices (measured ~40% of the material step).
            lead = ref_rays.origins.shape[:-1]
            n_flat = int(np.prod(lead))
            flat_rays = jax.tree_util.tree_map(
                lambda x: (
                    x.reshape((n_flat,) + x.shape[len(lead):])
                    if x.shape[: len(lead)] == lead
                    # Fields the fan-out didn't broadcast (pixel ints,
                    # impulse response) pass through untouched.
                    else x
                ),
                ref_rays,
            )
            key, _ = jaxutil.random_split(rng)
            out = radiance_cache.cache(
                key,
                flat_rays,
                train_frac=train_frac,
                train=train,
                compute_extras=False,
                mesh=mesh,
                stopgrad_proposal=False,
                stopgrad_weights=False,
                is_secondary=True,
                linear_rgb=True,
                resample=self.resample_cache,
                sampling_strategy=self.get_cache_sampling_strategy(train),
                use_env_map=False,
                env_map=kwargs.get("env_map"),
                env_map_w=kwargs.get("env_map_w"),
                env_map_h=kwargs.get("env_map_h"),
                light_power=(
                    self.light_power_activation(self.light_power)
                    if radiance_cache.share_light_power
                    else None
                ),
                radiance_cache=radiance_cache,
                stopgrad_cache_weight=self.stopgrad_cache_weight,
            )
            # Restore the (points, secondary) axes on every array the
            # downstream shading consumes.
            out = jax.tree_util.tree_map(
                lambda x: (
                    x.reshape(lead + x.shape[1:])
                    if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_flat
                    else x
                ),
                out,
            )
            rgb = jnp.maximum(jnp.nan_to_num(out["render"]["rgb"]), 0.0)
            rgb_ns = jnp.maximum(jnp.nan_to_num(out["render"]["rgb_no_stopgrad"]), 0.0)
            srs = out["main"]["sampler"]
            srs[-1]["acc"] = jnp.nan_to_num(out["render"]["acc"]).reshape(
                ref_rays.origins.shape[:-1]
            )
            srs[-1]["acc_no_stopgrad"] = jnp.nan_to_num(
                out["render"]["acc_no_stopgrad"]
            ).reshape(ref_rays.origins.shape[:-1])
            return rgb, rgb_ns, srs

        return radiance_cache_fn

    def _make_surface_lf_fn(self, rays, sampler_results, radiance_cache, mesh, train_frac,
                            train, **kwargs):
        def surface_lf_fn(rng, ref_rays, ref_samples, ref_sampler_results):
            normals = sampler_results[self.config.shadow_normals_target].reshape(
                ref_rays.origins.shape[:-2] + (-1, 3)
            ) * jnp.ones_like(ref_rays.origins)
            ref_rays = ref_rays.replace(
                normals=normals if self.shadow_eps_indirect else None
            )
            key, _ = jaxutil.random_split(rng)
            slf = radiance_cache.cache(
                key,
                ref_rays,
                use_slf=True,
                use_env_map=False,
                train=train,
                train_frac=train_frac,
                env_map=kwargs.get("env_map"),
                env_map_w=kwargs.get("env_map_w"),
                env_map_h=kwargs.get("env_map_h"),
                stopgrad_cache_weight=self.stopgrad_slf_weight,
            )
            rgb = slf["rgb"].reshape(ref_rays.origins.shape)
            rgb_ns = slf["rgb_no_stopgrad"].reshape(ref_rays.origins.shape)
            if self.config.material_loss_radius < float("inf"):
                mask = (
                    jnp.linalg.norm(ref_rays.origins, axis=-1, keepdims=True)
                    < self.config.material_loss_radius
                ).astype(jnp.float32)
                rgb = stopgrad_with_weight(rgb, mask)
                rgb_ns = stopgrad_with_weight(rgb_ns, mask)
            rgb = jnp.maximum(rgb, 0.0)
            rgb_ns = jnp.maximum(rgb_ns, 0.0)
            slf["acc"] = slf["acc"].reshape(ref_rays.origins.shape[:-1])
            slf["acc_no_stopgrad"] = slf["acc_no_stopgrad"].reshape(
                ref_rays.origins.shape[:-1]
            )
            return rgb, rgb_ns, [slf]

        return surface_lf_fn

    def _make_env_map_fn(self, rays, sampler_results, radiance_cache, mesh, train_frac,
                         train, **kwargs):
        def env_map_fn(rng, ref_rays, ref_samples, ref_sampler_results):
            key, _ = jaxutil.random_split(rng)
            env = radiance_cache.cache(
                key,
                ref_rays,
                env_map_only=True,
                use_env_map=True,
                train=train,
                train_frac=train_frac,
                env_map=kwargs.get("env_map"),
                env_map_w=kwargs.get("env_map_w"),
                env_map_h=kwargs.get("env_map_h"),
                stopgrad_cache_weight=self.stopgrad_env_map_weight,
            )
            rgb = env["incoming_rgb"].reshape(ref_rays.origins.shape)
            rgb_ns = env.get("incoming_rgb_no_stopgrad", rgb).reshape(
                ref_rays.origins.shape
            )
            rgb = jnp.maximum(rgb, 0.0) * (
                1.0
                - ref_sampler_results[-1]["acc"].reshape(ref_rays.origins.shape[:-1] + (1,))
            )
            rgb_ns = jnp.maximum(rgb_ns, 0.0) * (
                1.0
                - ref_sampler_results[-1]["acc_no_stopgrad"].reshape(
                    ref_rays.origins.shape[:-1] + (1,)
                )
            )
            return rgb, rgb_ns, ref_sampler_results

        return env_map_fn

    def _make_active_light_fn(self, rays, sampler_results, mesh, train_frac, train,
                              **kwargs):
        """Direct lighting: evaluate the (learnable) light along one shadow ray
        per lobe, occluded by the cache's stored occlusion (material.py:2316-2431)."""

        def active_fn(rng, ref_rays, ref_samples, ref_sampler_results):
            del rng
            normals = sampler_results[self.config.shadow_normals_target].reshape(
                ref_rays.origins.shape[:-2] + (-1, 3)
            ) * jnp.ones_like(ref_rays.origins)
            ref_rays = ref_rays.replace(normals=jax.lax.stop_gradient(normals))

            if self.config.learnable_light:
                lights = jax.lax.stop_gradient(
                    self.learnable_light.get_lights(
                        ref_rays.lights, ref_rays.vcam_look, ref_rays.vcam_up
                    )
                )
            else:
                lights = ref_rays.lights

            light_offset = lights - ref_rays.origins
            light_dists = jnp.linalg.norm(light_offset, axis=-1, keepdims=True)
            light_dirs = light_offset / jnp.maximum(light_dists, 1e-5)
            ref_rays = ref_rays.replace(
                far=jnp.clip(
                    light_dists.reshape(ref_rays.far.shape) - self.config.light_near,
                    ref_rays.near,
                    ref_rays.far,
                )
            )

            if self.config.learnable_light:
                light_radiance, _ = self.learnable_light(
                    ref_rays.origins,
                    ref_rays.viewdirs,
                    ref_rays.lights,
                    ref_rays.vcam_look,
                    ref_rays.vcam_up,
                    ref_rays.vcam_origins,
                    env_map=kwargs.get("env_map"),
                    env_map_w=kwargs.get("env_map_w"),
                    env_map_h=kwargs.get("env_map_h"),
                )
            else:
                light_radiance = jnp.ones_like(light_dists) * self.light_power_activation(
                    self.light_power
                )
                if self.config.use_falloff:
                    light_radiance = light_radiance / jnp.maximum(light_dists**2, 1e-5)
                if self.light_max_angle > 0.0:
                    angle_dot = math.dot(
                        -light_dirs, rays.vcam_look[..., None, :], keepdims=True
                    )
                    angle = jnp.arccos(angle_dot)
                    mask = (
                        (angle * 180.0 / jnp.pi) <= (self.light_max_angle / 2.0)
                    ) & (angle_dot > 0)
                    light_radiance = jnp.where(mask, light_radiance, 0.0)

            if self.config.light_zero:
                light_radiance = jnp.where(
                    light_dists < self.config.light_near, 0.0, light_radiance
                )

            occ = sampler_results["occ"][..., :1].reshape(ref_rays.origins[..., :1].shape)
            srs = [
                {
                    "occ": jnp.repeat(occ, self.num_rgb_channels, axis=-1),
                    "acc": jnp.repeat(occ, self.num_rgb_channels, axis=-1),
                }
            ]
            light_radiance = light_radiance * (1.0 - occ)

            if self.config.sl_relight:
                sl_mult = render_utils.get_sl_color(
                    kwargs["env_map"],
                    kwargs["env_map_w"],
                    kwargs["env_map_h"],
                    ref_rays.vcam_up,
                    ref_rays.vcam_look,
                    ref_rays.origins,
                    ref_rays.vcam_origins,
                    hfov=self.config.sl_hfov,
                    vfov=self.config.sl_vfov,
                    shift=self.config.sl_shift,
                    mult=self.config.sl_mult,
                    invert=self.config.sl_invert,
                )
                light_radiance = light_radiance * sl_mult

            rgb = jnp.repeat(light_radiance, self.num_rgb_channels, axis=-1)
            if self.config.material_loss_radius < float("inf"):
                mask = (
                    jnp.linalg.norm(ref_rays.origins, axis=-1, keepdims=True)
                    < self.config.material_loss_radius
                ).astype(jnp.float32)
                rgb = stopgrad_with_weight(rgb, mask)
            rgb = jnp.maximum(rgb, 0.0)
            return rgb, rgb, srs

        return active_fn

    # --- MC integration engine ------------------------------------------------------

    def _sample_lobe_rays(self, rng, rays, sampler_results, material_sec, light_sec,
                          samplers, num_secondary_samples, train_frac, mesh):
        """Fan one lobe out into secondary rays + importance-sample records."""
        near = self._compute_near(train_frac)
        key, rng = jaxutil.random_split(rng)
        ref_rays, ref_samples = render_utils.get_secondary_rays(
            key,
            rays,
            sampler_results["points"],
            rays.viewdirs,
            sampler_results[self.normals_target],
            material_sec,
            refdir_eps=near,
            normal_eps=self.config.secondary_normal_eps,
            random_generator_2d=self.random_generator_2d,
            stratified_sampling=self.stratified_sampling,
            use_mis=self.use_mis,
            samplers=samplers,
            num_secondary_samples=num_secondary_samples,
            light_sampler_results=light_sec,
            offset_origins=mesh is not None,
            far=self.config.secondary_far,
        )
        if self.config.material_loss_radius < float("inf"):
            mask = (
                jnp.linalg.norm(ref_rays.origins, axis=-1, keepdims=True)
                < self.config.material_loss_radius
            ).astype(jnp.float32)
            shading_w = mask * self.stopgrad_shading_weight
        else:
            shading_w = self.stopgrad_shading_weight
        for d in ("local_viewdirs", "local_lightdirs", "global_viewdirs",
                  "global_lightdirs"):
            ref_samples[d] = stopgrad_with_weight(ref_samples[d], shading_w)
        ref_samples["weight"] = jnp.where(
            ref_samples["local_lightdirs"][..., 2:] > 0.0, ref_samples["weight"], 0.0
        )
        if self.stopgrad_samples:
            ref_samples = jax.lax.stop_gradient(ref_samples)
        if self.stopgrad_rays:
            ref_rays = jax.tree_util.tree_map(jax.lax.stop_gradient, ref_rays)
        return ref_rays, ref_samples

    def _attach_lobe_radiance(self, rgb, rgb_ns, ref_samples, ref_sampler_results,
                              feature, num_secondary_samples, direct):
        """Post-query bookkeeping shared by the fused and per-lobe paths:
        reshape the queried radiance, align occlusion rows, and attach the
        BRDF correction (material.py:2174-2231 tail)."""
        rgb = jnp.nan_to_num(rgb)
        rgb_ns = jnp.nan_to_num(rgb_ns)
        if self.stopgrad_rgb:
            rgb = jax.lax.stop_gradient(rgb)

        if direct or not self.config.use_transient:
            shape = (-1, num_secondary_samples, self.num_rgb_channels)
        else:
            shape = (rgb.reshape(-1).shape[0] // (
                num_secondary_samples * self.config.n_bins * self.num_rgb_channels
            ), num_secondary_samples, self.config.n_bins, self.num_rgb_channels)
        rgb = rgb.reshape(shape)
        rgb_ns = rgb_ns.reshape(shape)

        ref_samples = jax.tree_util.tree_map(
            lambda x: x.reshape(rgb.shape[0], -1, x.shape[-1]), ref_samples
        )
        brdf_correction = (
            self.get_brdf_correction(feature, ref_samples, num_secondary_samples)
            if self.use_brdf_correction
            else jnp.ones_like(ref_samples["local_lightdirs"][..., :2])
        )
        # acc is per-shadow-ray; the active closure repeats it to
        # num_rgb_channels, so realign rows to rgb's (points, samples)
        # layout and keep one channel.
        occ_acc = ref_sampler_results[-1]["acc"].reshape(
            rgb.shape[0], rgb.shape[1], -1
        )[..., :1]
        ref_samples.update(
            {
                "radiance_in": rgb,
                "indirect_occ": occ_acc,
                "radiance_in_no_stopgrad": rgb_ns,
                "brdf_correction": brdf_correction,
            }
        )
        return ref_samples

    def get_outgoing_radiance_helper(
        self, rng, rays, feature, sampler_results, material, material_type, samplers,
        num_secondary_samples, radiance_cache_fn, train_frac=1.0, train=True, mesh=None,
        light_sampler_results=None, ref_rays=None, ref_samples=None,
        ref_sampler_results=None, direct=False, **kwargs,
    ):
        """One lobe: sample secondary rays (or reuse), query the radiance
        source, MC-integrate (material.py:1684-1864)."""
        sh = sampler_results["points"].shape
        material_sec = (
            jax.lax.stop_gradient(material) if self.stopgrad_material else material
        )
        light_sec = (
            jax.lax.stop_gradient(light_sampler_results)
            if self.stopgrad_light
            else light_sampler_results
        )

        if ref_samples is None:
            key, rng = jaxutil.random_split(rng)
            ref_rays, ref_samples = self._sample_lobe_rays(
                key, rays, sampler_results, material_sec, light_sec,
                samplers, num_secondary_samples, train_frac, mesh,
            )
        else:
            ref_samples = jaxutil.copy_tree(ref_samples)
            ref_rays = jaxutil.copy_tree(ref_rays)

        if ref_sampler_results is None or self.use_env_map:
            key, rng = jaxutil.random_split(rng)
            rgb, rgb_ns, ref_sampler_results = radiance_cache_fn(
                key, ref_rays, ref_samples, ref_sampler_results
            )
            ref_samples = self._attach_lobe_radiance(
                rgb, rgb_ns, ref_samples, ref_sampler_results,
                feature, num_secondary_samples, direct,
            )
        else:
            ref_sampler_results = jaxutil.copy_tree(ref_sampler_results)

        integrated = self._integrate_lobe(
            material_type, material, ref_samples, ref_sampler_results, direct, sh
        )
        return integrated, ref_rays, ref_samples, ref_sampler_results

    def _integrate_lobe(self, material_type, material, ref_samples,
                        ref_sampler_results, direct, sh):
        """MC-integrate one lobe's queried samples and restore point dims."""
        if self.config.use_transient:
            integrated = render_utils.transient_integrate_reflect_rays(
                material_type,
                self.use_brdf_correction,
                material,
                ref_samples,
                use_diffuseness=self.use_diffuseness,
                use_mirrorness=self.use_mirrorness,
                use_specular_albedo=self.use_specular_albedo,
                direct=direct,
                max_radiance=self.rgb_max,
            )
        else:
            integrated = render_utils.integrate_reflect_rays(
                material_type,
                self.use_brdf_correction,
                material,
                ref_samples,
                use_diffuseness=self.use_diffuseness,
                use_mirrorness=self.use_mirrorness,
                use_specular_albedo=self.use_specular_albedo,
                max_radiance=self.rgb_max,
            )

        if direct and self.use_active:
            integrated["occ"] = ref_sampler_results[-1]["occ"]

        integrated = {k: v for k, v in integrated.items() if v is not None}
        if direct or not self.config.use_transient:
            integrated = jax.tree_util.tree_map(
                lambda x: x.reshape(tuple(sh[:-1]) + (x.shape[-1],)), integrated
            )
        else:
            integrated = jax.tree_util.tree_map(
                lambda x: x.reshape(tuple(sh[:-1]) + (-1, x.shape[-1])), integrated
            )
        return integrated

    def _process_lobe(self, light_mode, light_component, rng, rays, feature,
                      sampler_results, material, num_secondary_samples,
                      radiance_cache_fn, train_frac, train, mesh, light_sampler_results,
                      integrated_outputs, stopgrad_weight, ref_rays=None, ref_samples=None,
                      ref_sampler_results=None, **kwargs):
        num_samples, samplers, material_type = self._sampling_parameters(
            num_secondary_samples, light_mode, light_component, train
        )
        if num_samples == 0:
            return
        key, rng = jaxutil.random_split(rng)
        results, ref_rays, ref_samples, ref_sampler_results = (
            self.get_outgoing_radiance_helper(
                key,
                rays,
                feature,
                sampler_results,
                material,
                material_type,
                samplers,
                num_samples,
                radiance_cache_fn,
                train_frac=train_frac,
                train=train,
                mesh=mesh,
                light_sampler_results=light_sampler_results,
                direct=(light_mode == "direct"),
                ref_rays=ref_rays,
                ref_samples=ref_samples,
                ref_sampler_results=ref_sampler_results,
                **kwargs,
            )
        )
        integrated_outputs[f"ref_rays_{light_mode}_{light_component}"] = ref_rays
        integrated_outputs[f"ref_samples_{light_mode}_{light_component}"] = ref_samples
        integrated_outputs[f"ref_sampler_results_{light_mode}_{light_component}"] = (
            ref_sampler_results
        )
        for k, val in results.items():
            # Degenerate MC draws (grazing GGX half-vectors, zero-measure
            # secondary rays) can yield isolated non-finite samples; drop them
            # instead of poisoning the whole batch loss (the reference guards
            # its estimator outputs the same way, material.py:1785, 2223).
            integrated_outputs[f"{light_mode}_{light_component}_{k}"] = (
                stopgrad_with_weight(jnp.nan_to_num(val), stopgrad_weight)
            )

    def _process_indirect_lobes_fused(self, rng, rays, feature, sampler_results,
                                      material, num_secondary_samples,
                                      radiance_cache_fn, train_frac, train, mesh,
                                      light_sampler_results, integrated_outputs,
                                      stopgrad_weight):
        """Both indirect lobes through ONE radiance query.

        TPU-first fusion of the per-lobe loop (material.py:1352-1565): the
        specular and diffuse lobes keep their own importance samplers and MIS
        pdfs, but the radiance source is lobe-agnostic, so their secondary
        ray sets are concatenated along the secondary axis and traced in a
        single cache forward — one encoder gather + one MLP batch at 2x rows
        instead of two full cache subgraphs. Results split back per lobe and
        integrate exactly as the sequential path would. Returns False (no-op)
        when the split lobes aren't both active, so the caller can fall back.
        """
        lobes = []
        for comp in ("specular", "diffuse"):
            n, samplers, material_type = self._sampling_parameters(
                num_secondary_samples, "indirect", comp, train
            )
            lobes.append((comp, n, samplers, material_type))
        ns = [n for _, n, _, _ in lobes]
        if min(ns) == 0:
            return False

        sh = sampler_results["points"].shape
        material_sec = (
            jax.lax.stop_gradient(material) if self.stopgrad_material else material
        )
        light_sec = (
            jax.lax.stop_gradient(light_sampler_results)
            if self.stopgrad_light
            else light_sampler_results
        )

        sampled = []
        for comp, n, samplers, _ in lobes:
            key, rng = jaxutil.random_split(rng)
            sampled.append(self._sample_lobe_rays(
                key, rays, sampler_results, material_sec, light_sec,
                samplers, n, train_frac, mesh,
            ))
        n_total = sum(ns)

        def cat(x, y):
            if (
                hasattr(x, "ndim") and hasattr(y, "ndim") and x.ndim == y.ndim
                and x.ndim >= 2 and x.shape[0] == y.shape[0]
                and x.shape[1] == ns[0] and y.shape[1] == ns[1]
                and x.shape[2:] == y.shape[2:]
            ):
                return jnp.concatenate([x, y], axis=1)
            return x

        fused_rays = jax.tree_util.tree_map(cat, sampled[0][0], sampled[1][0])
        key, rng = jaxutil.random_split(rng)
        rgb, rgb_ns, srs = radiance_cache_fn(key, fused_rays, None, None)

        if not self.config.use_transient:
            shape = (-1, n_total, self.num_rgb_channels)
        else:
            shape = (rgb.reshape(-1).shape[0] // (
                n_total * self.config.n_bins * self.num_rgb_channels
            ), n_total, self.config.n_bins, self.num_rgb_channels)
        rgb = rgb.reshape(shape)
        rgb_ns = rgb_ns.reshape(shape)
        n_points = rgb.shape[0]

        def lobe_slice(x, lo, hi):
            if not hasattr(x, "ndim"):
                return x
            if x.ndim >= 2 and x.shape[0] == n_points and x.shape[1] == n_total:
                return x[:, lo:hi]
            if x.ndim >= 1 and x.shape[0] == n_points * n_total:
                y = x.reshape((n_points, n_total) + x.shape[1:])
                return y[:, lo:hi].reshape((-1,) + x.shape[1:])
            return x

        offset = 0
        for (comp, n, _, material_type), (rr, rs) in zip(lobes, sampled):
            lo, hi = offset, offset + n
            offset = hi
            srs_l = jax.tree_util.tree_map(
                lambda x: lobe_slice(x, lo, hi), srs
            )
            ref_samples_l = self._attach_lobe_radiance(
                rgb[:, lo:hi], rgb_ns[:, lo:hi], rs, srs_l, feature, n,
                direct=False,
            )
            integrated = self._integrate_lobe(
                material_type, material, ref_samples_l, srs_l, False, sh
            )
            integrated_outputs[f"ref_rays_indirect_{comp}"] = rr
            integrated_outputs[f"ref_samples_indirect_{comp}"] = ref_samples_l
            integrated_outputs[f"ref_sampler_results_indirect_{comp}"] = srs_l
            for k, val in integrated.items():
                integrated_outputs[f"indirect_{comp}_{k}"] = (
                    stopgrad_with_weight(jnp.nan_to_num(val), stopgrad_weight)
                )
        return True

    def get_outgoing_radiance(self, rng, rays, feature, sampler_results, material,
                              num_secondary_samples, radiance_cache_fn, env_map_fn,
                              active_fn=None, train_frac=1.0, train=True, mesh=None,
                              light_sampler_results=None, last_integrated_outputs=None,
                              **kwargs):
        """All lobes of the outgoing-radiance estimate (material.py:1352-1565)."""
        out = {k: 0.0 for k in self._integration_strategy}
        last = last_integrated_outputs or {}

        def reuse(mode, comp):
            if last_integrated_outputs is not None:
                return (
                    last.get(f"ref_rays_{mode}_{comp}"),
                    last.get(f"ref_samples_{mode}_{comp}"),
                    None,
                )
            return None, None, None

        if self.use_indirect:
            fused = False
            if (
                last_integrated_outputs is None
                and self.separate_integration_diffuse_specular
                and not self.use_env_map
            ):
                # Fresh split lobes share one radiance query (TPU-first
                # fusion; falls back if either lobe has zero samples).
                key, rng = jaxutil.random_split(rng)
                fused = self._process_indirect_lobes_fused(
                    key, rays, feature, sampler_results, material,
                    num_secondary_samples, radiance_cache_fn, train_frac,
                    train, mesh, light_sampler_results, out,
                    self.stopgrad_indirect_weight,
                )
            if not fused:
                rr, rs, rsr = reuse("indirect", "specular")
                key, rng = jaxutil.random_split(rng)
                self._process_lobe(
                    "indirect", "specular", key, rays, feature, sampler_results, material,
                    num_secondary_samples, radiance_cache_fn, train_frac, train, mesh,
                    light_sampler_results, out, self.stopgrad_indirect_weight,
                    ref_rays=rr, ref_samples=rs, ref_sampler_results=rsr, **kwargs,
                )

                rr, rs, rsr = reuse("indirect", "diffuse")
                if last_integrated_outputs is None and not self.separate_integration_diffuse_specular:
                    rr = out.get("ref_rays_indirect_specular")
                    rs = out.get("ref_samples_indirect_specular")
                    rsr = out.get("ref_sampler_results_indirect_specular")
                key, rng = jaxutil.random_split(rng)
                self._process_lobe(
                    "indirect", "diffuse", key, rays, feature, sampler_results, material,
                    num_secondary_samples, radiance_cache_fn, train_frac, train, mesh,
                    light_sampler_results, out, self.stopgrad_indirect_weight,
                    ref_rays=rr, ref_samples=rs, ref_sampler_results=rsr, **kwargs,
                )

        if self.use_active:
            direct_lsr = self._prepare_direct_light_sampler_results(sampler_results, rays)
            rr, rs, rsr = reuse("direct", "specular")
            key, rng = jaxutil.random_split(rng)
            self._process_lobe(
                "direct", "specular", key, rays, feature, sampler_results, material,
                1, active_fn, train_frac, train, mesh, direct_lsr, out,
                self.stopgrad_direct_weight, ref_rays=rr, ref_samples=rs,
                ref_sampler_results=rsr, **kwargs,
            )
            rr, rs, rsr = reuse("direct", "diffuse")
            if last_integrated_outputs is None:
                rr = out.get("ref_rays_direct_specular")
                rs = out.get("ref_samples_direct_specular")
                rsr = out.get("ref_sampler_results_direct_specular")
            key, rng = jaxutil.random_split(rng)
            self._process_lobe(
                "direct", "diffuse", key, rays, feature, sampler_results, material,
                1, active_fn, train_frac, train, mesh, direct_lsr, out,
                self.stopgrad_direct_weight, ref_rays=rr, ref_samples=rs,
                ref_sampler_results=rsr, **kwargs,
            )
        elif self.use_env_map:
            for comp in ("specular", "diffuse"):
                rr = out.get(f"ref_rays_indirect_{comp}")
                rs = out.get(f"ref_samples_indirect_{comp}")
                rsr = out.get(f"ref_sampler_results_indirect_{comp}")
                key, rng = jaxutil.random_split(rng)
                self._process_lobe(
                    "direct", comp, key, rays, feature, sampler_results, material,
                    num_secondary_samples, env_map_fn, train_frac, train, mesh,
                    light_sampler_results, out, self.stopgrad_direct_weight,
                    ref_rays=rr, ref_samples=rs, ref_sampler_results=rsr, **kwargs,
                )

        # Combine lobes per the integration strategy table.
        for output_key, cfg in self._integration_strategy.items():
            if "indirect" in output_key and not self.use_indirect:
                continue
            total = 0.0
            for sub_key, reduce_dims in cfg["sum_over"]:
                if "indirect" in sub_key and not self.use_indirect:
                    continue
                val = out.get(sub_key, 0.0)
                if isinstance(val, jnp.ndarray) and reduce_dims:
                    val = val.sum(axis=reduce_dims)
                total = total + val
            out[output_key] = total * cfg["scale"]
        return out

    # --- variates ---------------------------------------------------------------

    def _integrate_slf_variate(self, rng, rays, feature, sampler_results, material,
                               radiance_cache_fn, surface_lf_fn, env_map_fn, active_fn,
                               train_frac, train, **kwargs):
        """SLF control variate: cache estimate − SLF estimate with shared rays
        (material.py:2433-2513)."""
        key, rng = jaxutil.random_split(rng)
        cache_out = self.get_outgoing_radiance(
            rng=key, rays=rays, feature=feature, sampler_results=sampler_results,
            material=material,
            num_secondary_samples=self.get_num_secondary_samples_diff(train),
            radiance_cache_fn=radiance_cache_fn, env_map_fn=env_map_fn,
            active_fn=active_fn, train_frac=train_frac, train=train, **kwargs,
        )
        key, rng = jaxutil.random_split(rng)
        slf_out = self.get_outgoing_radiance(
            rng=key, rays=rays, feature=feature, sampler_results=sampler_results,
            material=material,
            num_secondary_samples=self.get_num_secondary_samples_diff(train),
            radiance_cache_fn=surface_lf_fn, env_map_fn=env_map_fn,
            active_fn=active_fn, train_frac=train_frac, train=train,
            last_integrated_outputs=cache_out, **kwargs,
        )

        final = dict(cache_out)
        for k in ("radiance_out", "diffuse_radiance_out", "specular_radiance_out",
                  "direct_radiance_out", "indirect_radiance_out", "irradiance"):
            if k in cache_out and k in slf_out:
                final[k] = cache_out[k] - slf_out[k]
        for f in list(final.keys()):
            final[f + "_cache"] = cache_out.get(f)
            final[f + "_slf"] = slf_out.get(f)
        return final

    # --- top level ---------------------------------------------------------------

    def predict_appearance(self, rng, rays, sampler_results, train_frac=1.0, train=True,
                           mesh=None, radiance_cache=None, material_only=False,
                           slf_variate=False, **kwargs):
        key, rng = jaxutil.random_split(rng)
        feature, material = self._predict_material_and_feature(
            key, rays, sampler_results, train_frac, train, mesh, radiance_cache, **kwargs
        )
        if material_only:
            return {"material_" + k: v for k, v in material.items()}

        outputs = {}
        emission = jnp.zeros_like(material["albedo"])
        residual_albedo = jnp.zeros_like(material["albedo"])
        if self.use_diffuse_emission:
            raw = (
                self.rgb_premultiplier * self.rgb_diffuse_emission_layer(feature)
                + self.rgb_bias_emission
            )
            emission = self.rgb_emission_activation(raw)
            w = (
                jnp.clip(train_frac / self.emission_window_frac, 0.0, 1.0)
                if self.emission_window_frac > 0.0
                else 1.0
            )
            ew = (1.0 - w) * self.emission_variate_weight_start + (
                w * self.emission_variate_weight_end
            )
            emission = emission * ew + jax.lax.stop_gradient(emission) * (1.0 - ew)
        if self.use_residual_albedo:
            raw = (
                self.rgb_premultiplier * self.rgb_residual_albedo_layer(feature)
                + self.rgb_bias_residual_albedo
            )
            residual_albedo = self.rgb_residual_albedo_activation(raw)
            outputs["material_albedo"] = residual_albedo
        outputs["material_residual_albedo"] = residual_albedo

        radiance_cache_fn = self._make_radiance_cache_fn(
            rays, sampler_results, radiance_cache, mesh, train_frac, train, **kwargs
        )
        surface_lf_fn = self._make_surface_lf_fn(
            rays, sampler_results, radiance_cache, mesh, train_frac, train, **kwargs
        )
        env_map_fn = self._make_env_map_fn(
            rays, sampler_results, radiance_cache, mesh, train_frac, train, **kwargs
        )
        active_fn = self._make_active_light_fn(
            rays, sampler_results, mesh, train_frac, train, **kwargs
        )

        if slf_variate and self.use_surface_light_field:
            key, rng = jaxutil.random_split(rng)
            integrated = self._integrate_slf_variate(
                key, rays, feature, sampler_results, material, radiance_cache_fn,
                surface_lf_fn, env_map_fn, active_fn, train_frac, train, **kwargs,
            )
        else:
            key, rng = jaxutil.random_split(rng)
            integrated = self.get_outgoing_radiance(
                rng=key, rays=rays, feature=feature, sampler_results=sampler_results,
                material=material,
                num_secondary_samples=self.get_num_secondary_samples(train),
                radiance_cache_fn=(
                    surface_lf_fn
                    if (self.use_surface_light_field and not slf_variate)
                    else radiance_cache_fn
                ),
                env_map_fn=env_map_fn, active_fn=active_fn, train_frac=train_frac,
                train=train, mesh=mesh, **kwargs,
            )

        rgb = (
            integrated["direct_radiance_out"]
            if self.config.use_transient
            else integrated["radiance_out"]
        )
        if self.use_diffuse_emission:
            rgb = rgb + emission
        elif self.use_residual_albedo:
            rgb = rgb + integrated["irradiance"] * residual_albedo

        self._finalize_outputs(
            rays, outputs, integrated, rgb, material, emission, residual_albedo,
            sampler_results,
        )
        return outputs

    def _finalize_outputs(self, rays, outputs, integrated, final_rgb, material, emission,
                          residual_albedo, sampler_results):
        for k in material:
            outputs["material_" + k] = material[k]
        outputs["lighting_emission"] = emission
        outputs["lighting_irradiance"] = integrated["irradiance"].reshape(
            material["albedo"].shape
        )
        # SLF-variate pass: the pure cache-side irradiance estimate, consumed
        # by material_correlation_loss / material_smoothness_loss.
        if integrated.get("irradiance_cache") is not None:
            outputs["irradiance_cache"] = integrated["irradiance_cache"].reshape(
                material["albedo"].shape
            )
        if "occ" not in sampler_results:
            outputs["occ"] = (
                integrated.get("occ") if self.use_active else jnp.zeros_like(final_rgb)
            )
        outputs["rgb"] = final_rgb

        outputs["direct_diffuse_rgb"] = (
            integrated.get("direct_diffuse_radiance_out") + emission
            if integrated.get("direct_diffuse_radiance_out") is not None
            else None
        )
        outputs["direct_specular_rgb"] = integrated.get("direct_specular_radiance_out")
        outputs["direct_rgb"] = integrated.get("direct_radiance_out")

        if self.config.use_transient and self.use_indirect:
            tid, tis = render_utils.zero_invalid_bins(
                integrated.get("indirect_diffuse_radiance_out"),
                integrated.get("indirect_specular_radiance_out"),
                rays,
                sampler_results["means"],
                self.config,
            )
            outputs["transient_indirect"] = tid + tis
            outputs["transient_indirect_diffuse"] = tid
            outputs["transient_indirect_specular"] = tis
        elif self.config.use_transient:
            zeros_t = jnp.repeat(
                jnp.zeros_like(outputs["direct_diffuse_rgb"])[..., None, :],
                self.config.n_bins,
                axis=-2,
            )
            outputs["transient_indirect"] = zeros_t
            outputs["transient_indirect_diffuse"] = jnp.zeros_like(zeros_t)
            outputs["transient_indirect_specular"] = jnp.zeros_like(zeros_t)

        if self.use_indirect:
            outputs["indirect_diffuse_rgb"] = integrated.get("indirect_diffuse_radiance_out")
            outputs["indirect_specular_rgb"] = integrated.get(
                "indirect_specular_radiance_out"
            )
            outputs["indirect_rgb"] = integrated.get("indirect_radiance_out")
            outputs["indirect_occ"] = integrated.get("indirect_occ")
        else:
            zeros = jnp.zeros_like(outputs["direct_rgb"])
            outputs["indirect_diffuse_rgb"] = zeros
            outputs["indirect_specular_rgb"] = zeros
            outputs["indirect_rgb"] = zeros
            outputs["indirect_occ"] = zeros

        outputs["diffuse_rgb"] = integrated.get("diffuse_radiance_out")
        outputs["specular_rgb"] = integrated.get("specular_radiance_out")
        for f in integrated:
            if f.startswith("ref_"):
                outputs[f] = integrated[f]

        outputs["ray_dists"] = jnp.linalg.norm(
            rays.origins[..., None, :] - sampler_results["means"], axis=-1, keepdims=True
        )
        if self.use_active:
            if self.config.learnable_light:
                lights = jax.lax.stop_gradient(
                    self.learnable_light.get_lights(rays.lights, rays.vcam_look, rays.vcam_up)
                )
            else:
                lights = rays.lights
            outputs["light_dists"] = jnp.linalg.norm(
                lights[..., None, :] - sampler_results["means"], axis=-1, keepdims=True
            )

        # Radius mask on everything (material.py:2694-2699).
        mask = (
            jnp.linalg.norm(sampler_results["means"], axis=-1, keepdims=True)
            < self.config.material_loss_radius
        ).astype(jnp.float32)
        for k in outputs:
            v = outputs[k]
            if not isinstance(v, jnp.ndarray):
                continue
            # Rank-aware: any time-binned buffer (one extra bins axis, e.g.
            # indirect_*_rgb in transient mode — not only keys named
            # "transient") gets the mask inserted before the bins axis.
            if self.config.use_transient and v.ndim == mask.ndim + 1:
                outputs[k] = stopgrad_with_weight(v, mask[..., None, :])
            elif v.ndim == mask.ndim:
                outputs[k] = stopgrad_with_weight(v, mask)


def _steady_integration_strategy(use_active):
    extra = (
        {"occ": {"sum_over": [("direct_diffuse_occ", ())], "scale": 1.0}}
        if use_active
        else {}
    )
    s = lambda *keys: [(k, ()) for k in keys]
    return dict(
        **extra,
        indirect_occ={"sum_over": s("indirect_specular_indirect_occ"), "scale": 0.5},
        radiance_out={
            "sum_over": s(
                "direct_diffuse_radiance_out",
                "direct_specular_radiance_out",
                "indirect_diffuse_radiance_out",
                "indirect_specular_radiance_out",
            ),
            "scale": 1.0,
        },
        direct_radiance_out={
            "sum_over": s("direct_diffuse_radiance_out", "direct_specular_radiance_out"),
            "scale": 1.0,
        },
        indirect_radiance_out={
            "sum_over": s(
                "indirect_diffuse_radiance_out", "indirect_specular_radiance_out"
            ),
            "scale": 1.0,
        },
        diffuse_radiance_out={
            "sum_over": s("direct_diffuse_radiance_out", "indirect_diffuse_radiance_out"),
            "scale": 1.0,
        },
        specular_radiance_out={
            "sum_over": s(
                "direct_specular_radiance_out", "indirect_specular_radiance_out"
            ),
            "scale": 1.0,
        },
        direct_diffuse_radiance_out={
            "sum_over": s("direct_diffuse_radiance_out"), "scale": 1.0
        },
        direct_specular_radiance_out={
            "sum_over": s("direct_specular_radiance_out"), "scale": 1.0
        },
        indirect_diffuse_radiance_out={
            "sum_over": s("indirect_diffuse_radiance_out"), "scale": 1.0
        },
        indirect_specular_radiance_out={
            "sum_over": s("indirect_specular_radiance_out"), "scale": 1.0
        },
        irradiance={
            "sum_over": s("direct_diffuse_irradiance", "indirect_diffuse_irradiance"),
            "scale": 0.5,
        },
        direct_irradiance={"sum_over": s("direct_diffuse_irradiance"), "scale": 1.0},
        indirect_irradiance={"sum_over": s("indirect_diffuse_irradiance"), "scale": 1.0},
    )


def _transient_integration_strategy():
    """Transient lobes carry a bins axis; some sums reduce it (material.py:2815-2909)."""
    strategy = _steady_integration_strategy(use_active=True)
    strategy["radiance_out"] = {
        "sum_over": [
            ("direct_diffuse_radiance_out", ()),
            ("direct_specular_radiance_out", ()),
            ("indirect_diffuse_radiance_out", (-2,)),
            ("indirect_specular_radiance_out", (-2,)),
        ],
        "scale": 1.0,
    }
    strategy["diffuse_radiance_out"] = {
        "sum_over": [
            ("direct_diffuse_radiance_out", ()),
            ("indirect_diffuse_radiance_out", (-2,)),
        ],
        "scale": 1.0,
    }
    strategy["specular_radiance_out"] = {
        "sum_over": [
            ("direct_specular_radiance_out", ()),
            ("indirect_specular_radiance_out", (-2,)),
        ],
        "scale": 1.0,
    }
    strategy["irradiance"] = {
        "sum_over": [
            ("direct_diffuse_irradiance", ()),
            ("indirect_diffuse_irradiance", (-2,)),
        ],
        "scale": 0.5,
    }
    strategy["indirect_irradiance"] = {
        "sum_over": [("indirect_diffuse_irradiance", (-2,))],
        "scale": 1.0,
    }
    return strategy


@gin.configurable
class MaterialMLP(BaseMaterialMLP):
    use_active: bool = False

    def _build_integration_strategy(self):
        return _steady_integration_strategy(self.use_active)


@gin.configurable
class TransientMaterialMLP(BaseMaterialMLP):
    use_active: bool = True

    def _build_integration_strategy(self):
        return _transient_integration_strategy()
