"""Model composition: sampler → (resample) → shader → integrator.

Behavioral parity target: reference internal/models.py (Model :64-640,
BaseNeRFModel :643-774, NeRFModel :777-908, TransientNeRFModel :911-982).
The Model base carries the resampled-estimator machinery (categorical draw of
num_resample samples ∝ weights with weights ÷ sg(N·p)), env-map compositing
for secondary rays, and the volume control-variate pass combiner.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.models import integrator as integrator_lib
from neural_radiance_caching_tpu.models import nerf_shader, sampler as sampler_lib
from neural_radiance_caching_tpu.models import surface_light_field
from neural_radiance_caching_tpu.ops import math, render_utils
from neural_radiance_caching_tpu.utils import jaxutil
from neural_radiance_caching_tpu.utils.jaxutil import stopgrad_with_weight


@gin.configurable
class Model(nn.Module):
    """Shared base: importance-sampler registries + resampling machinery."""

    config: Any = None
    use_material: bool = False

    random_generator_2d: Any = render_utils.RandomGenerator2D(1, 1, False)

    uniform_importance_samplers: Any = ((render_utils.UniformHemisphereSampler(), 1.0),)
    uniform_sphere_importance_samplers: Any = ((render_utils.UniformSphereSampler(), 1.0),)
    cosine_importance_samplers: Any = ((render_utils.CosineSampler(), 1.0),)
    light_importance_samplers: Any = ((render_utils.UniformHemisphereSampler(), 1.0),)
    distance_importance_samplers: Any = ((render_utils.UniformHemisphereSampler(), 1.0),)
    light_field_importance_samplers: Any = (
        (render_utils.UniformHemisphereSampler(), 1),
        (render_utils.MicrofacetSampler(), 1),
    )
    irradiance_importance_samplers: Any = (
        (render_utils.CosineSampler(), 1),
        (render_utils.LightSampler(), 1),
    )
    extra_ray_importance_samplers: Any = (
        (render_utils.UniformHemisphereSampler(), 1),
        (render_utils.IdentitySampler(), 1),
    )
    active_importance_samplers: Any = ((render_utils.ActiveSampler(), 1.0),)

    # Distant-environment model for escaped secondary rays.
    use_env_map: bool = False
    env_map_near: float = float("inf")
    env_map_far: float = float("inf")
    env_map_params: Any = None

    # Surface light field memory (cheap far-field cache of outgoing radiance).
    use_surface_light_field: bool = False
    surface_lf_mem_distance_near: float = 1e-3
    surface_lf_mem_distance_far: float = 1e6
    surface_lf_mem_params: Any = None

    # Resampled estimator: when active, the per-ray sample set collapses to
    # num_resample categorical draws ∝ weights (see maybe_resample).
    resample: bool = False
    resample_render: bool = False
    resample_secondary: bool = False
    resample_argmax: bool = False
    num_resample: int = 1
    logits_mult: float = 1.0
    logits_mult_secondary: float = 1.0
    weights_bias: float = 0.0
    use_raydist_for_secondary_only: bool = False

    # Gradient-flow weights (1.0 = gradients pass, 0.0 = stop_gradient).
    stopgrad_geometry_weight: float = 1.0
    stopgrad_geometry_variate_weight: float = 0.0
    stopgrad_geometry_feature_weight: float = 1.0
    stopgrad_geometry_normals_weight: float = 1.0
    stopgrad_weight_variate: float = 1.0
    stopgrad_weight_model: float = 1.0
    stopgrad_cache_weight: Tuple[float, float] = (1.0, 1.0)
    stopgrad_slf_weight: Tuple[float, float] = (1.0, 1.0)
    stopgrad_env_map_weight: Tuple[float, float] = (1.0, 1.0)

    # (prop level, prop level, final) sample counts per training/render pass.
    train_sampling_strategy: Tuple[Tuple[int, int, int], ...] = (
        (0, 0, 64), (1, 1, 64), (2, 2, 32),
    )
    render_sampling_strategy: Tuple[Tuple[int, int, int], ...] = (
        (0, 0, 64), (1, 1, 64), (2, 2, 32),
    )

    def do_resample(self, do_resample, is_secondary, train):
        return (
            do_resample
            or (train and self.resample)
            or (not train and self.resample_render)
            or (is_secondary and self.resample_secondary)
        )

    def use_volume_variate(self, is_secondary):
        return (self.config.volume_variate_secondary and is_secondary) or (
            self.config.volume_variate and not is_secondary
        )

    def get_variate_passes(self, is_secondary):
        return (
            self.config.volume_variate_passes_secondary
            if is_secondary
            else self.config.volume_variate_passes
        )

    def get_bg_and_raydist(self, is_secondary):
        if is_secondary:
            return (0.0, 0.0), True
        return None, not self.use_raydist_for_secondary_only

    def get_sampling_strategy(self, train, sampling_strategy):
        if sampling_strategy is not None:
            return sampling_strategy
        return self.train_sampling_strategy if train else self.render_sampling_strategy

    def _get_logits_mult(self, is_secondary):
        return self.logits_mult_secondary if is_secondary else self.logits_mult

    def geometry_stopgrad_map(self, active, weight=None, feature=None,
                              normals=None):
        """Per-field gradient-flow weights applied to resampled geometry.

        Shared by the cache forward, the material sample filter, and the
        consistency pass (which overrides the three weights).
        """
        if not active:
            return {}
        w = self.stopgrad_geometry_weight if weight is None else weight
        f = self.stopgrad_geometry_feature_weight if feature is None else feature
        n = self.stopgrad_geometry_normals_weight if normals is None else normals
        return {
            "weights": w, "weights_no_filter": w, "feature": f,
            "normals_pred": n, "normals": n, "normals_to_use": n,
        }

    def maybe_resample(self, rng, resample, sampler_results, num_resample, inds=None,
                       logits_mult=1.0):
        """Draw num_resample samples ∝ weights; weights ÷ sg(N·p) stays unbiased.

        Reference models.py:193-292. Returns (filtered_results, indices).
        """
        if not resample:
            sampler_results = jaxutil.copy_tree(sampler_results)
            sampler_results["weights_no_filter"] = sampler_results["weights"]
            return sampler_results, None

        weights = sampler_results["weights"]
        batch_shape = sampler_results["points"].shape[:-2]

        def weight_logits_probs(w):
            logits = math.safe_log(w + self.weights_bias) * logits_mult
            return logits, jax.nn.softmax(logits, axis=-1)

        def draw(key, logits, count):
            return jax.random.categorical(
                key, logits=logits[..., None], axis=-2,
                shape=batch_shape + (count,),
            )

        logits, probs = weight_logits_probs(weights)
        if self.resample_argmax:
            # Deterministically keep the max-weight sample; the remaining
            # num_resample-1 draws come from the distribution with that
            # sample's mass removed.
            inds_argmax = jnp.argmax(logits, axis=-1, keepdims=True)
            sample_pos = jnp.arange(weights.shape[-1], dtype=jnp.int32)
            residual = jnp.where(
                sample_pos == inds_argmax, jnp.zeros_like(weights), weights
            )
            new_logits, new_probs = weight_logits_probs(residual)

        if inds is None:
            key, rng = jaxutil.random_split(rng)
            if self.resample_argmax:
                inds = jnp.concatenate(
                    [inds_argmax, draw(key, new_logits, num_resample - 1)],
                    axis=-1,
                )
            else:
                inds = draw(key, logits, num_resample)

        ref_ndim = len(sampler_results["points"].shape)

        def take_multiple(path, x):
            if any("_no_filter" in str(p) for p in path):
                return x
            if isinstance(x, jnp.ndarray):
                if len(x.shape) == ref_ndim - 2:
                    return jnp.take_along_axis(x[..., None], inds, axis=-1)
                if len(x.shape) < ref_ndim:
                    return jnp.take_along_axis(x, inds, axis=-1)
                if len(x.shape) > ref_ndim:
                    return jnp.take_along_axis(x, inds[..., None, None], axis=-3)
                return jnp.take_along_axis(x, inds[..., None], axis=-2)
            return x

        filtered = jax.tree_util.tree_map_with_path(take_multiple, sampler_results)
        filtered["tdist"] = sampler_results["tdist"]
        filtered["sdist"] = sampler_results["sdist"]
        filtered["weights_no_filter"] = sampler_results["weights"]
        filtered_probs = jnp.take_along_axis(probs, inds, axis=-1)

        if self.resample_argmax:
            weights_argmax = filtered["weights"][..., :1]
            filtered_new_probs = jnp.take_along_axis(new_probs, inds[..., 1:], axis=-1)
            w = filtered["weights"][..., 1:] / jax.lax.stop_gradient(
                (num_resample - 1) * filtered_new_probs + 1e-8
            )
            filtered["weights"] = jnp.concatenate([weights_argmax, w], axis=-1)
        else:
            filtered["weights"] = filtered["weights"] / jax.lax.stop_gradient(
                num_resample * filtered_probs + 1e-8
            )

        return filtered, inds

    # --- env map on secondary rays -------------------------------------------

    def _handle_env_map(self, rng, rays, train, train_frac, **render_kwargs):
        use_env_map = render_kwargs.pop("use_env_map", True)
        env_map_outputs = {}
        if self.use_env_map and use_env_map:
            env_map = render_kwargs.pop("env_map", None)
            env_map_w = render_kwargs.pop("env_map_w", None)
            env_map_h = render_kwargs.pop("env_map_h", None)
            stopgrad_cache_weight = render_kwargs.pop("stopgrad_cache_weight", None)
            env_rays = jaxutil.partial_stopgrad_rays(rays, stopgrad_cache_weight)

            if env_map is not None:
                values = render_utils.get_environment_color(env_rays, env_map, env_map_w, env_map_h)
                env_map_outputs = {
                    "incoming_rgb": values.reshape(
                        rays.origins.shape[:-1] + (self.config.num_rgb_channels,)
                    )
                }
            else:
                key, rng = jaxutil.random_split(rng)
                env_map_outputs = self.env_map(
                    key,
                    env_rays,
                    {
                        "means": env_rays.origins[..., None, :],
                        "covs": jnp.ones_like(env_rays.origins)[..., None, :],
                    },
                    env_rays.origins[..., None, :],
                    env_rays.viewdirs[..., None, :],
                    roughness=jnp.zeros_like(env_rays.origins[..., None, :1]),
                    shader_bottleneck=None,
                    train=train,
                    train_frac=train_frac,
                )
                env_map_outputs["incoming_rgb_no_stopgrad"] = env_map_outputs["incoming_rgb"]
                if stopgrad_cache_weight is not None and stopgrad_cache_weight != (1.0, 1.0):
                    env_map_outputs["incoming_rgb"] = stopgrad_with_weight(
                        env_map_outputs["incoming_rgb"], stopgrad_cache_weight[1]
                    )
        return env_map_outputs

    def _composite_env_map(self, rng, rays, integrator_results, env_map_outputs, train,
                           train_frac, **render_kwargs):
        del rng, rays, train, train_frac
        use_env_map = render_kwargs.pop("use_env_map", True)
        if self.use_env_map and use_env_map and env_map_outputs:
            acc = integrator_results["acc"]
            env_rgb = env_map_outputs["incoming_rgb"].reshape(integrator_results["rgb"].shape)
            env_rgb_ns = env_map_outputs.get("incoming_rgb_no_stopgrad", env_rgb).reshape(
                integrator_results["rgb"].shape
            )
            integrator_results["rgb"] = integrator_results["rgb"] + env_rgb * (
                1.0 - acc[..., None]
            )
            if "rgb_no_stopgrad" in integrator_results:
                integrator_results["rgb_no_stopgrad"] = integrator_results[
                    "rgb_no_stopgrad"
                ] + jax.lax.stop_gradient(env_rgb) * (1.0 - acc[..., None])
            integrator_results["env_map_rgb"] = env_rgb
            integrator_results["env_map_rgb_no_stopgrad"] = env_rgb_ns
        return integrator_results

    def _handle_secondary(self, rng, rays, is_secondary, integrator_results, train, train_frac,
                          **render_kwargs):
        if not is_secondary:
            return integrator_results
        stopgrad_cache_weight = render_kwargs.pop("stopgrad_cache_weight", None)

        for k in list(integrator_results.keys()):
            if ("rgb" in k) or ("transient" in k) or ("acc" in k):
                v = integrator_results[k]
                if v is None:
                    continue
                integrator_results[f"{k}_no_stopgrad"] = jnp.copy(v)
                if stopgrad_cache_weight is not None and stopgrad_cache_weight != (1.0, 1.0):
                    integrator_results[k] = stopgrad_with_weight(v, stopgrad_cache_weight[1])

        key, rng = jaxutil.random_split(rng)
        env_map_outputs = self._handle_env_map(
            key, rays, train, train_frac, stopgrad_cache_weight=stopgrad_cache_weight,
            **render_kwargs,
        )
        key, rng = jaxutil.random_split(rng)
        return self._composite_env_map(
            key, rays, integrator_results, env_map_outputs, train, train_frac, **render_kwargs
        )

    # --- shader + integrator (+ volume variate) -------------------------------

    def apply_shader_and_integrator(
        self,
        rng,
        rays,
        cache_rays,
        sampler_results,
        filtered_sampler_results,
        stopgrad_map,
        train,
        train_frac,
        is_secondary,
        bg_intensity_range,
        **render_kwargs,
    ):
        weights_only = render_kwargs.get("weights_only", False)
        filtered_sampler_results = jaxutil.apply_stopgrad_fields(
            filtered_sampler_results, stopgrad_map
        )
        # Common state threaded through every shade→integrate→env-composite
        # chain in this method (the volume variate repeats the chain twice).
        shared = dict(train_frac=train_frac, train=train, is_secondary=is_secondary)

        def shade_and_integrate(rng, inputs, passes=None):
            extra = {} if passes is None else {"passes": passes}
            key_a, key_b, key_c = jax.random.split(rng, 3)
            sr = self.shader(
                rng=key_a, rays=cache_rays, sampler_results=inputs,
                filtered_sampler_results=inputs,
                **shared, **extra, **render_kwargs,
            )
            sr.setdefault("weights_no_filter", sr["weights"])
            ir = self.integrator(
                rng=key_b, rays=cache_rays, shader_results=sr,
                bg_intensity_range=bg_intensity_range,
                **shared, **render_kwargs,
            )
            ir = self._handle_secondary(
                key_c, rays, is_secondary, ir, train, train_frac, **render_kwargs
            )
            return sr, ir

        if weights_only:
            shader_results = self.make_weights_only_shader_results(
                cache_rays, filtered_sampler_results
            )
            key, rng = jaxutil.random_split(rng)
            integrator_results = self.integrator(
                rng=key, rays=cache_rays, shader_results=shader_results,
                bg_intensity_range=bg_intensity_range,
                **shared, **render_kwargs,
            )
            key, rng = jaxutil.random_split(rng)
            integrator_results = self._handle_secondary(
                key, rays, is_secondary, integrator_results, train, train_frac,
                **render_kwargs,
            )
            return shader_results, integrator_results

        key, rng = jaxutil.random_split(rng)
        shader_results, integrator_results = shade_and_integrate(
            key, filtered_sampler_results
        )

        if self.use_volume_variate(is_secondary):
            # Control variate: E[f(full)] - E[f(resampled_biased)] + f(resampled).
            variate_passes = self.get_variate_passes(is_secondary)
            key_t, key_b, rng = jax.random.split(rng, 3)
            variate_results, biased_total = shade_and_integrate(
                key_t, sampler_results[-1], variate_passes
            )
            _, biased = shade_and_integrate(
                key_b, filtered_sampler_results, variate_passes
            )

            self._handle_volume_variate_pass(
                integrator_results,
                biased,
                biased_total,
                keys=[
                    "rgb",
                    "diffuse_rgb",
                    "specular_rgb",
                    "direct_rgb",
                    "indirect_rgb",
                    "transient_indirect",
                ],
                stopgrad_weight_variate=self.stopgrad_weight_variate,
                stopgrad_weight_model=self.stopgrad_weight_model,
            )
            shader_results = variate_results if not is_secondary else shader_results

        return shader_results, integrator_results

    def _handle_volume_variate_pass(
        self,
        unbiased,
        biased,
        biased_total,
        keys,
        stopgrad_weight_variate=1.0,
        stopgrad_weight_model=1.0,
    ):
        for k in keys:
            if (
                biased_total.get(k) is None
                or biased.get(k) is None
                or unbiased.get(k) is None
            ):
                continue
            unbiased[k] = stopgrad_with_weight(
                biased_total[k] - biased[k].reshape(unbiased[k].shape),
                stopgrad_weight_variate,
            ) + stopgrad_with_weight(unbiased[k], stopgrad_weight_model)


@gin.configurable
class BaseNeRFModel(Model):
    sampler_params: Any = None
    shader_params: Any = None
    integrator_params: Any = None
    extra_model_params: Any = None

    @nn.compact
    def __call__(self, rng, rays, **render_kwargs):
        train_frac = render_kwargs.pop("train_frac", 1.0)
        train = render_kwargs.pop("train", True)
        sampling_strategy = render_kwargs.pop("sampling_strategy", None)
        cache_outputs = render_kwargs.pop("cache_outputs", None)
        filtered_sampler_inds = render_kwargs.pop("filtered_sampler_inds", None)

        is_secondary = render_kwargs.pop("is_secondary", False)
        do_resample = self.do_resample(render_kwargs.pop("resample", False), is_secondary, train)
        bg_intensity_range, use_raydist_fn = self.get_bg_and_raydist(is_secondary)

        if is_secondary and self.use_env_map:
            rays = rays.replace(far=jnp.minimum(rays.far, self.config.env_map_distance))

        stopgrad_cache_weight = (
            render_kwargs.pop("stopgrad_cache_weight", None) if is_secondary else None
        )
        cache_rays = jaxutil.partial_stopgrad_rays(rays, stopgrad_cache_weight)

        passes = render_kwargs.pop("passes", ())
        if "geometry" in passes:
            # Geometry-only bypass (models.py:1256-1290): re-evaluate the final
            # density MLP at externally supplied (possibly jittered) points —
            # used by the geometry-smoothness regularizer.
            geo_sampler_results = render_kwargs.pop("sampler_results")
            render_kwargs.pop("compute_extras", None)
            key, rng = jaxutil.random_split(rng)
            return self.sampler.mlps[-1](
                rng=key,
                rays=rays,
                gaussians=(geo_sampler_results["means"], geo_sampler_results["covs"]),
                tdist=geo_sampler_results["tdist"],
                train_frac=train_frac,
                train=train,
            )

        use_slf = render_kwargs.pop("use_slf", False)
        if use_slf and self.use_surface_light_field:
            key, rng = jaxutil.random_split(rng)
            return self.get_slf_results(key, rays, train_frac, train, **render_kwargs)

        env_map_only = render_kwargs.pop("env_map_only", False)
        if env_map_only and self.use_env_map:
            key, rng = jaxutil.random_split(rng)
            return self._handle_env_map(key, rays, train, train_frac, **render_kwargs)

        # Mesh shortcut plumbing (models.py threads `mesh` to every sampler
        # entry): consumed here so shader/integrator kwargs stay clean.
        mesh = render_kwargs.pop("mesh", None)
        use_mesh = render_kwargs.pop("use_mesh", True)
        if cache_outputs is not None:
            # Reuse a prior forward's sampler hierarchy (gradient-debias
            # second pass / secondary-ray replays).
            sampler_results = jaxutil.copy_tree(cache_outputs["sampler"])
        else:
            key, rng = jaxutil.random_split(rng)
            sampler_results = self.sampler(
                rng=key, rays=cache_rays, train_frac=train_frac, train=train,
                sampling_strategy=self.get_sampling_strategy(train, sampling_strategy),
                use_raydist_fn=use_raydist_fn, is_secondary=is_secondary,
                mesh=mesh, use_mesh=use_mesh,
                **render_kwargs,
            )

        key, rng = jaxutil.random_split(rng)
        filtered_sampler_results, filtered_sampler_inds = self.maybe_resample(
            rng=key,
            resample=do_resample,
            sampler_results=sampler_results[-1],
            num_resample=self.num_resample,
            logits_mult=self._get_logits_mult(is_secondary),
            inds=filtered_sampler_inds,
        )

        key, rng = jaxutil.random_split(rng)
        shader_results, integrator_results = self.apply_shader_and_integrator(
            key, rays, cache_rays, sampler_results, filtered_sampler_results,
            self.geometry_stopgrad_map(do_resample), train, train_frac,
            is_secondary, bg_intensity_range,
            stopgrad_cache_weight=stopgrad_cache_weight,
            **render_kwargs,
        )

        main = dict(
            loss_weight=1.0,
            sampler=sampler_results,
            filtered_sampler_inds=filtered_sampler_inds,
            shader=shader_results,
            geometry=sampler_results[-1],
            integrator=integrator_results,
        )
        return {"main": main, "render": integrator_results}


@gin.configurable
class NeRFModel(BaseNeRFModel):
    """Steady-state radiance cache: proposal sampler + NeRFMLP + integrator."""

    def setup(self):
        self.sampler = sampler_lib.ProposalVolumeSampler(
            config=self.config,
            **dict(self.sampler_params or {}),
            **dict(self.extra_model_params or {}),
            name="Sampler",
        )
        self.shader = nerf_shader.NeRFMLP(
            config=self.config,
            env_map_near=self.env_map_near,
            env_map_far=self.env_map_far,
            **dict(self.shader_params or {}),
            name="Shader",
        )
        self.integrator = integrator_lib.VolumeIntegrator(
            config=self.config, **dict(self.integrator_params or {}), name="Integrator"
        )

        if self.use_env_map:
            env_params = dict(self.env_map_params or {})
            env_params["distance_near"] = self.env_map_near
            env_params["distance_far"] = self.env_map_far
            self.env_map = surface_light_field.SurfaceLightFieldMLP(
                name="EnvMap", config=self.config, **env_params
            )

        if self.use_surface_light_field:
            slf_params = dict(self.surface_lf_mem_params or {})
            slf_params["distance_near"] = self.surface_lf_mem_distance_near
            if self.use_env_map and self.config.env_map_distance < float("inf"):
                slf_params["distance_far"] = self.config.env_map_distance
            else:
                slf_params["distance_far"] = self.surface_lf_mem_distance_far
            self.surface_lf_mem = surface_light_field.SurfaceLightFieldMLP(
                name="SurfaceLightFieldMem", use_env_alpha=True, config=self.config, **slf_params
            )

    def make_weights_only_shader_results(self, rays, sampler_results):
        shader_results = jaxutil.copy_tree(sampler_results)
        shader_results["rgb"] = jnp.repeat(
            jnp.ones_like(shader_results["weights"])[..., None], 3, -1
        )
        return shader_results

    def get_slf_results(self, rng, rays, train_frac, train, **render_kwargs):
        stopgrad_slf_weight = render_kwargs.pop("stopgrad_slf_weight", None)
        dist_only = render_kwargs.get("dist_only", False)
        slf_rays = jaxutil.partial_stopgrad_rays(rays, stopgrad_slf_weight)
        render_kwargs.pop("origins", None)
        render_kwargs.pop("viewdirs", None)

        key, rng = jaxutil.random_split(rng)
        slf_results = self.surface_lf_mem(
            key,
            slf_rays,
            {
                "means": rays.origins[..., None, :],
                "covs": jnp.ones_like(rays.origins[..., None, :]),
            },
            rays.origins[..., None, :],
            rays.viewdirs[..., None, :],
            roughness=jnp.zeros_like(rays.origins[..., None, :1]),
            shader_bottleneck=None,
            train=train,
            train_frac=train_frac,
            **render_kwargs,
        )
        if dist_only:
            return slf_results

        slf_integrator_results = {
            "rgb": slf_results["incoming_rgb"],
            "acc": slf_results["incoming_acc"],
        }
        key, rng = jaxutil.random_split(rng)
        slf_integrator_results = self._handle_secondary(
            key, rays, True, slf_integrator_results, train, train_frac, **render_kwargs
        )
        slf_integrator_results = dict(**slf_integrator_results, **slf_results)
        slf_integrator_results["incoming_rgb"] = slf_integrator_results["rgb_no_stopgrad"]
        slf_integrator_results["incoming_acc"] = slf_integrator_results["acc_no_stopgrad"]
        return slf_integrator_results


@gin.configurable
class TransientNeRFModel(BaseNeRFModel):
    """Time-resolved radiance cache (InvProp)."""

    def setup(self):
        self.sampler = sampler_lib.ProposalVolumeSampler(
            config=self.config,
            **dict(self.sampler_params or {}),
            **dict(self.extra_model_params or {}),
            name="Sampler",
        )
        self.shader = nerf_shader.TransientNeRFMLP(
            config=self.config, **dict(self.shader_params or {}), name="Shader"
        )
        self.integrator = integrator_lib.TransientVolumeIntegrator(
            config=self.config, **dict(self.integrator_params or {}), name="Integrator"
        )

    def make_weights_only_shader_results(self, rays, sampler_results):
        shader_results = jaxutil.copy_tree(sampler_results)
        light_offset = rays.lights[..., None, :] - sampler_results["means"]
        shader_results["light_dists"] = jnp.linalg.norm(light_offset, axis=-1, keepdims=True)
        ray_offset = rays.origins[..., None, :] - sampler_results["means"]
        shader_results["ray_dists"] = jnp.linalg.norm(ray_offset, axis=-1, keepdims=True)
        t_shape = shader_results["weights"].shape + (
            self.config.n_bins,
            self.config.num_rgb_channels,
        )
        for k in ("transient_indirect", "transient_indirect_specular",
                  "transient_indirect_diffuse"):
            shader_results[k] = jnp.ones(t_shape)
        rgb_ones = jnp.repeat(
            jnp.ones_like(shader_results["weights"])[..., None],
            self.config.num_rgb_channels,
            -1,
        )
        shader_results["rgb"] = rgb_ones
        shader_results["direct_rgb"] = rgb_ones
        return shader_results


@gin.configurable
class VignetteMap(nn.Module):
    """Per-ray vignette multiplier MLP on dot(viewdir, look) (models.py:985-1040)."""

    config: Any = None

    deg_vignette: int = 2
    net_depth_vignette: int = 2
    net_width_vignette: int = 64
    skip_layer_vignette: int = 4
    net_activation: Any = nn.relu

    @nn.compact
    def __call__(self, rays):
        from neural_radiance_caching_tpu.ops import coord

        v_input = math.dot(rays.viewdirs, rays.look, axis=-1, keepdims=True)
        x = coord.pos_enc(v_input, 0, self.deg_vignette, True)
        inputs = x
        for i in range(self.net_depth_vignette):
            x = nn.Dense(
                self.net_width_vignette,
                kernel_init=jax.nn.initializers.he_uniform(),
                name=f"layer_{i}",
            )(x)
            x = self.net_activation(x)
        if i % self.skip_layer_vignette == 0 and i > 0:
            x = jnp.concatenate([x, inputs], axis=-1)
        out = nn.Dense(
            1, kernel_init=jax.nn.initializers.he_uniform(), name="output_layer"
        )(x)
        return nn.sigmoid(out) * 2.0
