"""Material model: cache pass -> resample to surface points -> material pass.

Behavioral parity target: reference internal/models.py (BaseMaterialModel
:1043-2320). The pipeline per forward:
  1. cache pass: full NeRFModel render (`cache_main` supervision target),
  2. resample the cache's final samples down to num_resample surface points
     (resampled estimator) and run the cache shader at those points for the
     cache-consistency targets,
  3. learnable vMF light sampling at the surface points,
  4. material pass: MaterialMLP fires secondary rays into the cache; its
     outputs are alpha-composited by the material integrator, with the SLF
     control-variate correction and optional volume variate.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.models import integrator as integrator_lib
from neural_radiance_caching_tpu.models import light_sampler as light_sampler_lib
from neural_radiance_caching_tpu.models import material_shader
from neural_radiance_caching_tpu.models import nerf_model
from neural_radiance_caching_tpu.utils import jaxutil
from neural_radiance_caching_tpu.utils.jaxutil import stopgrad_with_weight


@gin.configurable
class BaseMaterialModel(nerf_model.Model):
    # Sub-module constructor params (each a kwargs dict or None).
    cache_model_params: Any = None
    light_sampler_params: Any = None
    sampler_params: Any = None
    shader_params: Any = None
    integrator_params: Any = None
    extra_model_params: Any = None

    # Which heads exist.
    use_material: bool = True
    use_light_sampler: bool = True
    use_vignette: bool = False
    share_material: bool = False
    share_light_power: bool = False

    # Per-head data-loss settings (consumed by the loss assembly via the
    # output dicts; gin-bound names match reference models.py:818-860).
    loss: str = "rawnerf_unbiased"
    loss_weight: float = 1.0
    linear_to_srgb: bool = False
    cache_loss: str = "charb"
    cache_loss_weight: float = 1.0
    cache_linear_to_srgb: bool = True
    material_loss: str = "rawnerf_unbiased"
    material_loss_weight: float = 1.0
    material_linear_to_srgb: bool = False

    # Resampled-estimator knobs: how cache samples collapse to the
    # num_resample surface points the material pass shades.
    resample: bool = False
    resample_render: bool = False
    resample_secondary: bool = False
    num_resample: int = 1
    logits_mult: float = 1.0
    logits_mult_secondary: float = 1.0
    weights_bias: float = 0.0
    use_resample_depth: bool = False
    depth_key: str = "distance_median"

    # Gradient-flow control between the material head and cache geometry:
    # 0.0 = full stop-gradient, 1.0 = gradients flow.
    stopgrad_samples: bool = False
    stopgrad_geometry_weight: float = 0.0
    stopgrad_geometry_variate_weight: float = 0.0
    stopgrad_geometry_feature_weight: float = 0.0
    stopgrad_geometry_normals_weight: float = 1.0
    stopgrad_geometry_weight_consistency: float = 0.0
    stopgrad_geometry_feature_weight_consistency: float = 0.0
    stopgrad_geometry_normals_weight_consistency: float = 0.0

    # Control variates (SLF single-point + volume).
    slf_variate: bool = True
    stopgrad_weight_variate: float = 0.0
    stopgrad_weight_model: float = 1.0

    def setup(self):
        self.cache = nerf_model.NeRFModel(
            config=self.config,
            use_surface_light_field=self.use_surface_light_field,
            **dict(self.cache_model_params or {}),
            **dict(self.extra_model_params or {}),
            name="Cache",
        )
        if self.use_light_sampler:
            self.light_sampler = light_sampler_lib.LightMLP(
                config=self.config,
                **dict(self.light_sampler_params or {}),
                name="LightSampler",
            )
        self.shader = self._make_shader()
        self.integrator = self._make_integrator()
        if self.use_vignette:
            from neural_radiance_caching_tpu.models.nerf_model import VignetteMap

            self.vignette_map = VignetteMap(config=self.config, name="VignetteMap")

    def _make_shader(self):
        return material_shader.MaterialMLP(
            config=self.config,
            use_surface_light_field=self.use_surface_light_field,
            **dict(self.shader_params or {}),
            name="MaterialShader",
        )

    def _make_integrator(self):
        return integrator_lib.VolumeIntegrator(
            config=self.config,
            **dict(self.integrator_params or {}),
            name="MaterialIntegrator",
        )

    # --- main ------------------------------------------------------------------

    @nn.compact
    def __call__(self, rng, rays, **render_kwargs):
        train_frac = render_kwargs.pop("train_frac", 1.0)
        train = render_kwargs.pop("train", True)
        passes = render_kwargs.pop("passes", ("cache", "light", "material"))
        compute_extras = render_kwargs.pop("compute_extras", False)
        extra_ray_regularizer = render_kwargs.pop("extra_ray_regularizer", False)
        is_secondary = render_kwargs.pop("is_secondary", False) or (
            "is_secondary" in passes
        )
        cache_outputs_in = render_kwargs.pop("cache_outputs", None)

        key, rng = jaxutil.random_split(rng)
        bypass_outputs, bypass = self._maybe_bypass_pipeline(
            key, rays, passes, train_frac, train, is_secondary=is_secondary,
            **render_kwargs,
        )
        if bypass_outputs is not None and bypass:
            return bypass_outputs

        vignette = None
        if self.use_vignette and not is_secondary:
            vignette = self.vignette_map(rays)

        render_kwargs.setdefault("radiance_cache", self)
        key, rng = jaxutil.random_split(rng)
        cache_outputs = self._handle_cache_pass(
            rng=key,
            rays=rays,
            train_frac=train_frac,
            train=train,
            is_secondary=is_secondary,
            vignette=vignette,
            cache_outputs=cache_outputs_in,
            compute_extras=compute_extras,
            **render_kwargs,
        )

        if ("material" in passes) and self.use_material:
            inds = render_kwargs.pop(
                "filtered_sampler_inds", cache_outputs["filtered_sampler_inds"]
            )
            key, rng = jaxutil.random_split(rng)
            filtered_sampler_results, cache_shader_results = self._get_material_samples(
                key, rays, cache_outputs["sampler"][-1], inds,
                train=train, train_frac=train_frac, is_secondary=is_secondary,
                **render_kwargs,
            )

            key, rng = jaxutil.random_split(rng)
            light_sampler_results = self._handle_light_sampling_pass(
                rng=key, rays=rays, train_frac=train_frac, train=train,
                filtered_sampler_results=filtered_sampler_results,
                **render_kwargs,
            )

            key, rng = jaxutil.random_split(rng)
            final_outputs = self._handle_material_pass(
                rng=key, rays=rays, train_frac=train_frac, train=train,
                is_secondary=is_secondary, vignette=vignette,
                cache_outputs=cache_outputs,
                cache_shader_results=cache_shader_results,
                filtered_sampler_results=filtered_sampler_results,
                light_sampler_results=light_sampler_results,
                compute_extras=compute_extras,
                extra_ray_regularizer=extra_ray_regularizer,
                **render_kwargs,
            )
        else:
            # Cache-only: the cache render IS the model output.
            final_outputs = {
                "cache_main": cache_outputs,
                "main": cache_outputs,
                "render": cache_outputs["integrator"],
            }
            cache_shader_results = {}
            light_sampler_results = {}

        return self._finalize_outputs(
            final_outputs,
            cache_outputs,
            cache_shader_results,
            passes,
            light_sampler_results,
            bypass_outputs,
            rays,
            vignette,
        )

    # --- bypasses (models.py:1256-1367) ------------------------------------------

    def _maybe_bypass_pipeline(self, rng, rays, passes, train_frac, train,
                               **render_kwargs):
        """Short-circuit entry points used by the probes/losses that need a
        single sub-module evaluated at externally-supplied sample positions
        rather than the full pipeline. Returns (outputs, done)."""
        shared = dict(rays=rays, train_frac=train_frac, train=train)

        def run_geometry_mlp(rng, sampler_results, kwargs):
            # Final-level density MLP re-evaluated at the given gaussians.
            return self.cache.sampler.mlps[-1](
                rng=rng,
                gaussians=(sampler_results["means"], sampler_results["covs"]),
                tdist=sampler_results["tdist"],
                **shared, **kwargs,
            )

        shader_passes = {"material_cache_shader", "material_shader"} & set(passes)
        if shader_passes:
            sampler_results = render_kwargs.pop("sampler_results")
            key, rng = jaxutil.random_split(rng)
            geo = run_geometry_mlp(key, sampler_results, render_kwargs)
            sampler_results = dict(sampler_results, feature=geo["feature"])

            key, rng = jaxutil.random_split(rng)
            material_results = self.shader(
                rng=key, sampler_results=sampler_results, radiance_cache=self,
                **shared, **render_kwargs,
            )
            if "material_cache_shader" not in passes:
                return material_results, True
            key, rng = jaxutil.random_split(rng)
            cache_results = self.cache.shader(
                rng=key, sampler_results=sampler_results,
                filtered_sampler_results=sampler_results, radiance_cache=self,
                **shared, **render_kwargs,
            )
            return {"material": material_results, "cache": cache_results}, True

        if "geometry" in passes:
            sampler_results = render_kwargs.pop("sampler_results")
            key, rng = jaxutil.random_split(rng)
            return run_geometry_mlp(key, sampler_results, render_kwargs), True

        if ("surface_light_field" in passes or "surface_light_field_vis" in passes) and (
            self.use_surface_light_field
        ):
            key, rng = jaxutil.random_split(rng)
            slf_results = self.cache(
                rng=key, use_slf=True, **shared, **render_kwargs
            )
            return slf_results, "surface_light_field" in passes

        return None, False

    # --- passes ------------------------------------------------------------------

    # Per-stage sub-result keys forwarded from the cache's "main" output into
    # the cache supervision target (the loss assembly reads exactly these).
    _CACHE_MAIN_KEYS = (
        "sampler", "filtered_sampler_inds", "geometry", "shader", "integrator",
    )

    def _handle_cache_pass(self, rng, rays, train_frac, train, is_secondary, vignette,
                           cache_outputs, **render_kwargs):
        """Full cache render; repackaged as the `cache_main` loss target with
        this model's cache-loss settings attached (models.py:1380-1396)."""
        key, rng = jaxutil.random_split(rng)
        cache_results = self.cache(
            rng=key,
            rays=rays,
            train_frac=train_frac,
            train=train,
            is_secondary=is_secondary,
            vignette=vignette,
            cache_outputs=cache_outputs,
            **render_kwargs,
        )["main"]
        target = {k: cache_results[k] for k in self._CACHE_MAIN_KEYS}
        target["loss_weight"] = self.cache_loss_weight
        target["loss_type"] = self.cache_loss
        target["linear_to_srgb"] = self.cache_linear_to_srgb
        return target

    def _get_material_samples(self, rng, rays, sampler_results, filtered_sampler_inds,
                              train=True, train_frac=1.0, is_secondary=False,
                              **render_kwargs):
        """Refilter cache samples to num_resample surface points + run the
        cache shader there for consistency targets (models.py:1398-1489)."""
        sampler_results = jaxutil.copy_tree(sampler_results)
        do_resample_cache = self.cache.do_resample(
            render_kwargs.get("resample", False), is_secondary, train
        )
        key, rng = jaxutil.random_split(rng)
        filtered_results, _ = self.maybe_resample(
            rng=key,
            resample=do_resample_cache,
            sampler_results=sampler_results,
            num_resample=self.cache.num_resample,
            inds=filtered_sampler_inds,
        )

        if do_resample_cache and (self.cache.num_resample == self.num_resample):
            filtered_results = jaxutil.copy_tree(filtered_results)
        else:
            key, rng = jaxutil.random_split(rng)
            filtered_results, _ = self.maybe_resample(
                rng=key,
                resample=self.do_resample(
                    render_kwargs.get("resample", False), is_secondary, train
                ),
                sampler_results=filtered_results,
                num_resample=self.num_resample,
                logits_mult=self._get_logits_mult(is_secondary),
            )
            filtered_results["weights_no_filter"] = sampler_results["weights"]

        if self.stopgrad_samples:
            filtered_results = jax.lax.stop_gradient(filtered_results)

        do_resample = do_resample_cache or self.do_resample(
            render_kwargs.get("resample", False), is_secondary, train
        )
        filtered_results_material = jaxutil.apply_stopgrad_fields(
            filtered_results, self.geometry_stopgrad_map(do_resample)
        )
        filtered_results_cache = jaxutil.apply_stopgrad_fields(
            filtered_results, self._consistency_stopgrad_map()
        )

        key, rng = jaxutil.random_split(rng)
        cache_shader_results = self.cache.shader(
            rng=key,
            rays=rays,
            sampler_results=filtered_results_cache,
            filtered_sampler_results=filtered_results_cache,
            train_frac=train_frac,
            train=train,
            is_secondary=is_secondary,
            **render_kwargs,
        )
        filtered_results_material["occ"] = jax.lax.stop_gradient(
            cache_shader_results["occ"]
        )
        return filtered_results_material, cache_shader_results

    def _consistency_stopgrad_map(self):
        return self.geometry_stopgrad_map(
            True,
            weight=self.stopgrad_geometry_weight_consistency,
            feature=self.stopgrad_geometry_feature_weight_consistency,
            normals=self.stopgrad_geometry_normals_weight_consistency,
        )

    def _gt_env_light(self, rays, sampler_results, render_kwargs):
        """Ground-truth environment light packet: the GT env map's pmf/pdf
        replaces the learned vMF sampler (relighting / GT-illumination)."""
        num_points = sampler_results["means"].shape[-2]
        packet = {
            k: render_kwargs.get(k)
            for k in ("env_map", "env_map_pmf", "env_map_pdf", "env_map_dirs",
                      "env_map_w", "env_map_h")
        }
        packet["light_idx"] = jnp.repeat(
            rays.light_idx[..., None, :], num_points, axis=-2
        )
        return packet

    def _use_gt_illumination(self):
        return self.config.compute_relight_metrics or (
            self.config.use_ground_truth_illumination
            and self.config.multi_illumination
        )

    def _handle_light_sampling_pass(self, rng, rays, filtered_sampler_results,
                                    train_frac, train, **render_kwargs):
        if self._use_gt_illumination():
            return self._gt_env_light(rays, filtered_sampler_results, render_kwargs)
        if not self.use_light_sampler:
            return None
        key, rng = jaxutil.random_split(rng)
        return self.light_sampler(
            rng=key,
            rays=rays,
            sampler_results=jax.lax.stop_gradient(filtered_sampler_results),
            train_frac=train_frac,
            train=train,
            **render_kwargs,
        )

    def _handle_material_pass(self, rng, rays, train_frac, train, is_secondary, vignette,
                              cache_outputs, cache_shader_results,
                              filtered_sampler_results, light_sampler_results,
                              compute_extras, extra_ray_regularizer, **render_kwargs):
        render_kwargs.setdefault("radiance_cache", self)
        # Every sub-call below shares the ray batch + schedule state; the
        # two integrator invocations additionally share their render flags.
        shared = dict(rays=rays, train_frac=train_frac, train=train, **render_kwargs)
        integrate = dict(
            shared, compute_extras=compute_extras, compute_distance=False,
            vignette=vignette,
        )

        key, rng = jaxutil.random_split(rng)
        material_shader_results = self.shader(
            rng=key,
            sampler_results=filtered_sampler_results,
            light_sampler_results=light_sampler_results,
            **shared,
        )

        key, rng = jaxutil.random_split(rng)
        material_integrator_results = self.integrator(
            rng=key, shader_results=material_shader_results, material=True,
            **integrate,
        )

        if self.slf_variate:
            key, rng = jaxutil.random_split(rng)
            self._handle_slf_variate_pass(
                key, rays, train_frac, train,
                filtered_sampler_results, light_sampler_results,
                material_shader_results, material_integrator_results,
                **render_kwargs,
            )

        # The material integrator never re-derives depth; geometry distances
        # come from the cache's own integration.
        for k, v in cache_outputs["integrator"].items():
            if "distance" in k:
                material_integrator_results[k] = v

        key, rng = jaxutil.random_split(rng)
        cache_integrator_results = self.integrator(
            rng=key, shader_results=cache_shader_results, material=False,
            **integrate,
        )

        # Cache-consistency integrator: the cache rendered at the material's
        # filtered surface points (models.py:1646-1659).
        consistency_map = self._consistency_stopgrad_map()
        key, rng = jaxutil.random_split(rng)
        _, cache_consistency_integrator_results = self.cache.apply_shader_and_integrator(
            key,
            rays,
            rays,
            jaxutil.copy_tree(cache_outputs["sampler"]),
            filtered_sampler_results,
            consistency_map,
            train,
            train_frac,
            False,
            None,
            **render_kwargs,
        )

        if self.config.volume_variate_material:
            cache_total = jaxutil.copy_tree(cache_outputs["integrator"])
            self._handle_volume_variate_pass(
                material_integrator_results,
                cache_integrator_results,
                cache_total,
                keys=[
                    "rgb",
                    "diffuse_rgb",
                    "specular_rgb",
                    "direct_rgb",
                    "indirect_rgb",
                    "transient_indirect",
                    "transient_indirect_specular",
                    "transient_indirect_diffuse",
                ],
                stopgrad_weight_variate=self.stopgrad_weight_variate,
                stopgrad_weight_model=self.stopgrad_weight_model,
            )

        # The material loss target: no sampler/geometry of its own (those
        # losses belong to the cache target), cache_* companions carried for
        # the consistency losses.
        material_outputs = dict(
            loss_weight=self.loss_weight,
            loss_type=self.loss,
            linear_to_srgb=self.linear_to_srgb,
            sampler=None,
            geometry=None,
            cache_shader=cache_shader_results,
            cache_integrator=cache_consistency_integrator_results,
            shader=material_shader_results,
            integrator=material_integrator_results,
        )
        return dict(
            cache_main=cache_outputs,
            main=material_outputs,
            render=material_integrator_results,
        )

    def _handle_slf_variate_pass(self, rng, rays, train_frac, train,
                                 filtered_sampler_results, light_sampler_results,
                                 material_shader_results, material_integrator_results,
                                 **render_kwargs):
        """SLF control variate: re-shade with slf_variate=True and add the
        weighted single-point results (models.py:1914-2001)."""
        if self.config.compute_relight_metrics:
            return
        single = jaxutil.copy_tree(filtered_sampler_results)

        if self.config.use_ground_truth_illumination and self.config.multi_illumination:
            single_light = self._gt_env_light(
                rays, filtered_sampler_results, render_kwargs
            )
        elif self.use_light_sampler:
            key, rng = jaxutil.random_split(rng)
            single_light = self.light_sampler(
                rng=key,
                rays=rays,
                sampler_results=jax.lax.stop_gradient(single),
                train_frac=train_frac,
                train=train,
                **render_kwargs,
            )
        else:
            single_light = None

        key, rng = jaxutil.random_split(rng)
        single_shader = self.shader(
            rng=key,
            rays=rays,
            sampler_results=jax.lax.stop_gradient(single),
            train_frac=train_frac,
            train=train,
            light_sampler_results=jax.lax.stop_gradient(single_light),
            slf_variate=True,
            **render_kwargs,
        )

        for f in single_shader:
            if f.startswith("ref_"):
                material_shader_results[f] = single_shader[f]

        single["weights"] = stopgrad_with_weight(
            single["weights"], self.stopgrad_geometry_variate_weight
        )
        w = single["weights"][..., None]
        for key_out in (
            "diffuse_rgb",
            "specular_rgb",
            "rgb",
            "lighting_irradiance",
            "transient_indirect",
            "transient_indirect_specular",
            "transient_indirect_diffuse",
        ):
            if (
                key_out not in material_integrator_results
                or key_out not in single_shader
                or single_shader[key_out] is None
            ):
                continue
            material_integrator_results[key_out] += (
                single_shader[key_out] * w
            ).reshape(material_integrator_results[key_out].shape)

    # --- finalization -----------------------------------------------------------

    def _get_lossmult(self, final_outputs, rays):
        """Attach the per-ray loss weighting to the rendered output.

        Behavior parity with models.py:2035-2063, including its quirk: the
        reference builds normal/radius threshold masks but wraps each
        comparison in `ones_like`, so the thresholds are dead and the
        material lossmult is constant-true (shaped like the cache geometry's
        last normal channel). The filters that actually gate material
        supervision are the shader-side ones (`material_shader.py`,
        filter_normals_thresh / material_loss_radius applied per sample).
        Without a material head, the ray's own lossmult broadcasts over rgb.
        """
        render = final_outputs["render"]
        if self.use_material:
            geometry = jax.lax.stop_gradient(
                final_outputs["cache_main"]["integrator"]
            )
            normals = geometry["normals_to_use"].reshape(rays.viewdirs.shape)
            render["lossmult"] = jnp.ones(normals[..., -1:].shape, dtype=bool)
        else:
            lossmult = rays.lossmult
            if render["rgb"].ndim == lossmult.ndim + 1:
                lossmult = lossmult[..., None]
            render["lossmult"] = lossmult * jnp.ones_like(render["rgb"])

    def _finalize_outputs(self, outputs, cache_outputs, cache_shader_results, passes,
                          light_sampler_results, bypass_outputs, rays, vignette,
                          **render_kwargs):
        integrator_keys = [
            "rgb", "normals", "normals_pred", "incoming_rgb", "env_map_rgb",
            "incoming_s_dist", "diffuse_rgb", "specular_rgb", "occ", "indirect_occ",
            "direct_rgb", "indirect_rgb", "ambient_rgb", "irradiance_rgb",
            "light_radiance_rgb", "n_dot_l_rgb", "albedo_rgb", "direct_diffuse_rgb",
            "direct_specular_rgb", "indirect_diffuse_rgb", "indirect_specular_rgb",
            "ambient_diffuse_rgb", "ambient_specular_rgb",
        ]
        for key in integrator_keys:
            if key in cache_outputs["integrator"]:
                outputs["render"][f"cache_{key}"] = cache_outputs["integrator"][key]

        shader_keys = integrator_keys[6:] + ["transient_indirect"]
        for key in shader_keys:
            if key in cache_shader_results:
                outputs["main"]["shader"][f"cache_{key}"] = cache_shader_results[key]

        if "material" in passes and self.use_material:
            outputs["render"]["material_rgb"] = outputs["render"]["rgb"]

        outputs["render"]["normals"] = cache_outputs["integrator"].get("normals")
        outputs["render"]["normals_pred"] = cache_outputs["integrator"].get("normals_pred")
        outputs["render"].setdefault(
            "lossmult", jnp.ones_like(outputs["render"]["rgb"][..., :1])
        )
        outputs["render"]["vignette"] = (
            vignette
            if vignette is not None
            else jnp.ones_like(outputs["render"]["rgb"][..., :1])
        )

        if (
            "surface_light_field_vis" in passes
            and bypass_outputs is not None
            and self.use_surface_light_field
        ):
            rgb_shape = outputs["render"]["rgb"].shape
            for key in ("incoming_rgb", "incoming_acc", "incoming_s_dist"):
                if key in bypass_outputs:
                    outputs["render"][f"cache_{key}"] = bypass_outputs[key].reshape(
                        rgb_shape[:-1] + (-1,)
                    )

        outputs["main"]["light_sampler"] = light_sampler_results
        if "light_sampler_vis" in passes and light_sampler_results:
            for k, v in light_sampler_results.items():
                outputs["render"][k] = v

        self._get_lossmult(outputs, rays)
        return outputs


@gin.configurable
class MaterialModel(BaseMaterialModel):
    """Steady-state Flash Cache material model."""


@gin.configurable
class TransientMaterialModel(BaseMaterialModel):
    """InvProp time-resolved material model."""

    def setup(self):
        self.cache = nerf_model.TransientNeRFModel(
            config=self.config,
            use_surface_light_field=self.use_surface_light_field,
            **dict(self.cache_model_params or {}),
            **dict(self.extra_model_params or {}),
            name="Cache",
        )
        if self.use_light_sampler:
            self.light_sampler = light_sampler_lib.LightMLP(
                config=self.config,
                **dict(self.light_sampler_params or {}),
                name="LightSampler",
            )
        self.shader = material_shader.TransientMaterialMLP(
            config=self.config,
            use_surface_light_field=self.use_surface_light_field,
            **dict(self.shader_params or {}),
            name="MaterialShader",
        )
        self.integrator = integrator_lib.TransientVolumeIntegrator(
            config=self.config,
            **dict(self.integrator_params or {}),
            name="MaterialIntegrator",
        )
        if self.use_vignette:
            from neural_radiance_caching_tpu.models.nerf_model import VignetteMap

            self.vignette_map = VignetteMap(config=self.config, name="VignetteMap")
