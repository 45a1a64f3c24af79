"""Stage-dependent extra losses (reference internal/train_utils.py:1305-2800).

Each loss has signature
    fn(model, variables, rng, rays, config, batch, results, full_results,
       train_frac=...) -> scalar
where `results` is the per-output dict (the reference passes
model_results[output_key]: it holds "shader"/"integrator"/"geometry"/
"sampler"/"light_sampler") and `full_results` is the whole model output (for
losses that cross the cache/material boundary).

The `_nocorr` shader keys consumed by the consistency losses are grafted onto
the shader dicts by the train step's gradient-debias second forward pass
(parallel/train.py), mirroring the reference's merged nocorr renderings
(train_utils.py:3404-3547).

Dispatch parity: `compute_extra_losses` mirrors _compute_extra_losses
(train_utils.py:3599-3680) including the consistency / surface-light-field
weight ease-ins.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from neural_radiance_caching_tpu.ops import math, render_utils
from neural_radiance_caching_tpu.parallel import losses as losses_lib
from neural_radiance_caching_tpu.utils import jaxutil


# --- weight ease-ins (train_utils.py:3683-3720) -------------------------------


def _weight_ease(train_frac, use, start, frac, min_val):
    if not use:
        return 1.0
    if frac > 0:
        w = jnp.clip((train_frac - start) / frac, 0.0, 1.0)
        return min_val * (1.0 - w) + w
    return ((train_frac - start) >= 0.0).astype(jnp.float32)


def consistency_weight_ease(config, train_frac):
    return _weight_ease(
        train_frac,
        config.use_consistency_weight_ease,
        config.consistency_weight_ease_start,
        config.consistency_weight_ease_frac,
        config.consistency_weight_ease_min,
    )


def surface_light_field_weight_ease(config, train_frac):
    return _weight_ease(
        train_frac,
        config.use_surface_light_field_weight_ease,
        config.surface_light_field_weight_ease_start,
        config.surface_light_field_weight_ease_frac,
        config.surface_light_field_weight_ease_min,
    )


def extra_ray_weight_ease(config, train_frac):
    return _weight_ease(
        train_frac,
        config.use_extra_ray_weight_ease,
        config.extra_ray_weight_ease_start,
        config.extra_ray_weight_ease_frac,
        config.extra_ray_weight_ease_min,
    )


# --- light sampler fitting (train_utils.py:1900-2068) -------------------------


def light_sampling_loss(model, variables, rng, rays, config, batch, results,
                        full_results, **kwargs):
    """Fit the vMF mixture to the shader's secondary-ray radiance samples."""
    del model, variables, batch, full_results
    if not results.get("light_sampler"):
        return 0.0

    ls = results["light_sampler"]
    shader = results["shader"]
    data_loss = 0.0
    multiplier = 1.0
    for suffix in ["_indirect_diffuse", "_indirect_specular"]:
        extra_rays = shader.get(f"ref_rays{suffix}")
        if extra_rays is None:
            multiplier = 2.0
            continue
        ref_samples = jax.tree_util.tree_map(
            jax.lax.stop_gradient, shader[f"ref_samples{suffix}"]
        )
        radiance = ref_samples["radiance_in"]
        if config.use_transient:
            # Time-binned radiance: fit the mixture to the time-integral.
            radiance = radiance.reshape(
                radiance.shape[:2] + (-1, radiance.shape[-1])
            ).sum(axis=-2)
        function_vals = jax.lax.stop_gradient(jnp.linalg.norm(radiance, axis=-1))

        viewdirs = jax.lax.stop_gradient(
            extra_rays.viewdirs.reshape(function_vals.shape + (3,))
        )
        vmf_means = ls["vmf_means"].reshape(-1, ls["vmf_means"].shape[-2], 3)
        vmf_kappas = ls["vmf_kappas"].reshape(-1, ls["vmf_kappas"].shape[-2], 1)
        vmf_logits = ls["vmf_logits"].reshape(-1, ls["vmf_logits"].shape[-2], 1)
        vmf_normals = ls["vmf_normals"].reshape(-1, 3)

        lossmult = rays.lossmult.reshape(-1, 1, 1)
        lossmult = lossmult * jnp.ones_like(
            function_vals.reshape(lossmult.shape[0], -1, 1)
        )
        lossmult = (lossmult / lossmult.shape[-2]).reshape(function_vals.shape)

        ref_samples_flat = jax.tree_util.tree_map(
            lambda x: x.reshape(function_vals.shape + (x.shape[-1],)), ref_samples
        )
        data_loss += render_utils.vmf_loss_fn(
            (vmf_means, vmf_kappas, vmf_logits),
            vmf_normals,
            viewdirs,
            ref_samples_flat,
            function_vals,
            function_vals,
            lossmult,
            linear_to_srgb=config.light_sampling_linear_to_srgb,
        ) / 2.0
    return data_loss * multiplier


# --- secondary-ray proposal supervision (train_utils.py:2273-2353) -------------


def material_ray_sampler_loss(model, variables, rng, rays, config, batch, results,
                              full_results, **kwargs):
    """Interlevel/distortion/normal losses on the secondary-ray sampler."""
    del model, variables, batch, full_results
    shader = results["shader"]
    if "ref_sampler_results_indirect_diffuse" not in shader:
        return 0.0
    ref_sampler_results = shader["ref_sampler_results_indirect_diffuse"]
    ref_rays = shader["ref_rays_indirect_diffuse"]
    if ref_sampler_results is None or ref_rays is None:
        return 0.0

    lossmult = rays.lossmult.reshape(-1, 1, 1)
    lossmult = (
        lossmult
        * jnp.ones_like(ref_rays.viewdirs[..., :1].reshape(lossmult.shape[0], -1, 1))
    ).reshape(ref_rays.viewdirs[..., :1].shape)

    ref_sampler_results = [dict(r) for r in ref_sampler_results]
    for r in ref_sampler_results:
        r["weights"] = r["weights"] * lossmult

    loss = 0.0
    loss += sum(
        losses_lib.compute_interlevel_loss(
            ref_sampler_results, config.interlevel_loss_mults,
            config.interlevel_loss_blurs, config,
        )
    ) * config.material_ray_sampler_interlevel_loss_mult

    if config.distortion_loss_mult > 0:
        loss += (
            losses_lib.compute_distortion_loss(
                ref_sampler_results, config.distortion_loss_mult, config
            )
            * config.material_ray_sampler_normal_loss_mult
            * config.material_ray_sampler_distortion_loss_mult
        )

    if config.orientation_loss_mult > 0:
        loss += (
            losses_lib.orientation_loss(ref_rays, ref_sampler_results[-1], config)
            * config.material_ray_sampler_orientation_loss_mult
        )

    last = ref_sampler_results[-1]
    if config.predicted_normal_loss_mult > 0 and "normals" in last:
        beta = jnp.ones_like(last["normals"][..., :1])
        loss += (
            losses_lib.predicted_normal_loss(
                last, beta, config,
                mult=config.predicted_normal_loss_mult,
                gt="normals_pred", pred="normals",
                stopgrad=config.predicted_normal_loss_stopgrad,
                stopgrad_weight=config.predicted_normal_loss_stopgrad_weight,
            )
            * config.material_ray_sampler_normal_loss_mult
        )
    if config.predicted_normal_reverse_loss_mult > 0 and "normals" in last:
        beta = jnp.ones_like(last["normals"][..., :1])
        loss += (
            losses_lib.predicted_normal_loss(
                last, beta, config,
                mult=config.predicted_normal_reverse_loss_mult,
                gt="normals", pred="normals_pred", stopgrad=True,
            )
            * config.material_ray_sampler_normal_loss_mult
        )
    return jnp.nan_to_num(loss)


# --- smoothness regularizers (train_utils.py:2505-2810) -----------------------

_MATERIAL_SMOOTHNESS_KEYS = (
    "material_albedo",
    "material_roughness",
    "material_F_0",
    "material_metalness",
    "material_diffuseness",
    "material_mirrorness",
)


def _filter_arrays(d):
    return {
        k: v
        for k, v in d.items()
        if isinstance(v, jnp.ndarray) or hasattr(v, "shape")
    }


def material_smoothness_loss(model, variables, rng, rays, config, batch, results,
                             full_results, train_frac=1.0, **kwargs):
    """Penalize material parameter variation at jittered surface points.

    The irradiance-similarity weight downweights pairs across shadow
    boundaries (train_utils.py:2611-2645).
    """
    del batch
    key, rng = jaxutil.random_split(rng)
    shader_results = _filter_arrays(results["shader"])
    shader_results, inds = model.maybe_resample(key, True, shader_results, 1)

    cache_shader = full_results.get("cache_main", {}).get("shader")
    if cache_shader is None:
        return 0.0
    key, rng = jaxutil.random_split(rng)
    cache_shader_results, _ = model.maybe_resample(
        key, True, _filter_arrays(cache_shader), 1, inds=inds
    )

    weights = {
        "material_albedo": config.material_smoothness_weight_albedo,
        "material_roughness": config.material_smoothness_weight_other,
        "material_F_0": config.material_smoothness_weight_other,
        "material_metalness": config.material_smoothness_weight_other,
        "material_diffuseness": config.material_smoothness_weight_other,
        "material_mirrorness": config.material_smoothness_weight_other,
    }

    shader_results = jaxutil.copy_tree(shader_results)
    origins = shader_results["means"]
    key, rng = jaxutil.random_split(rng)
    noise = jax.random.normal(key, shape=origins.shape)
    shader_results["means"] = origins + noise * config.material_smoothness_noise

    key, rng = jaxutil.random_split(rng)
    perturbed = model.apply(
        variables,
        key,
        rays,
        train_frac=train_frac,
        train=True,
        compute_extras=False,
        passes=("material_cache_shader",),
        sampler_results=jax.lax.stop_gradient(shader_results),
    )
    perturbed = jax.tree_util.tree_map(jnp.nan_to_num, perturbed)
    perturbed_cache = perturbed["cache"]
    perturbed_mat = perturbed["material"]

    lossmult = rays.lossmult.reshape(-1, 1, 1)
    lossmult = (
        lossmult
        * jnp.ones_like(
            shader_results["means"][..., :1].reshape(lossmult.shape[0], -1, 1)
        )
    ).reshape(shader_results["means"][..., :1].shape) * jax.lax.stop_gradient(
        shader_results["weights"][..., None] * shader_results["weights"].shape[-1]
    )

    nc = config.num_rgb_channels
    if "irradiance_cache" in shader_results:
        irr = jax.lax.stop_gradient(shader_results["irradiance_cache"])
        irr_p = jax.lax.stop_gradient(perturbed_mat["irradiance_cache"]).reshape(
            irr.shape
        )
    else:
        irr = jnp.ones_like(shader_results["means"][..., :nc])
        irr_p = irr

    cache_rgb_key = "rgb" if "rgb" in cache_shader_results else "direct_rgb"
    cache_rgb = jax.lax.stop_gradient(
        jnp.abs(cache_shader_results[cache_rgb_key]).reshape(
            irr.shape[:-1] + (-1,)
        )[..., :nc]
    ) / (jnp.maximum(irr, 0.0) + 1e-5)
    perturbed_rgb = jax.lax.stop_gradient(
        jnp.abs(perturbed_cache[cache_rgb_key]).reshape(cache_rgb.shape)
    ) / (jnp.maximum(irr_p, 0.0) + 1e-5)

    irradiance_weight = 2.0 * jax.nn.sigmoid(
        -jnp.sum(
            jnp.abs(cache_rgb - perturbed_rgb)
            / (jnp.maximum(cache_rgb, perturbed_rgb) + 1e-5),
            axis=-1,
            keepdims=True,
        )
        * config.material_smoothness_irradiance_multiplier
    )

    loss = 0.0
    for k in _MATERIAL_SMOOTHNESS_KEYS:
        if k not in shader_results or k not in perturbed_mat:
            continue
        diff = shader_results[k] - perturbed_mat[k].reshape(shader_results[k].shape)
        if "albedo" in k and config.material_smoothness_tensoir_albedo:
            denom = jnp.maximum(
                shader_results[k], perturbed_mat[k].reshape(shader_results[k].shape)
            )
            if config.material_smoothness_albedo_stopgrad:
                denom = jax.lax.stop_gradient(denom)
            diff = diff / jnp.maximum(1e-6, denom)
        if config.material_smoothness_irradiance_weight:
            w = irradiance_weight + config.material_smoothness_base
        else:
            w = jnp.ones_like(irradiance_weight)
        penalty = jnp.abs(diff) if config.material_smoothness_l1_loss else jnp.square(diff)
        loss += (
            penalty
            * w
            * lossmult.reshape(shader_results[k].shape[:-1] + (-1,))
            * weights[k]
        ).mean()
    return loss


def geometry_smoothness_loss(model, variables, rng, rays, config, batch, results,
                             full_results, train_frac=1.0, **kwargs):
    """Penalize normals/density variation at jittered points
    (train_utils.py:2703-2810)."""
    del batch, full_results
    geometry = results.get("geometry")
    if geometry is None:
        return 0.0
    weights = {
        "normals": config.geometry_smoothness_weight_normals,
        "normals_pred": config.geometry_smoothness_weight_normals_pred,
        "density": config.geometry_smoothness_weight_density,
    }
    geometry = jaxutil.copy_tree(_filter_arrays(geometry))
    origins = geometry["means"]
    key, rng = jaxutil.random_split(rng)
    noise = jax.random.normal(key, shape=origins.shape)
    geometry["means"] = origins + noise * config.geometry_smoothness_noise

    key, rng = jaxutil.random_split(rng)
    perturbed = model.apply(
        variables,
        key,
        rays,
        train_frac=train_frac,
        train=True,
        compute_extras=False,
        passes=("geometry",),
        sampler_results=jax.lax.stop_gradient(geometry),
    )
    perturbed = jax.tree_util.tree_map(jnp.nan_to_num, perturbed)

    lossmult = rays.lossmult.reshape(-1, 1, 1)
    lossmult = (
        lossmult
        * jnp.ones_like(geometry["means"][..., :1].reshape(lossmult.shape[0], -1, 1))
    ).reshape(geometry["means"][..., :1].shape) * jax.lax.stop_gradient(
        geometry["weights"][..., None] * geometry["weights"].shape[-1]
    )

    loss = 0.0
    for k, w in weights.items():
        if k not in geometry or k not in perturbed:
            continue
        diff = jnp.abs(geometry[k] - perturbed[k].reshape(geometry[k].shape))
        if k == "density":
            loss += (diff * w * lossmult.reshape(geometry[k].shape)).mean()
        else:
            loss += (diff * w * lossmult.reshape(geometry[k].shape[:-1] + (1,))).mean()
    return loss


# --- cache/material consistency (train_utils.py:1620-1900) --------------------


def _consistency_data_loss(config, batch, rays, rgb, rgb_nocorr, rgb_cache,
                           rgb_cache_nocorr, lossmult, transient=False,
                           denom_rgb=None):
    rgb = jaxutil.stopgrad_with_weight(
        rgb, config.cache_consistency_stopgrad_weight_material
    )
    rgb_nocorr = jaxutil.stopgrad_with_weight(
        rgb_nocorr, config.cache_consistency_stopgrad_weight_material
    )
    rgb_cache = jaxutil.stopgrad_with_weight(
        rgb_cache, config.cache_consistency_stopgrad_weight_cache
    )
    rgb_cache_nocorr = jaxutil.stopgrad_with_weight(
        rgb_cache_nocorr, config.cache_consistency_stopgrad_weight_cache
    )

    cur_results = {
        "rgb": jnp.nan_to_num(rgb),
        "rgb_nocorr": jax.lax.stop_gradient(jnp.nan_to_num(rgb_nocorr)),
        "cache_rgb": jax.lax.stop_gradient(
            jnp.nan_to_num(denom_rgb if denom_rgb is not None else rgb_cache)
        ),
    }
    if not config.cache_consistency_use_integrated:
        cur_results["gt_nocorr"] = jax.lax.stop_gradient(jnp.nan_to_num(rgb_cache_nocorr))

    masks = batch.masks
    if masks is None:
        masks = jnp.ones_like(rays.lossmult)
    shape = rgb.shape[:-2] + (-1, 1) if transient else rgb.shape[:-1] + (1,)
    cur_batch = batch.replace(
        rgb=jnp.nan_to_num(rgb_cache),
        masks=jnp.broadcast_to(masks.reshape(masks.shape[0], *([1] * (len(shape) - 2)), 1), shape)
        if not transient
        else masks.reshape(masks.shape[0], 1),
    )
    cur_rays = rays.replace(lossmult=lossmult)
    cur_config = dataclasses.replace(
        config,
        data_loss_type=config.cache_consistency_loss_type,
        is_material=True,
    )
    if transient and not config.cache_consistency_use_gauss:
        cur_config = dataclasses.replace(cur_config, data_loss_gauss_mult=0.0)
    return losses_lib.compute_data_loss(
        cur_batch, cur_results, cur_rays, cur_config, transient=transient
    )[0]


def direct_indirect_consistency_loss(model, variables, rng, rays, config, batch,
                                     results, full_results, **kwargs):
    """Per-sample cache-vs-material agreement of direct/indirect components."""
    del model, variables, full_results
    shader = results["shader"]

    prefixes = ["diffuse_rgb", "specular_rgb", "direct_rgb", "indirect_rgb"]
    loss = 0.0
    for prefix in prefixes:
        if prefix not in shader or f"cache_{prefix}" not in shader:
            continue
        rgb = shader[prefix]
        if not hasattr(rgb, "ndim") or rgb.ndim < 2:
            # Disabled component (e.g. direct under passive lighting) is a
            # scalar zero; nothing to distill.
            continue
        rgb_nocorr = shader.get(f"{prefix}_nocorr", rgb)
        rgb_cache = shader[f"cache_{prefix}"].reshape(rgb.shape)
        # The nocorr cache target is the nocorr pass's consistency shader
        # (mirrored as cache_* on the material shader dict).
        rgb_cache_nocorr = shader.get(f"cache_{prefix}_nocorr", rgb_cache).reshape(
            rgb.shape
        )
        lossmult = rays.lossmult.reshape(
            rgb.shape[:1] + (1,) * (rgb.ndim - 1)
        ) * jnp.ones_like(rgb[..., :1])
        cur = _consistency_data_loss(
            config, batch, rays, rgb, rgb_nocorr, rgb_cache, rgb_cache_nocorr,
            lossmult,
        )
        if "indirect" in prefix:
            cur = cur * config.cache_consistency_indirect_weight
        elif "direct" in prefix:
            cur = cur * config.cache_consistency_direct_weight
        loss += cur
    return loss


def transient_direct_indirect_consistency_loss(model, variables, rng, rays, config,
                                               batch, results, full_results,
                                               **kwargs):
    """Transient variant: direct pulse + time-binned indirect
    (train_utils.py:1733-1900)."""
    del model, variables, full_results
    shader = results["shader"]

    loss = 0.0
    for prefix, transient in (("direct_rgb", False), ("transient_indirect", True)):
        if prefix not in shader or f"cache_{prefix}" not in shader:
            continue
        rgb = shader[prefix]
        if not hasattr(rgb, "ndim") or rgb.ndim < 2:
            continue
        rgb_nocorr = shader.get(f"{prefix}_nocorr", rgb)
        rgb_cache = shader[f"cache_{prefix}"].reshape(rgb.shape)
        rgb_cache_nocorr = shader.get(f"cache_{prefix}_nocorr", rgb_cache).reshape(
            rgb.shape
        )
        if transient:
            lossmult = rays.lossmult.reshape(
                rgb.shape[:1] + (1,) * (rgb.ndim - 2)
            ) * jnp.ones_like(rgb[..., 0, :1])
        else:
            lossmult = rays.lossmult.reshape(
                rgb.shape[:1] + (1,) * (rgb.ndim - 1)
            ) * jnp.ones_like(rgb[..., :1])
        cur = _consistency_data_loss(
            config, batch, rays, rgb, rgb_nocorr, rgb_cache, rgb_cache_nocorr,
            lossmult, transient=transient,
        )
        if "indirect" in prefix:
            cur = cur * config.cache_consistency_indirect_weight
        else:
            cur = cur * config.cache_consistency_direct_weight
        loss += cur
    return loss


# --- surface light field distillation (train_utils.py:2070-2270) --------------


def material_surface_light_field_loss(model, variables, rng, rays, config, batch,
                                      results, full_results, **kwargs):
    """Distill the radiance cache into the SLF along shared secondary rays."""
    del model, variables, full_results
    shader = results["shader"]
    data_loss = 0.0
    multiplier = 1.0
    for suffix in ["_indirect_diffuse", "_indirect_specular"]:
        extra_rays = shader.get(f"ref_rays{suffix}_cache")
        if extra_rays is None:
            multiplier = 2.0
            continue
        ref_samples = shader[f"ref_samples{suffix}_cache"]
        ref_samples_slf = shader[f"ref_samples{suffix}_slf"]
        ref_sampler = shader[f"ref_sampler_results{suffix}_cache"][-1]
        ref_sampler_slf = shader[f"ref_sampler_results{suffix}_slf"][-1]

        sh = ref_samples["radiance_in_no_stopgrad"].shape
        cache_rgb = jaxutil.stopgrad_with_weight(
            ref_samples["radiance_in_no_stopgrad"],
            config.surface_light_field_stopgrad_weight_forward,
        )
        pred_rgb = jaxutil.stopgrad_with_weight(
            ref_samples_slf["radiance_in_no_stopgrad"].reshape(sh),
            config.surface_light_field_stopgrad_weight_backward,
        )
        if config.use_transient:
            cache_rgb = cache_rgb.reshape(sh[:2] + (-1, sh[-1])).sum(axis=-2)
            pred_rgb = pred_rgb.reshape(cache_rgb.shape)
            sh = cache_rgb.shape
        pred_outputs = {"rgb": pred_rgb, "cache_rgb": cache_rgb}

        cache_weights = ref_sampler["weights"].reshape(sh[:-1] + (-1,))
        acc = cache_weights.sum(axis=-1, keepdims=True)
        if config.surface_light_field_loss_far == float("inf"):
            acc = jnp.ones_like(acc)

        if config.surface_light_field_loss_radius < float("inf"):
            lossmult = (
                jnp.linalg.norm(extra_rays.origins, axis=-1, keepdims=True)
                < config.surface_light_field_loss_radius
            ).reshape(sh[:-1] + (1,)).astype(jnp.float32)
        else:
            lossmult = jnp.ones_like(cache_rgb[..., :1])

        if config.surface_light_field_is_secondary:
            lossmult = jnp.where(
                ref_samples["local_lightdirs"][..., -1].reshape(lossmult.shape) > 0.0,
                lossmult,
                jnp.zeros_like(lossmult),
            )

        extra_rays = jax.tree_util.tree_map(jax.lax.stop_gradient, extra_rays)
        masks = jnp.ones_like(cache_rgb[..., :1])
        extra_batch = batch.replace(rgb=cache_rgb, masks=masks)
        extra_rays = extra_rays.replace(
            lossmult=jax.lax.stop_gradient(lossmult)
        )

        cur_config = dataclasses.replace(
            config,
            data_loss_type=config.surface_light_field_loss_type,
            convert_srgb=config.surface_light_field_linear_to_srgb,
            loss_clip=float("inf"),
            loss_thresh=float("inf"),
        )
        cur_loss = losses_lib.compute_data_loss(
            extra_batch, pred_outputs, extra_rays, cur_config
        )[0]

        # Opacity agreement: SLF-predicted acc within env distance vs cache.
        if "incoming_weights" in ref_sampler_slf:
            pred_dist = ref_sampler_slf["incoming_dist"].reshape(sh[:-1] + (-1,))
            pred_weights = ref_sampler_slf["incoming_weights"].reshape(sh[:-1] + (-1,))
            pred_env_acc = (
                jnp.where(pred_dist < config.env_map_distance, pred_weights, 0.0)
                .sum(axis=-1)
                .reshape(sh[:-1] + (1,))
            )
            cache_tdist = ref_sampler["tdist"][..., :-1].reshape(sh[:-1] + (-1,))
            env_acc = (
                jnp.where(cache_tdist < config.env_map_distance, cache_weights, 0.0)
                .sum(axis=-1)
                .reshape(sh[:-1] + (1,))
            )
            acc_loss = jnp.square(
                jax.lax.stop_gradient(env_acc) - pred_env_acc
            ) * jax.lax.stop_gradient(lossmult)
            acc_loss = jnp.where(
                env_acc > 0.5,
                acc_loss * config.surface_light_field_loss_acc_scale_opaque,
                acc_loss * config.surface_light_field_loss_acc_scale_empty,
            )
            cur_loss += acc_loss.mean()

            # Depth distillation.
            if config.surface_light_field_loss_depth_scale > 0 and (
                "incoming_s_dist" in ref_sampler_slf
            ):
                pred_sdist = ref_sampler_slf["incoming_s_dist"].reshape(
                    sh[:-1] + (1,)
                )
                cache_sdist = ref_sampler.get("sdist")
                if cache_sdist is not None:
                    cache_sdist = cache_sdist[..., :-1].reshape(sh[:-1] + (-1,))
                    cur_loss += (
                        jnp.abs(jax.lax.stop_gradient(cache_sdist) - pred_sdist)
                        * jax.lax.stop_gradient(cache_weights)
                        * jax.lax.stop_gradient(lossmult)
                    ).sum(axis=-1).mean() * config.surface_light_field_loss_depth_scale

        data_loss += cur_loss / 2.0
    return data_loss * multiplier


# --- emission regularizers (train_utils.py:1493-1617) -------------------------


def emission_loss(model, variables, rng, rays, config, batch, results,
                  full_results, **kwargs):
    del model, variables, batch, full_results
    shader = results["shader"]
    if "lighting_emission" not in shader:
        return 0.0
    emission = shader["lighting_emission"]
    cache_rgb = results["integrator"]["cache_rgb"]
    lossmult = rays.lossmult.reshape(emission.shape[:-2] + (-1, 1))
    zero_loss = (
        math.safe_sqrt(emission + 1e-5)
        / math.safe_sqrt(cache_rgb.reshape(emission.shape[:-2] + (-1, 3)) + 1e-3)
    ) * config.emission_zero_loss_mult * lossmult
    diff_loss = (
        jnp.square(emission - jax.lax.stop_gradient(emission))
        * config.emission_constant_loss_mult
        * lossmult
    )
    if results.get("geometry") is not None:
        weights = jax.lax.stop_gradient(results["geometry"]["weights"])[..., None]
    else:
        weights = jnp.ones_like(zero_loss)
    return (zero_loss * weights).sum(axis=-2).mean() + (
        diff_loss * weights
    ).sum(axis=-2).mean()


def residual_albedo_loss(model, variables, rng, rays, config, batch, results,
                         full_results, **kwargs):
    del model, variables, batch, full_results
    shader = results["shader"]
    if "lighting_emission" not in shader or "material_residual_albedo" not in shader:
        return 0.0
    emission = shader["lighting_emission"]
    irradiance = shader["lighting_irradiance"]
    irradiance_nocorr = shader.get("lighting_irradiance_nocorr", irradiance)
    residual_albedo = shader["material_residual_albedo"]
    material_results = {
        "rgb": residual_albedo * jax.lax.stop_gradient(irradiance),
        "rgb_nocorr": residual_albedo * jax.lax.stop_gradient(irradiance_nocorr),
        "cache_rgb": jax.lax.stop_gradient(emission),
    }
    lossmult = rays.lossmult.reshape(emission.shape[:-2] + (-1, 1))
    gt = jax.lax.stop_gradient(emission)
    if "rawnerf" in config.data_loss_type:
        diff = losses_lib.compute_unbiased_loss_rawnerf(
            material_results, gt, gt, config
        ) * lossmult
    else:
        diff = losses_lib.compute_unbiased_loss(material_results, gt, gt, config) * lossmult
    if results.get("geometry") is not None:
        weights = jax.lax.stop_gradient(results["geometry"]["weights"])[..., None]
    else:
        weights = jnp.ones_like(diff)
    return (diff * weights).sum(axis=-2).mean()


# --- radiance bounds / weight tethers (train_utils.py:1422-1491) ---------------


def maximum_radiance_loss(model, variables, rng, rays, config, batch, results,
                          full_results, **kwargs):
    """Penalize per-sample shader radiance exceeding the GT pixel color.

    Squared hinge on relu(rgb_sample - rgb_gt); keeps the cache from inventing
    radiance brighter than any observation (train_utils.py:1422-1453).
    """
    del model, variables, rng, rays, full_results
    shader = results.get("shader") or {}
    if "rgb" not in shader or batch.rgb is None:
        return 0.0
    excess = jnp.maximum(shader["rgb"] - batch.rgb[..., None, :3], 0.0)
    return jnp.square(excess).mean()


def normalize_weight_loss(model, variables, rng, rays, config, batch, results,
                          full_results, **kwargs):
    """L1 tether between pre- and post-normalization sample weights.

    Matches train_utils.py:1455-1491. The producer keys are optional (no model
    in the reference emits them either); absent keys yield 0, so enabling the
    loss on a model without weight normalization is a silent no-op rather than
    an error.
    """
    del model, variables, rng, rays, batch, full_results
    geometry = results.get("geometry") or {}
    if (
        config.normalize_weight_loss_weight == 0.0
        or "weights_original" not in geometry
        or "weights_new" not in geometry
    ):
        return 0.0
    diff = jnp.abs(
        geometry["weights_original"]
        - jax.lax.stop_gradient(geometry["weights_new"])
    )
    return diff.mean() * config.normalize_weight_loss_weight


# --- material/irradiance decorrelation (train_utils.py:2354-2503) --------------


def _center_normalize(x, lossmult):
    """Mean-center x under lossmult, then L1-normalize each column.

    The normalizer adds N (the row count) so near-zero columns stay near zero
    instead of blowing up; the result is rescaled by N so the correlation
    statistic is O(1) regardless of batch size.
    """
    n = x.shape[0]
    x = x * lossmult
    x = (x - x.sum(axis=0, keepdims=True) / (lossmult.sum(axis=0, keepdims=True) + 1e-3))
    x = x * lossmult
    return x / (jnp.abs(x).sum(axis=0, keepdims=True) + n) * n


def material_correlation_loss(model, variables, rng, rays, config, batch, results,
                              full_results, **kwargs):
    """Decorrelate material parameters from the irradiance estimate.

    Three terms (train_utils.py:2354-2503): (1) an absolute-correlation
    penalty between each (centered, L1-normalized) material channel and the
    stop-gradded normalized irradiance — shading changes should be explained
    by lighting, not baked into albedo/roughness; (2) a gradient-debiased
    tether pulling `lighting_irradiance` toward the SLF-variate cache estimate
    `irradiance_cache`; (3) a whitening term pulling irradiance toward gray.
    Requires the SLF-variate material pass (which emits `irradiance_cache`);
    returns 0 otherwise.
    """
    del variables, batch, full_results
    shader = results.get("shader") or {}
    if "lighting_irradiance" not in shader or "irradiance_cache" not in shader:
        return 0.0

    key, rng = jaxutil.random_split(rng)
    shader_results, _ = model.maybe_resample(key, True, _filter_arrays(shader), 1)

    n_rays = rays.lossmult.reshape(-1, 1).shape[0]
    irradiance = shader_results["lighting_irradiance"].reshape(-1, 3)
    irradiance_nocorr = shader_results.get(
        "lighting_irradiance_nocorr", shader_results["lighting_irradiance"]
    ).reshape(-1, 3)
    irradiance_cache = shader_results["irradiance_cache"].reshape(-1, 3)

    # Per-point lossmult: per-ray mask spread over the resampled points,
    # weighted by the (stop-gradded) volume-rendering weight of each point.
    weights = shader_results["weights"]
    lossmult = rays.lossmult.reshape(-1, 1, 1)
    lossmult = (
        lossmult
        * jnp.ones_like(
            shader_results["lighting_irradiance"][..., :1].reshape(n_rays, -1, 1)
        )
    ).reshape(-1, 1)
    lossmult = lossmult * jax.lax.stop_gradient(
        weights.reshape(-1, 1) * weights.shape[-1]
    )

    irradiance_target = jax.lax.stop_gradient(
        _center_normalize(irradiance, lossmult)
    )

    material_weights = {
        "material_albedo": config.material_correlation_weight_albedo,
        "material_roughness": config.material_correlation_weight_other,
        "material_F_0": config.material_correlation_weight_other,
        "material_metalness": config.material_correlation_weight_other,
        "material_diffuseness": config.material_correlation_weight_other,
        "material_mirrorness": config.material_correlation_weight_other,
    }
    loss = 0.0
    for mat_key, mat_weight in material_weights.items():
        if mat_key not in shader_results:
            continue
        channel = _center_normalize(
            shader_results[mat_key].reshape(irradiance_target.shape[0], -1), lossmult
        )
        loss += jnp.abs((channel * irradiance_target).mean(axis=0)).sum() * mat_weight

    # Irradiance-cache tether (gradient-debiased).
    tether = {
        "rgb": jaxutil.stopgrad_with_weight(
            irradiance, config.irradiance_cache_stopgrad_weight
        ),
        "rgb_nocorr": irradiance_nocorr,
        "cache_rgb": irradiance_cache,
    }
    gt = jaxutil.stopgrad_with_weight(
        irradiance_cache, config.irradiance_cache_stopgrad_weight_backwards
    )
    if "rawnerf" in config.data_loss_type:
        diff = losses_lib.compute_unbiased_loss_rawnerf(
            tether, gt, irradiance_cache, config
        ) * lossmult
    else:
        diff = losses_lib.compute_unbiased_loss(
            tether, gt, irradiance_cache, config
        ) * lossmult
    loss += diff.mean() * config.irradiance_cache_loss_weight

    # Whitening: pull irradiance toward its own gray level.
    loss += (
        losses_lib.compute_unbiased_loss(
            {"rgb": irradiance, "rgb_nocorr": irradiance_nocorr},
            jax.lax.stop_gradient(irradiance.mean(axis=-1, keepdims=True)),
            jax.lax.stop_gradient(irradiance_nocorr.mean(axis=-1, keepdims=True)),
            config,
        )
        * lossmult
    ).mean() * config.whitening_loss_weight

    return loss


# --- extra-ray regularizer (train_utils.py:1305-1421) --------------------------


def extra_ray_loss(model, variables, rng, rays, config, batch, results,
                   full_results, train_frac=1.0, **kwargs):
    """Consistency between material and cache renders along fresh random
    outgoing rays (a view-extrapolation regularizer for active captures)."""
    shader = results["shader"]
    normals = shader.get(config.material_normals_target)
    if normals is None or not hasattr(normals, "ndim"):
        return 0.0

    key, rng = jaxutil.random_split(rng)
    extra_rays = render_utils.get_outgoing_rays(
        key,
        rays,
        jax.lax.stop_gradient(rays.viewdirs),
        jax.lax.stop_gradient(normals[..., :1, :]),
        {},
        random_generator_2d=model.random_generator_2d,
        use_mis=False,
        samplers=model.uniform_importance_samplers,
        num_secondary_samples=1,
    )

    key, rng = jaxutil.random_split(rng)
    extra_results = model.apply(
        variables, key, extra_rays, train_frac=train_frac, train=True,
        compute_extras=False,
    )
    key, rng = jaxutil.random_split(rng)
    extra_nocorr = model.apply(
        variables, key, extra_rays, train_frac=train_frac, train=True,
        compute_extras=False,
        cache_outputs={"sampler": extra_results["cache_main"]["sampler"]},
        filtered_sampler_inds=extra_results["cache_main"]["filtered_sampler_inds"],
    )

    rgb_gt = jaxutil.stopgrad_with_weight(
        extra_results["render"]["cache_rgb"],
        config.extra_ray_loss_stopgrad_weight_gt,
    )
    rgb_gt_nocorr = jaxutil.stopgrad_with_weight(
        extra_nocorr["render"]["cache_rgb"],
        config.extra_ray_loss_stopgrad_weight_gt,
    )
    rgb = jaxutil.stopgrad_with_weight(
        extra_results["render"]["rgb"].reshape(rgb_gt.shape),
        config.extra_ray_loss_stopgrad_weight_pred,
    )
    rgb_nocorr = jaxutil.stopgrad_with_weight(
        extra_nocorr["render"]["rgb"].reshape(rgb_gt.shape),
        config.extra_ray_loss_stopgrad_weight_pred,
    )
    pred_outputs = {"rgb": rgb, "rgb_nocorr": rgb_nocorr, "cache_rgb": rgb_gt}
    if "rawnerf" in config.data_loss_type:
        return losses_lib.compute_unbiased_loss_rawnerf(
            pred_outputs, rgb_gt, rgb_gt_nocorr, config
        ).mean()
    return losses_lib.compute_unbiased_loss(
        pred_outputs, rgb_gt, rgb_gt_nocorr, config
    ).mean()


# --- dispatch (train_utils.py:3599-3680) ---------------------------------------

EXTRA_LOSS_FUNCTIONS = {
    "emission": emission_loss,
    "residual_albedo": residual_albedo_loss,
    "direct_indirect_consistency": None,  # resolved per-config below
    "light_sampling": light_sampling_loss,
    "material_surface_light_field": material_surface_light_field_loss,
    "material_smoothness": material_smoothness_loss,
    "geometry_smoothness": geometry_smoothness_loss,
    "material_ray_sampler": material_ray_sampler_loss,
    "material_correlation": material_correlation_loss,
    "maximum_radiance": maximum_radiance_loss,
    "normalize_weight": normalize_weight_loss,
}


def compute_extra_losses(model, variables, rng, rays, config, batch, full_results,
                         output_key, losses, train_frac):
    """Evaluate every configured extra loss for one output ('main'/'cache_main')."""
    results = full_results.get(output_key)
    if results is None:
        return losses

    for loss_name, spec in (config.extra_losses or {}).items():
        if output_key not in spec:
            continue
        if loss_name == "direct_indirect_consistency":
            fn = (
                transient_direct_indirect_consistency_loss
                if config.use_transient
                else direct_indirect_consistency_loss
            )
            mult = spec[output_key]["mult"] * consistency_weight_ease(config, train_frac)
        elif loss_name in ("surface_light_field", "material_surface_light_field"):
            fn = material_surface_light_field_loss
            mult = spec[output_key]["mult"] * surface_light_field_weight_ease(
                config, train_frac
            )
        elif loss_name in EXTRA_LOSS_FUNCTIONS:
            fn = EXTRA_LOSS_FUNCTIONS[loss_name]
            mult = spec[output_key]["mult"]
        else:
            continue
        key, rng = jaxutil.random_split(rng)
        cur = fn(
            model, variables, key, rays, config, batch, results, full_results,
            train_frac=train_frac,
        )
        prefix = "" if output_key == "main" else output_key.replace("main", "")
        losses[prefix + loss_name] = mult * cur

    # Weight-gated losses: active whenever their Config multiplier is set,
    # even without an explicit extra_losses entry (the reference leaves these
    # dispatchable-but-unbound; binding them to their Config weights makes the
    # knobs real knobs).
    spec_names = set((config.extra_losses or {}).keys())
    if output_key == "main":
        if (
            "maximum_radiance" not in spec_names
            and config.maximum_radiance_loss_weight > 0.0
        ):
            key, rng = jaxutil.random_split(rng)
            losses["maximum_radiance"] = (
                config.maximum_radiance_loss_weight
                * maximum_radiance_loss(
                    model, variables, key, rays, config, batch, results,
                    full_results, train_frac=train_frac,
                )
            )
        if (
            "material_correlation" not in spec_names
            and config.is_material
            and (
                config.material_correlation_weight_albedo > 0.0
                or config.material_correlation_weight_other > 0.0
            )
        ):
            key, rng = jaxutil.random_split(rng)
            losses["material_correlation"] = material_correlation_loss(
                model, variables, key, rays, config, batch, results,
                full_results, train_frac=train_frac,
            )
    if (
        "normalize_weight" not in spec_names
        and config.normalize_weight_loss_weight > 0.0
    ):
        key, rng = jaxutil.random_split(rng)
        nw = normalize_weight_loss(
            model, variables, key, rays, config, batch, results,
            full_results, train_frac=train_frac,
        )
        prefix = "" if output_key == "main" else output_key.replace("main", "")
        losses[prefix + "normalize_weight"] = nw

    # Extra-ray regularizer (train_utils.py:3662-3680): only on the material
    # output.
    if (
        output_key == "main"
        and config.extra_ray_loss_mult > 0.0
        and config.is_material
    ):
        key, rng = jaxutil.random_split(rng)
        losses["extra_ray"] = (
            config.extra_ray_loss_mult
            * extra_ray_weight_ease(config, train_frac)
            * extra_ray_loss(
                model, variables, key, rays, config, batch, results,
                full_results, train_frac=train_frac,
            )
        )
    return losses
