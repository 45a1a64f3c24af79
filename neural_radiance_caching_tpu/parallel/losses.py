"""Loss library: data losses, unbiased estimators, geometry regularizers.

Behavioral parity targets: reference internal/train_utils.py:108-1273 and
internal/loss_utils.py. The gradient-debias machinery ("unbiased" losses,
`2·(x−gt)·sg(x_nocorr−gt_nocorr)`) expects the model to have produced a
second independent forward pass stored under `rgb_nocorr`/`gt_nocorr`.
"""

from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.ops import image, math, ref_utils, render_utils, stepfun
from neural_radiance_caching_tpu.utils import jaxutil


# --- schedules ----------------------------------------------------------------


def compute_weight_ease_in(train_frac, use_weight_schedule, start_frac, transition_frac,
                           min_value=0.0):
    """Linearly ease a weight in from min_value to 1 over training."""
    if not use_weight_schedule:
        return 1.0
    if transition_frac > 0:
        w = jnp.clip((train_frac - start_frac) / transition_frac, 0.0, 1.0)
        return min_value * (1.0 - w) + w
    return jnp.float32(train_frac >= start_frac)


def compute_weight_decay(train_frac, use_weight_schedule, start_frac, transition_frac,
                         min_value=0.0):
    if not use_weight_schedule:
        return 1.0
    w = jnp.clip((train_frac - start_frac) / transition_frac, 0.0, 1.0)
    return min_value * w + (1.0 - w)


# --- unbiased / rawnerf primitives ---------------------------------------------


def _rgb_clip_for_rawnerf(rendering, gt, config, clip_val):
    if config.use_gt_rawnerf:
        rgb_clip = jnp.clip(gt, 0.0, clip_val)
    else:
        key = "cache_rgb" if "cache_rgb" in rendering else "rgb"
        rgb_clip = jnp.clip(rendering[key], 0.0, clip_val)
        if config.use_combined_rawnerf:
            rgb_clip = jnp.clip(jnp.maximum(rgb_clip, gt), 0.0, clip_val)
    if config.use_norm_rawnerf:
        rgb_clip = jnp.linalg.norm(rgb_clip, axis=-1, keepdims=True)
    return rgb_clip


def compute_unbiased_loss(rendering, gt, gt_nocorr, config):
    """Gradient-debiased squared error: 2·(x−gt)·sg(x'−gt')."""
    del config
    diff = rendering["rgb"] - gt
    diff_nocorr = rendering["rgb_nocorr"] - gt_nocorr
    return 2 * diff * jax.lax.stop_gradient(diff_nocorr)


def compute_unbiased_loss_itof(rendering, gt, gt_nocorr, config):
    diff = render_utils.dtof_to_itof(
        rendering["rgb"] - gt, config.itof_frequency_phase_shifts, config.exposure_time
    )
    diff_nocorr = render_utils.dtof_to_itof(
        rendering["rgb_nocorr"] - gt_nocorr,
        config.itof_frequency_phase_shifts,
        config.exposure_time,
    )
    return 2 * diff * jax.lax.stop_gradient(diff_nocorr)


def compute_unbiased_loss_transient_gauss(rendering, gt, gt_nocorr, config):
    diff = render_utils.dtof_to_gauss(
        rendering["rgb"] - gt,
        config.transient_gauss_sigma_scales,
        config.transient_gauss_constant_scale,
    )
    diff_nocorr = render_utils.dtof_to_gauss(
        rendering["rgb_nocorr"] - gt_nocorr,
        config.transient_gauss_sigma_scales,
        config.transient_gauss_constant_scale,
    )
    return 2 * diff * jax.lax.stop_gradient(diff_nocorr)


def _rawnerf_scaling(rendering, gt, config, clip_val, exponent, eps, transient):
    rgb_clip = _rgb_clip_for_rawnerf(rendering, gt, config, clip_val)
    if transient:
        rgb_clip = rgb_clip.sum(-2)[..., None, :]
    return 1.0 / (jnp.power(jax.lax.stop_gradient(rgb_clip), exponent) + eps)


def compute_loss_rawnerf(rendering, gt, config, clip_val=10000.0, exponent=1.0, eps=1e-3,
                         transient=False):
    scale = _rawnerf_scaling(rendering, gt, config, clip_val, exponent, eps, transient)
    return ((rendering["rgb"] - gt) ** 2) * scale


def compute_unbiased_loss_rawnerf(rendering, gt, gt_nocorr, config, clip_val=10000.0,
                                  exponent=1.0, eps=1e-3, transient=False):
    scale = _rawnerf_scaling(rendering, gt, config, clip_val, exponent, eps, transient)
    return compute_unbiased_loss(rendering, gt, gt_nocorr, config) * scale


def compute_loss_charb(rendering, gt, config):
    return jnp.sqrt((rendering["rgb"] - gt) ** 2 + config.charb_padding**2)


def select_data_loss_fn(config, rendering, gt, gt_nocorr, rawnerf_eps, rawnerf_exponent,
                        transient=False):
    """Dispatch on config.data_loss_type (train_utils.py:643-756)."""
    t = config.data_loss_type
    if t == "mse":
        return (rendering["rgb"] - gt) ** 2
    if t == "mse_unbiased":
        return compute_unbiased_loss(rendering, gt, gt_nocorr, config)
    if t == "mse_itof":
        return (
            render_utils.dtof_to_itof(
                rendering["rgb"] - gt, config.itof_frequency_phase_shifts, config.exposure_time
            )
            ** 2
        )
    if t == "mse_itof_unbiased":
        return compute_unbiased_loss_itof(rendering, gt, gt_nocorr, config)
    if t == "mse_fwp":
        return ((rendering["rgb"] + 1e-5) ** 0.5 - (gt + 1e-5) ** 0.5) ** 2
    if t == "rawnerf":
        return compute_loss_rawnerf(
            rendering, gt, config, eps=rawnerf_eps, exponent=rawnerf_exponent
        )
    if t == "rawnerf_unbiased":
        return compute_unbiased_loss_rawnerf(
            rendering, gt, gt_nocorr, config, eps=rawnerf_eps, exponent=rawnerf_exponent
        )
    if t == "rawnerf_transient":
        loss = compute_loss_rawnerf(
            rendering, gt, config, eps=rawnerf_eps, exponent=rawnerf_exponent,
            transient=transient,
        )
        if transient and config.transient_gauss_sigma_scales:
            scale = _rawnerf_scaling(
                rendering, gt, config, 10000.0, rawnerf_exponent, rawnerf_eps, True
            )
            gauss = (
                render_utils.dtof_to_gauss(
                    rendering["rgb"] - gt,
                    config.transient_gauss_sigma_scales,
                    config.transient_gauss_constant_scale,
                )
                ** 2
                * scale
                * config.data_loss_gauss_mult
                / loss.shape[-2]
            )
            loss = loss + gauss.sum(axis=-2, keepdims=True)
        return loss
    if t == "rawnerf_transient_unbiased":
        loss = compute_unbiased_loss_rawnerf(
            rendering, gt, gt_nocorr, config, eps=rawnerf_eps, exponent=rawnerf_exponent,
            transient=transient,
        )
        if transient and config.transient_gauss_sigma_scales:
            scale = _rawnerf_scaling(
                rendering, gt, config, 10000.0, rawnerf_exponent, rawnerf_eps, True
            )
            gauss = (
                compute_unbiased_loss_transient_gauss(rendering, gt, gt_nocorr, config)
                * scale
                * config.data_loss_gauss_mult
                / loss.shape[-2]
            )
            loss = loss + gauss.sum(axis=-2, keepdims=True)
        return loss
    if t == "rawnerf_transient_itof":
        scale = _rawnerf_scaling(rendering, gt, config, 10000.0, rawnerf_exponent, rawnerf_eps, True)
        return (
            render_utils.dtof_to_itof(
                rendering["rgb"] - gt, config.itof_frequency_phase_shifts, config.exposure_time
            )
            ** 2
            * scale
        )
    if t == "rawnerf_transient_itof_unbiased":
        scale = _rawnerf_scaling(rendering, gt, config, 10000.0, rawnerf_exponent, rawnerf_eps, True)
        return compute_unbiased_loss_itof(rendering, gt, gt_nocorr, config) * scale
    if t == "rawnerf_charb":
        loss = compute_loss_rawnerf(rendering, gt, config, exponent=2.0, eps=rawnerf_eps) ** 2
        return jnp.sqrt(loss + config.charb_padding**2)
    if t == "charb":
        return compute_loss_charb(rendering, gt, config)
    if t == "charb_clip":
        resid_sq = (jnp.minimum(1.0, rendering["rgb"]) - jnp.minimum(1.0, gt)) ** 2
        return jnp.sqrt(resid_sq + config.charb_padding**2)
    raise ValueError(f"Unknown data loss type: {t}")


# --- data loss ------------------------------------------------------------------


def compute_data_loss(batch, rendering, rays, config, main=False, train_frac=1.0,
                      transient=False):
    """RGB data loss + stats (train_utils.py:402-528)."""
    del train_frac
    stats = collections.defaultdict(list)
    # Per-ray lossmult broadcast over the target: transient targets carry an
    # extra time-bin axis the ray fields don't have.
    lm = rays.lossmult
    while lm.ndim < batch.rgb[..., :3].ndim:
        lm = lm[..., None, :]
    lossmult = jnp.broadcast_to(lm, batch.rgb[..., :3].shape)

    if config.convert_srgb:
        rendering = jaxutil.copy_tree(rendering)
        rendering["rgb"] = image.linear_to_srgb(rendering["rgb"])
        batch = batch.replace(rgb=image.linear_to_srgb(batch.rgb[..., :3]))

    if batch.masks is not None:
        masks = batch.masks
        while masks.ndim < lossmult.ndim:
            masks = masks[..., None, :]
    else:
        masks = jnp.ones_like(lossmult)
    if config.mask_lossmult or ("unbiased" in config.data_loss_type):
        lossmult = lossmult * masks
        if "unbiased" not in config.data_loss_type:
            lossmult += lossmult * (1.0 - masks) * config.mask_lossmult_weight

    if rendering["rgb"] is None:
        stats["mses"].append(-1.0)
        return 0.0, {k: jnp.array(v) for k, v in stats.items()}

    gt = batch.rgb[..., :3]
    if transient:
        # Time-binned target [B, bins, 3]; lossmult collapses to one weight
        # per (ray, bin) so the bin axis is never averaged against rgb.
        gt = batch.rgb
        lossmult = lossmult[..., :1]
    rendering = jaxutil.copy_tree(rendering)

    if main and config.use_loss_clip and ("unbiased" not in config.data_loss_type):
        clip = lambda x: jnp.clip(x, config.loss_clip_min, config.loss_clip)
        rendering["rgb"] = clip(rendering["rgb"])
        if "rgb_nocorr" in rendering:
            rendering["rgb_nocorr"] = clip(rendering["rgb_nocorr"])
        if "gt_nocorr" in rendering:
            rendering["gt_nocorr"] = clip(rendering["gt_nocorr"])
        gt = clip(gt)

    if transient:
        # A ray is dropped when its peak over (bins, channels) exceeds the
        # threshold; keepdims keeps the [B, 1, 1] weight broadcastable.
        peak = gt.max(axis=(-2, -1), keepdims=True)
        lossmult = jnp.where(peak > config.loss_thresh, 0.0, lossmult)
    else:
        lossmult = jnp.where(gt[..., :1] > config.loss_thresh, 0.0, lossmult)

    if config.clip_eval:
        resid_sq = (jnp.clip(rendering["rgb"], 0.0, 1.0) - jnp.clip(gt, 0.0, 1.0)) ** 2
    else:
        resid_sq = (rendering["rgb"] - gt) ** 2
    if transient:
        mse = (masks[..., :1] * lossmult * resid_sq).mean()
    else:
        mse = (masks * lossmult * resid_sq).mean()

    if "rgb_nocorr" not in rendering:
        rendering["rgb_nocorr"] = rendering["rgb"]
    gt_nocorr = rendering.get("gt_nocorr", gt)

    if config.is_material:
        rawnerf_exponent = config.rawnerf_exponent_material
        rawnerf_eps = config.rawnerf_eps_material
    else:
        rawnerf_exponent = config.rawnerf_exponent
        rawnerf_eps = config.rawnerf_eps

    data_loss = select_data_loss_fn(
        config, rendering, gt, gt_nocorr, rawnerf_eps, rawnerf_exponent, transient=transient
    )

    if "bg_noise" in rendering and not transient:
        data_loss += (rendering["bg_noise"] ** 2) * masks

    sub_loss = (lossmult * data_loss).mean()

    stats["mses"].append(mse * config.data_loss_mult)
    if config.compute_disp_metrics and batch.disps is not None:
        disp = 1 / (1 + rendering["distance_mean"])
        stats["disparity_mses"].append(((disp - batch.disps) ** 2).mean())

    return sub_loss, {k: jnp.array(v) for k, v in stats.items()}


def patch_loss(batch, rendering, config):
    """Bilateral depth smoothness over training patches.

    Pairwise Charbonnier on rendered depth within each patch_size^2 pixel
    patch, downweighted across GT color edges (bilateral term) and in
    high-variance patches (reference loss_utils.py:204-237; wired per
    train_utils.py:1006-1024). Batches are flat on this side, so patches are
    recovered by reshaping contiguous groups of patch_size^2 rays (the batcher
    emits patch pixels contiguously).
    """
    p = max(config.patch_size, 1)
    rgb_gt = batch.rgb[..., :3].reshape(-1, p * p, 3)
    depth = rendering["distance_mean"].reshape(-1, p * p)

    resid_sq = (depth[..., :, None] - depth[..., None, :]) ** 2
    pair_loss = jnp.sqrt(resid_sq + config.charb_padding**2)

    rgb_resid_sq = jnp.sum(
        (rgb_gt[..., :, None, :] - rgb_gt[..., None, :, :]) ** 2, axis=-1
    )
    bilateral = jnp.exp(-config.bilateral_strength * rgb_resid_sq)

    patch_mean = jnp.mean(rgb_gt, axis=-2, keepdims=True)
    patch_var = jnp.mean(jnp.square(rgb_gt - patch_mean), axis=(-2, -1))
    weight = jnp.exp(-(config.patch_variance_weighting**2) * patch_var)
    weight = weight[..., None, None] * bilateral

    return config.patch_loss_mult * jnp.mean(pair_loss * weight)


def compute_mask_loss(batch, rendering, rays, config, train_frac=1.0, empty_loss_weight=None):
    """Opaque/empty acc supervision (train_utils.py:785-838)."""
    lossmult = rays.lossmult
    masks = batch.masks if batch.masks is not None else jnp.ones_like(lossmult)
    if rendering.get("acc") is None:
        return jnp.array(0.0)

    decay = compute_weight_decay(
        train_frac,
        config.use_mask_weight_decay,
        config.mask_weight_decay_start,
        config.mask_weight_decay_frac,
        config.mask_weight_decay_min,
    )
    ease = compute_weight_ease_in(
        train_frac,
        config.use_mask_weight_ease,
        config.mask_weight_ease_start,
        config.mask_weight_ease_frac,
        config.mask_weight_ease_min,
    )
    data_loss = (
        jnp.sqrt((rendering["acc"][..., None] - masks) ** 2 + config.charb_padding**2)
        * decay
        * ease
    )
    if empty_loss_weight is not None:
        data_loss = jnp.where(masks > 0.5, 0.0, data_loss * empty_loss_weight)
    else:
        data_loss = jnp.where(
            masks > 0.5,
            data_loss * config.opaque_loss_weight,
            data_loss * config.empty_loss_weight,
        )
    return jnp.mean(lossmult * data_loss)


# --- sampler / geometry regularizers ---------------------------------------------


def spline_interlevel_loss(ray_history, *, mults, blurs, eps=1e-5):
    """Blurred-envelope proposal loss (loss_utils.py:74-107)."""
    num_rounds = len(ray_history) - 1
    if not isinstance(mults, tuple):
        mults = (mults,) * num_rounds
    c = ray_history[-1]["sdist"]
    w = ray_history[-1]["weights"] * ray_history[-1]["lossmult"]
    losses = []
    for mult, blur, ray_results in zip(mults, blurs, ray_history[:-1]):
        cp = ray_results["sdist"]
        wp = ray_results["weights"] * ray_results["lossmult"]
        w_blur = jax.lax.stop_gradient(stepfun.blur_and_resample_weights(cp, c, w, blur))
        losses.append(mult * jnp.mean(jnp.maximum(0, w_blur - wp) ** 2 / (wp + eps)))
    return losses


def interlevel_loss(ray_history, *, mults):
    """Original mip-NeRF 360 proposal loss (loss_utils.py:52-72)."""
    num_rounds = len(ray_history) - 1
    if not isinstance(mults, tuple):
        mults = (mults,) * num_rounds
    c = jax.lax.stop_gradient(ray_history[-1]["sdist"])
    w = jax.lax.stop_gradient(ray_history[-1]["weights"] * ray_history[-1]["lossmult"])
    losses = []
    for mult, ray_results in zip(mults, ray_history[:-1]):
        cp = ray_results["sdist"]
        wp = ray_results["weights"] * ray_results["lossmult"]
        losses.append(mult * jnp.mean(stepfun.lossfun_outer(c, w, cp, wp)))
    return losses


def compute_interlevel_loss(ray_history, loss_mults, loss_blurs, config):
    if config.use_spline_interlevel_loss:
        return spline_interlevel_loss(ray_history, mults=loss_mults, blurs=loss_blurs)
    return interlevel_loss(ray_history, mults=loss_mults)


def distortion_loss(ray_history, *, target="sdist", mult=1.0, curve_fn=lambda x: x,
                    normalize=False):
    last = ray_history[-1]
    c = curve_fn(last[target])
    w = last["weights"] * last["lossmult"]
    return mult * jnp.mean(stepfun.lossfun_distortion(c, w, normalize))


def compute_distortion_loss(ray_history, distortion_loss_mult, config):
    if config.distortion_loss_curve_fn is None:
        curve_fn = lambda x: x
    else:
        fn, kwargs = config.distortion_loss_curve_fn
        curve_fn = functools.partial(fn, **kwargs)
    return distortion_loss(
        ray_history,
        target=config.distortion_loss_target,
        mult=distortion_loss_mult,
        curve_fn=curve_fn,
        normalize=config.normalize_distortion_loss,
    )


def orientation_loss(rays, ray_results, config):
    """Ref-NeRF orientation regularizer (loss_utils.py:130-168)."""
    n = ray_results.get(config.orientation_loss_target)
    if n is None:
        return 0.0
    w = ray_results["weights"] * ray_results["lossmult"]
    if config.orientation_loss_normalize:
        w = w / jnp.sum(w, axis=-1, keepdims=True)
    if config.orientation_loss_stopgrad:
        w = jax.lax.stop_gradient(w)
    n = jnp.nan_to_num(n)
    v = -rays.viewdirs
    n_dot_v = (n * v[..., None, :]).sum(axis=-1)
    loss = jnp.mean(
        jnp.abs(jnp.abs(w * (jnp.minimum(0.0, n_dot_v) ** 2)).sum(axis=-1) + 1e-5)
    )
    return loss * config.orientation_loss_mult


def predicted_normal_loss(ray_results, beta, config, *, mult, gt="normals",
                          pred="normals_pred", stopgrad=False, stopgrad_weight=1.0):
    """Ref-NeRF predicted normal supervision (loss_utils.py:171-203)."""
    if ray_results.get(gt) is None or ray_results.get(pred) is None:
        return 0.0
    w = ray_results["weights"] * ray_results["lossmult"]
    if config.predicted_normal_loss_normalize:
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-8)
    if stopgrad:
        w = jax.lax.stop_gradient(w)
    else:
        w = jaxutil.stopgrad_with_weight(w, stopgrad_weight)
    n = jax.lax.stop_gradient(jnp.nan_to_num(ray_results[gt]))
    n_pred = jnp.nan_to_num(ray_results[pred])
    loss = jnp.mean(
        jnp.abs(
            (jnp.abs(w * (1.0 - jnp.sum(n * n_pred, axis=-1))) * beta[..., 0]).sum(
                axis=-1, keepdims=True
            )
            + 1e-5
        )
    )
    return loss * mult


def eikonal_loss(ray_history, config):
    total = 0.0
    for i, ray_results in enumerate(ray_history):
        n = ray_results["normals"]
        if n is None:
            raise ValueError("Gradient normals cannot be None if eikonal loss is on.")
        norm = jnp.sqrt(jnp.maximum(jnp.sum(n**2, axis=-1), np.finfo(np.float32).tiny))
        loss = jnp.mean((norm - 1.0) ** 2.0)
        mult = config.eikonal_coarse_loss_mult if i < len(ray_history) - 1 else (
            config.eikonal_loss_mult
        )
        total += mult * loss
    return total


def param_regularizer_loss(variables, config):
    """Parameter-norm regularizers keyed by substring (configs param_regularizers).

    Each entry is (mult, agg_fn, alpha, scale): loss += mult * agg(|p*scale|^alpha).
    """
    losses = {}
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    for name, spec in config.param_regularizers.items():
        mult, agg_fn, alpha, scale = spec
        acc = 0.0
        found = False
        for path, value in flat:
            if any(name in str(p) for p in path):
                acc = acc + agg_fn(jnp.abs(value * scale) ** alpha)
                found = True
        if found:
            losses[name] = mult * acc
    return losses


def tree_norm(tree):
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(tree))
    )


def clip_gradients(grad, config):
    """Per-top-level-module value/norm clipping (train_utils.py:1274-1302)."""
    if config.grad_max_val <= 0 and config.grad_max_norm <= 0:
        return grad
    import flax

    grad_clipped = flax.core.unfreeze(grad)
    for k, g in grad["params"].items():
        if config.grad_max_val > 0:
            g = jax.tree_util.tree_map(
                lambda z: jnp.clip(z, -config.grad_max_val, config.grad_max_val), g
            )
        if config.grad_max_norm > 0:
            mult = jnp.minimum(
                1, config.grad_max_norm / (np.finfo(np.float32).eps + tree_norm(g))
            )
            g = jax.tree_util.tree_map(lambda z, m=mult: m * z, g)
        grad_clipped["params"][k] = g
    return type(grad)(grad_clipped) if not isinstance(grad, dict) else grad_clipped
