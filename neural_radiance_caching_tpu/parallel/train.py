"""Sharded training harness: optimizer, jitted train step, render fn.

Behavioral parity target: reference internal/train_utils.py (setup_model
:3938-3984, create_train_step :2819-3178, create_optimizer :3834-3935,
checkpoint surgery :3991-4088).

TPU-first deltas:
  * ONE jitted train step with NamedSharding over a `Mesh(("data",))`
    instead of `jax.pmap` + host-side shard() reshapes
    (train_utils.py:3172-3177). Batches are sharded on their leading ray
    axis; parameters/optimizer state are replicated; XLA inserts the
    gradient all-reduce over ICI from the sharding annotations — the
    explicit `lax.pmean` (train_utils.py:3133-3136) disappears.
  * The train state is donated, so parameter and Adam-state buffers are
    updated in place in HBM.
  * Multi-host is the same program: a global mesh over all processes with
    per-process addressable shards.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from neural_radiance_caching_tpu.engine import configs as configs_lib
from neural_radiance_caching_tpu.parallel import extra_losses as extra_losses_lib
from neural_radiance_caching_tpu.parallel import losses as losses_lib
from neural_radiance_caching_tpu.parallel import mesh as mesh_lib
from neural_radiance_caching_tpu.ops import math
from neural_radiance_caching_tpu.utils import jaxutil, pytrees


_REMAT_SAVE_NAMES = None  # None = auto by model type (see _remat_save_names)


def set_remat_save_names(*names):
    """Override which checkpoint_name-tagged residuals the remat policy saves.

    The auto default (pass None to restore) is model-dependent: material
    models save ("grid_encode", "ipe_lift") — the on-chip A/B measured
    saving the lifted-IPE residuals at +4.9% rays/s over recomputing them
    (BASELINE.md round 3); other models save only "grid_encode", the
    hash-grid encoder outputs, which must never re-execute (Pallas scatter
    VJP single-execution requirement, see the policy comment in
    create_train_step). On-chip A/B via bench.py --remat-save.
    """
    global _REMAT_SAVE_NAMES
    if names == (None,):
        _REMAT_SAVE_NAMES = None
        return
    if "grid_encode" not in names:
        raise ValueError("remat policy must keep saving 'grid_encode'")
    _REMAT_SAVE_NAMES = tuple(names)


def _remat_save_names(model):
    if _REMAT_SAVE_NAMES is not None:
        return _REMAT_SAVE_NAMES
    from neural_radiance_caching_tpu.models import material_model

    if isinstance(model, material_model.BaseMaterialModel):
        return ("grid_encode", "ipe_lift")
    return ("grid_encode",)


# --- Optimizer -----------------------------------------------------------------


def create_optimizer(config, variables):
    """Adam with per-module-prefix lr overrides from config.extra_opt_params.

    Parity with train_utils.py:3834-3935: each prefix (e.g. "Cache",
    "MaterialShader") gets its own masked Adam chain with its own schedule;
    everything else falls through to the main schedule. is_material selects
    the `*_material` sub-entries.
    """
    adam_kwargs = {"b1": config.adam_beta1, "b2": config.adam_beta2, "eps": config.adam_eps}
    lr_kwargs = {
        "max_steps": config.max_steps,
        "lr_delay_steps": config.lr_delay_steps,
        "lr_delay_mult": config.lr_delay_mult,
    }

    def get_lr_fn(lr_init, lr_final, **kw):
        return functools.partial(
            math.learning_rate_decay, lr_init=lr_init, lr_final=lr_final, **kw
        )

    suffix = "_material" if config.is_material else ""

    def opt_param(params, name, default):
        return params.get(name + suffix, params.get(name, default))

    lr_fn_main = get_lr_fn(config.lr_init, config.lr_final, **lr_kwargs)
    tx_model = optax.adam(learning_rate=lr_fn_main, **adam_kwargs)
    all_false = jax.tree_util.tree_map(lambda _: False, variables)

    def construct(opt_params, prefix, tx_model):
        cur_lr_kwargs = {
            "max_steps": opt_param(opt_params, "max_steps", config.max_steps),
            "lr_delay_steps": opt_param(opt_params, "lr_delay_steps", config.lr_delay_steps),
            "lr_delay_mult": opt_param(opt_params, "lr_delay_mult", config.lr_delay_mult),
        }
        cur_adam_kwargs = {
            "b1": opt_param(opt_params, "adam_b1", config.adam_beta1),
            "b2": opt_param(opt_params, "adam_b2", config.adam_beta2),
            "eps": opt_param(opt_params, "adam_eps", config.adam_eps),
        }
        rest_traversal = flax.traverse_util.ModelParamTraversal(
            lambda path, _: prefix not in path.split("/")
        )
        rest_mask = rest_traversal.update(lambda _: True, all_false)
        tx = optax.masked(tx_model, rest_mask)

        extra_lr_fn = get_lr_fn(
            opt_param(opt_params, "lr_init", config.lr_init),
            opt_param(opt_params, "lr_final", config.lr_final),
            **cur_lr_kwargs,
        )
        extra_traversal = flax.traverse_util.ModelParamTraversal(
            lambda path, _: prefix in path.split("/")
        )
        extra_mask = extra_traversal.update(lambda _: True, all_false)
        extra_tx = optax.adam(learning_rate=extra_lr_fn, **cur_adam_kwargs)
        return optax.chain(tx, optax.masked(extra_tx, extra_mask))

    if config.extra_opt_params:
        for prefix, params in config.extra_opt_params.items():
            tx_model = construct(params, prefix, tx_model)
    tx = tx_model

    if config.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, config.grad_accum_steps, use_grad_mean=True)

    state = TrainState.create(apply_fn=None, params=variables, tx=tx)
    return state, lr_fn_main


def _summarize_tree(fn, params):
    """One scalar per top-level module (reference train_utils summarize_tree):
    fn over the concatenation of that module's flattened leaves."""
    return {
        k: fn(jnp.concatenate(
            [jnp.ravel(x) for x in jax.tree_util.tree_leaves(v)]
        ))
        for k, v in params.items()
    }


# --- Loss assembly ----------------------------------------------------------------


def _compute_losses_for_output(
    key, batch, rays, model_results, config, train_frac, main_name, losses, stats
):
    """Per-output losses over one 'main'-style results dict.

    Each output carries its own loss_weight/loss_type/linear_to_srgb (the
    reference deep-copies a per-output Config, train_utils.py:2998-3080); we
    override the relevant Config fields through a lightweight shim.
    """
    import dataclasses as _dc

    results = model_results[main_name]
    rendering = model_results["render"] if main_name == "main" else results["integrator"]
    prefix = "" if main_name == "main" else main_name.replace("main", "")

    out_config = config
    loss_weight = 1.0
    if isinstance(results, dict) and "loss_type" in results:
        out_config = _dc.replace(
            config,
            data_loss_type=results["loss_type"],
            linear_to_srgb=results.get("linear_to_srgb", config.linear_to_srgb),
            is_material=(main_name == "main" and results.get("sampler") is None),
        )
        loss_weight = results.get("loss_weight", 1.0)

    data_loss, data_stats = losses_lib.compute_data_loss(
        batch, rendering, rays, out_config, main=(main_name == "main"),
        train_frac=train_frac, transient=config.use_transient,
    )
    losses[prefix + "data"] = config.data_loss_mult * loss_weight * data_loss
    for k, v in data_stats.items():
        stats[prefix + k] = v

    # Patch-wise bilateral depth smoothness (reference train_utils.py:1006-1024;
    # needs patch_size > 1 so the batcher emitted contiguous pixel patches).
    if (
        config.patch_loss_mult > 0
        and config.patch_size > 1
        and rendering.get("distance_mean") is not None
        and batch.rgb is not None
    ):
        losses[prefix + "patch"] = losses_lib.patch_loss(batch, rendering, out_config)

    ray_history = results["sampler"]
    last = results["geometry"]
    if ray_history is None or last is None:
        # Material outputs have no sampler of their own; geometry losses
        # apply to the cache output only.
        return losses, stats

    if any(m > 0 for m in config.interlevel_loss_mults):
        interlevel = losses_lib.compute_interlevel_loss(
            ray_history, config.interlevel_loss_mults, config.interlevel_loss_blurs, config
        )
        for i, l in enumerate(interlevel):
            losses[f"{prefix}interlevel_{i}"] = l

    if config.distortion_loss_mult > 0:
        losses[prefix + "distortion"] = losses_lib.compute_distortion_loss(
            ray_history, config.distortion_loss_mult, config
        )

    # Normal-loss weight decay (train_utils.py:3240-3300): late-training
    # ramp-down shared by the orientation + predicted-normal losses.
    decay = losses_lib.compute_weight_decay(
        train_frac,
        config.use_normal_weight_decay,
        config.normal_weight_decay_start,
        config.normal_weight_decay_frac,
        config.normal_weight_decay_min,
    )
    decay_bwd = decay if config.use_normal_weight_decay_backward else 1.0

    if config.orientation_loss_mult > 0:
        losses[prefix + "orientation"] = (
            losses_lib.orientation_loss(rays, last, config) * decay
        )

    # Predicted-normal supervision with the ease-in schedule
    # (train_utils.py:3217-3302).
    ease = losses_lib.compute_weight_ease_in(
        train_frac,
        config.use_normal_weight_ease,
        config.normal_weight_ease_start,
        config.normal_weight_ease_frac,
        config.normal_weight_ease_min,
    ) * decay
    ease_bwd = losses_lib.compute_weight_ease_in(
        train_frac,
        config.use_normal_weight_ease_backward,
        config.normal_weight_ease_start,
        config.normal_weight_ease_frac,
        config.normal_weight_ease_min,
    ) * decay_bwd
    # Per-sample beta [B, S, 1] (reference train_utils.py:3274 builds it from
    # normals[..., :1]); beta[..., 0] must broadcast against the [B, S]
    # weighted normal-alignment term.
    beta = jnp.ones_like(last["weights"][..., None])
    if config.predicted_normal_loss_mult > 0:
        losses[prefix + "predicted_normals"] = losses_lib.predicted_normal_loss(
            last,
            beta,
            config,
            mult=config.predicted_normal_loss_mult * ease,
            gt="normals_pred",
            pred="normals",
            stopgrad=config.predicted_normal_loss_stopgrad,
            stopgrad_weight=config.predicted_normal_loss_stopgrad_weight,
        )
    if config.predicted_normal_reverse_loss_mult > 0:
        losses[prefix + "predicted_normals_reverse"] = losses_lib.predicted_normal_loss(
            last,
            beta,
            config,
            mult=config.predicted_normal_reverse_loss_mult * ease_bwd,
            gt="normals",
            pred="normals_pred",
            stopgrad=True,
        )

    if config.eikonal_loss_mult > 0 or config.eikonal_coarse_loss_mult > 0:
        losses[prefix + "eikonal"] = losses_lib.eikonal_loss(ray_history, config)

    if (config.opaque_loss_weight > 0 or config.empty_loss_weight > 0) and (
        batch.masks is not None
    ):
        losses[prefix + "mask"] = losses_lib.compute_mask_loss(
            batch, rendering, rays, config, train_frac=train_frac
        )

    return losses, stats


def create_train_step(
    model,
    config,
    mesh=None,
    dataset=None,
    compiler_options=None,
):
    """Build the sharded, jitted train step.

    Returned signature: (rng, state, batch, train_frac) -> (state, stats, rng).
    rng is advanced inside the step (folded per step) so callers can loop.
    """
    if mesh is None:
        mesh = mesh_lib.create_mesh()

    # In-step ray casting (reference train_utils.py:2972-2978): when
    # Config.cast_rays_in_train_step the batcher ships Pixels and the jitted
    # step casts them against the (static) cameras — required for per-step
    # ray jitter. Camera arrays are closed over as jit constants.
    cast_cameras = None
    if config.cast_rays_in_train_step and dataset is not None:
        cast_cameras = {
            "cameras": jax.tree_util.tree_map(
                jnp.asarray, tuple(dataset.cameras)
            ),
            "lights": jnp.asarray(dataset.lights),
            "virtual": (
                None
                if dataset.virtual_camtoworlds is dataset.camtoworlds
                else (
                    jnp.asarray(dataset.pixtocams),
                    jnp.asarray(dataset.virtual_camtoworlds),
                )
            ),
            "impulse_response": (
                None
                if dataset.impulse_response is None
                else jnp.asarray(dataset.impulse_response)
            ),
        }

    def maybe_cast_rays(rng, rays):
        if not isinstance(rays, pytrees.Pixels):
            return rays
        if cast_cameras is None:
            raise ValueError(
                "Batch contains Pixels but the train step has no cameras; "
                "pass dataset= to create_train_step or disable "
                "Config.cast_rays_in_train_step."
            )
        from neural_radiance_caching_tpu.data import camera_utils

        return camera_utils.cast_ray_batch(
            cast_cameras["cameras"],
            cast_cameras["lights"],
            rays,
            rng=rng,
            jitter=config.jitter_rays,
            xnp=jnp,
            impulse_response=cast_cameras["impulse_response"],
            virtual_cameras=cast_cameras["virtual"],
        )

    def forward(params, rng, rays, train_frac):
        return model.apply(
            params,
            rng,
            rays,
            train_frac=train_frac,
            train=True,
            compute_extras=False,
        )

    if config.gradient_checkpointing:
        # Rematerialize the forward in the backward pass: NeRF activations
        # (per-sample MLP features over B*S samples) dominate HBM; recompute
        # is cheap on the MXU. Encoder outputs are tagged "grid_encode"
        # (ops/hashgrid.py) and pinned as saved residuals so the row-gather
        # forward is not recomputed and the Pallas scatter VJP executes
        # exactly once — re-execution of the kernel under plain remat
        # crashed the TPU runtime.
        #
        # Model outputs mix arrays with static metadata (loss_type strings,
        # python-scalar loss weights) that jax.checkpoint rejects; the
        # static leaves ride around the remat boundary.
        base_forward = forward
        static_box = {}

        def arrays_forward(params, rng, rays, train_frac):
            out = base_forward(params, rng, rays, train_frac)
            leaves, treedef = jax.tree_util.tree_flatten(out)
            is_array = [isinstance(x, jnp.ndarray) for x in leaves]
            static_box["spec"] = (
                treedef,
                is_array,
                [None if a else x for x, a in zip(leaves, is_array)],
            )
            return [x for x, a in zip(leaves, is_array) if a]

        ckpt_forward = jax.checkpoint(
            arrays_forward,
            policy=jax.checkpoint_policies.save_only_these_names(
                *_remat_save_names(model)
            ),
        )

        def forward(params, rng, rays, train_frac):
            arrays = ckpt_forward(params, rng, rays, train_frac)
            treedef, is_array, statics = static_box["spec"]
            it = iter(arrays)
            leaves = [next(it) if a else s
                      for a, s in zip(is_array, statics)]
            return jax.tree_util.tree_unflatten(treedef, leaves)

    def loss_fn(params, rng, batch, train_frac):
        cast_key = jax.random.fold_in(rng, 0xCA57)
        rays = maybe_cast_rays(cast_key, batch.rays)
        model_results = forward(params, rng, rays, train_frac)

        if config.use_gradient_debias and "cache_main" in model_results:
            # Flash Cache gradient debiasing: a second forward pass with
            # independent secondary-ray randomness but the SAME cache sampler
            # results / surface points; `rgb_nocorr` makes the squared losses
            # unbiased (reference _run_model_forward, train_utils.py:3404-3547).
            rng_nocorr = jax.random.fold_in(rng, 0x5eed)
            nocorr_results = model.apply(
                params,
                rng_nocorr,
                rays,
                train_frac=train_frac,
                train=True,
                compute_extras=False,
                cache_outputs={"sampler": model_results["cache_main"]["sampler"]},
                filtered_sampler_inds=model_results["cache_main"][
                    "filtered_sampler_inds"
                ],
            )
            model_results["render"]["rgb_nocorr"] = nocorr_results["render"]["rgb"]

            # Graft per-sample `_nocorr` shader outputs for the consistency /
            # residual-albedo losses (the reference merges the two forwards'
            # renderings the same way, train_utils.py:3404-3547).
            for out_key in ("main", "cache_main"):
                shader = model_results.get(out_key, {}).get("shader")
                nocorr_shader = nocorr_results.get(out_key, {}).get("shader")
                if shader is None or nocorr_shader is None:
                    continue
                for k in ("diffuse_rgb", "specular_rgb", "direct_rgb",
                          "indirect_rgb", "transient_indirect",
                          "lighting_irradiance", "cache_diffuse_rgb",
                          "cache_specular_rgb", "cache_direct_rgb",
                          "cache_indirect_rgb", "cache_transient_indirect"):
                    if k in nocorr_shader:
                        shader[k + "_nocorr"] = nocorr_shader[k]

        losses: Dict[str, Any] = {}
        stats: Dict[str, Any] = {}
        for i, key in enumerate(sorted(k for k in model_results if k.endswith("main"))):
            _compute_losses_for_output(
                key, batch, rays, model_results, config, train_frac, key, losses, stats
            )
            extra_losses_lib.compute_extra_losses(
                model, params, jax.random.fold_in(rng, 7919 + i),
                rays, config, batch, model_results, key, losses, train_frac,
            )

        reg_losses = losses_lib.param_regularizer_loss(params, config)
        for k, v in reg_losses.items():
            losses["regularizer_" + k] = v

        total = sum(jax.tree_util.tree_leaves(losses))
        stats["losses"] = losses

        if config.debug_mode:
            # Reference train_utils.py:3101-3117: per-module weight norms +
            # ray-distance percentile histograms for sampler debugging.
            stats["weight_l2s"] = _summarize_tree(
                lambda x: jnp.sum(x**2), params["params"]
            )
            pct = lambda x: jnp.percentile(
                x.flatten(), jnp.linspace(0, 100, 101)
            )
            sampler_results = model_results.get("cache_main", model_results.get("main", {})).get("sampler")
            for ri, rh in enumerate(sampler_results or ()):
                s, t = rh["sdist"], rh["tdist"]
                stats[f"ray_normalized_distance{ri}"] = pct(s)
                stats[f"ray_normalized_distance{ri}_log_delta"] = math.safe_log(
                    pct(s[..., 1:] - s[..., :-1])
                )
                stats[f"ray_metric_distance{ri}_log"] = math.safe_log(pct(t))
                stats[f"ray_metric_distance{ri}_log_delta"] = math.safe_log(
                    pct(t[..., 1:] - t[..., :-1])
                )
        return total, stats

    def train_step(rng, state, batch, train_frac):
        step_rng = jax.random.fold_in(rng, state.step)
        (loss, stats), grad = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, step_rng, batch, train_frac
        )
        if config.debug_mode:
            # Per-module gradient health (reference train_utils.py:3140-3156).
            stats["grad_norms"] = _summarize_tree(
                lambda x: jnp.sqrt(jnp.sum(x**2)), grad["params"]
            )
            stats["grad_maxes"] = _summarize_tree(
                lambda x: jnp.max(jnp.abs(x)), grad["params"]
            )
            for name, g in flax.traverse_util.flatten_dict(
                grad, sep="/"
            ).items():
                jax.lax.cond(
                    jnp.any(~jnp.isfinite(g)),
                    lambda name=name: jax.debug.print(
                        f"Warning: {name} has non-finite grads"
                    ),
                    lambda: None,
                )
                jax.lax.cond(
                    jnp.all(g == 0),
                    lambda name=name: jax.debug.print(
                        f"Warning: {name} has all-zero grads"
                    ),
                    lambda: None,
                )
        grad = jax.tree_util.tree_map(jnp.nan_to_num, grad)
        grad = losses_lib.clip_gradients(grad, config)
        new_state = state.apply_gradients(grads=grad)
        stats["loss"] = loss
        stats["grad_norm"] = losses_lib.tree_norm(grad)
        stats["param_norm"] = losses_lib.tree_norm(state.params)
        return new_state, stats

    repl = mesh_lib.replicated_sharding(mesh)

    # The batch arg inherits its committed shardings (in_sharding None):
    # every leaf is batch-sharded by mesh_lib.shard_batch/DevicePrefetcher,
    # EXCEPT rays.impulse_response (the 1-D sensor kernel), which those
    # helpers replicate — a single sharding here would force an invalid
    # kernel-length/mesh-size split. Callers must shard_batch first.
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, None, None),
        out_shardings=(repl, repl),
        donate_argnums=(1,),
        compiler_options=compiler_options,
    )


def create_render_fn(model, mesh=None, **apply_kwargs):
    """Jitted eval-mode renderer over the sharded ray batch.

    Replaces the reference's pmap + all_gather eval path
    (train_utils.py:3742-3831): outputs come back as globally-sharded arrays
    that the host can fetch directly.
    """
    if mesh is None:
        mesh = mesh_lib.create_mesh()
    # Per-field prefix: rays leaves batch-sharded, the 1-D sensor kernel
    # replicated (render chunks arrive as raw numpy, so the placement must
    # happen here at the jit boundary).
    batch_sharding = mesh_lib.rays_shardings(mesh)
    repl = mesh_lib.replicated_sharding(mesh)
    # compute_extras=False compiles an RGB-centric program (no AOV buffers)
    # for interactive/preview renders; full extras remain the default.
    compute_extras = apply_kwargs.pop("compute_extras", True)

    def render_fn(params, rng, train_frac, rays):
        return model.apply(
            params,
            rng,
            rays,
            train_frac=train_frac,
            train=False,
            compute_extras=compute_extras,
            **apply_kwargs,
        )["render"]

    return jax.jit(
        render_fn,
        in_shardings=(repl, None, None, batch_sharding),
    )


def setup_model(config, rng, dataset=None, mesh=None):
    """Construct model + optimizer + sharded train/render functions."""
    from neural_radiance_caching_tpu.models import construct

    dummy = pytrees.dummy_rays(16)
    model, variables = construct.construct_model(rng, dummy, config, dataset=dataset)
    state, lr_fn = create_optimizer(config, variables)
    if mesh is None:
        mesh = mesh_lib.create_mesh()
    render_eval_fn = create_render_fn(model, mesh=mesh)
    train_step = create_train_step(model, config, mesh=mesh, dataset=dataset)
    return model, state, render_eval_fn, train_step, lr_fn


# --- Checkpoint surgery -----------------------------------------------------------


def _flatten(params):
    return flax.traverse_util.flatten_dict(flax.core.unfreeze(params), sep="/")


def _unflatten(flat):
    return flax.traverse_util.unflatten_dict(flat, sep="/")


def replace_param_subset(state, source_params, put_prefix="", take_prefix="",
                         exclude_prefixes=()):
    """Copy params from source under take_prefix into state under put_prefix.

    Parity with train_utils.py:3991-4032 — the mechanism by which stage N
    warm-starts from stage N−1 (e.g. material stage pulling `params/Cache/...`
    while keeping its fresh `params/MaterialShader`).
    """
    target_flat = _flatten(state.params)
    source_flat = _flatten(source_params)
    for k_src, v in source_flat.items():
        if not k_src.startswith(take_prefix):
            continue
        k_dst = put_prefix + k_src[len(take_prefix):]
        if any(k_dst.startswith(p) for p in exclude_prefixes):
            continue
        if k_dst in target_flat:
            if target_flat[k_dst].shape != v.shape:
                raise ValueError(
                    f"Shape mismatch restoring {k_dst}: "
                    f"{target_flat[k_dst].shape} vs {v.shape}"
                )
            target_flat[k_dst] = v
    return state.replace(params=_unflatten(target_flat))


def restore_partial_checkpoint(
    state, source_params, prefixes=None, exclude_prefixes=(), replace_dict=None
):
    """Prefix-filtered restore with optional put/take prefix renaming."""
    if replace_dict:
        for put_prefix, take_prefix in replace_dict.items():
            state = replace_param_subset(
                state,
                source_params,
                put_prefix=put_prefix,
                take_prefix=take_prefix,
                exclude_prefixes=exclude_prefixes,
            )
        return state
    for prefix in prefixes if prefixes is not None else [""]:
        state = replace_param_subset(
            state,
            source_params,
            put_prefix=prefix,
            take_prefix=prefix,
            exclude_prefixes=exclude_prefixes,
        )
    return state
