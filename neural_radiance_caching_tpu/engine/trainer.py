"""Multi-stage training orchestrator.

Behavioral parity target: reference engine/trainer.py (Trainer :53-2241).
The Trainer drives the staged Flash Cache / InvProp recipe: each `stage`
(cache → light / surface_light_field → material*) selects a stage_params
entry (configs/trainer.gin), synthesizes gin bindings (lr/step scaling by
batch ratio, per-module optimizer overrides, stage extra losses, stage model
flags), re-binds the config, and then runs the train loop with periodic
checkpointing and test-set evaluation. Stage warm-starts are prefix-filtered
checkpoint restores (e.g. the material stage pulls params/Cache from the
cache stage but keeps a fresh params/MaterialShader).

TPU-first deltas:
  * one jitted train step over a `Mesh(("data",))` with NamedShardings
    (parallel/train.py) instead of pmap + host reshapes + replicated states;
  * orbax checkpointing (utils/checkpoints.py);
  * eval rendering reuses the same sharded render fn in fixed-size chunks
    (engine/renderer.py), so the whole run compiles two programs.
"""

from __future__ import annotations

import dataclasses
import gc
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.data import datasets
from neural_radiance_caching_tpu.engine import configs as configs_lib
from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.engine import renderer
from neural_radiance_caching_tpu.ops import image as image_lib
from neural_radiance_caching_tpu.parallel import mesh as mesh_lib
from neural_radiance_caching_tpu.parallel import train as train_lib
from neural_radiance_caching_tpu.utils import checkpoints as ckpt_lib
from neural_radiance_caching_tpu.utils import pytrees
from neural_radiance_caching_tpu.utils import vis as vis_lib

# Minimal built-in registry; configs/trainer.gin binds the full one
# (reference configs/trainer.gin).
_DEFAULT_STAGE_PARAMS = {
    "cache": {
        "render_chunk_size": 4096,
        "use_light_sampler": False,
        "use_material": False,
        "use_surface_light_field": False,
        "optimize_cache": True,
        "optimize_light": False,
        "optimize_surface_light_field": False,
        "reduce_cache_factor": 1.0,
        "reduce_surface_light_field_factor": 1.0,
        "prefixes": None,
        "exclude_prefixes": None,
        "replace_dict": None,
        "extra_losses": {},
    },
}


@gin.configurable
@dataclasses.dataclass
class Trainer:
    """Stage-driven trainer (reference engine/trainer.py:53)."""

    # Core configuration
    stage: str = "cache"
    viewer_only: bool = False
    relight: bool = False
    save_results: bool = True

    # Albedo processing options
    albedo_clip: float = 1.0
    albedo_correct_median: bool = False
    albedo_gamma: bool = True

    # Visualization options
    vis_only: bool = False
    vis_restart: bool = False
    vis_start: int = 0
    vis_end: int = 200
    vis_secondary: bool = False
    vis_extra: bool = False
    vis_surface_light_field: bool = False
    vis_light_sampler: bool = False

    # Training options
    stopgrad: bool = False
    resample: bool = False
    resample_depth: bool = False
    sample_factor: int = 2
    num_resample: int = 1
    resample_render: bool = False
    sample_render_factor: int = 2
    render_repeats: int = 1

    stage_params: Optional[Dict[str, Any]] = None

    # --- setup ------------------------------------------------------------------

    def setup(self):
        if self.stage_params is None:
            self.stage_params = dict(_DEFAULT_STAGE_PARAMS)
        if self.stage not in self.stage_params:
            raise ValueError(
                f"Unknown stage {self.stage!r}; known: {sorted(self.stage_params)}"
            )
        self._setup_names()
        self._setup_config_parameters()
        self._setup_binding_configs()
        self._setup_rng()
        self._load_datasets()
        self._setup_model()
        self._setup_checkpointing()
        self._initialize_metrics()

    def _query(self, name, default=None):
        return gin.query_parameter(name, default)

    def _setup_names(self):
        self.use_transient = bool(self._query("Config.use_transient", False))
        if self.use_transient:
            self.nerf_mlp_name = "TransientNeRFMLP"
            self.nerf_model_name = "TransientNeRFModel"
            self.material_mlp_name = "TransientMaterialMLP"
            self.material_model_name = "TransientMaterialModel"
        else:
            self.nerf_mlp_name = "NeRFMLP"
            self.nerf_model_name = "NeRFModel"
            self.material_mlp_name = "MaterialMLP"
            self.material_model_name = "MaterialModel"

    def _setup_config_parameters(self):
        sp = self.stage_params[self.stage]
        q = self._query

        self.checkpoint_dir = q("Config.checkpoint_dir", None)
        self.calib_checkpoint = q("Config.calib_checkpoint", "")
        self.optimize_calib_on_load = q("Config.optimize_calib_on_load", False)

        self.secondary_grad_accum_steps = sp.get(
            "secondary_grad_accum_steps", q("Config.secondary_grad_accum_steps", 1)
        )
        self.grad_accum_steps = (
            sp.get("grad_accum_steps", q("Config.grad_accum_steps", 1))
            * self.secondary_grad_accum_steps
        )

        # Feature flags
        self.use_material = sp["use_material"]
        self.use_light_sampler = sp["use_light_sampler"]
        self.use_surface_light_field = sp["use_surface_light_field"]
        self.optimize_cache = sp["optimize_cache"]
        self.optimize_light = sp["optimize_light"]
        self.optimize_surface_light_field = sp["optimize_surface_light_field"]
        self.optimize_geometry = sp.get("optimize_geometry", True)
        self.use_geometry_smoothness = q("Config.use_geometry_smoothness", False)
        self.stopgrad_cache_geometry = (
            q("Config.stopgrad_cache_geometry", False)
            and self.use_material
            and ("from_scratch" not in self.stage)
        )

        # Occlusions (trainer.py:193-207)
        self.use_occlusions = q("Config.use_occlusions", False)
        self.occlusions_secondary_only = q("Config.occlusions_secondary_only", True)
        self.occlusions_primary_only = q("Config.occlusions_primary_only", True)
        self.light_near = q("Config.light_near", 0.05)
        if self.vis_only:
            self.use_occlusions = True
            self.occlusions_secondary_only = False
            self.occlusions_primary_only = False
            self.light_near = q("Config.near", 0.0)
        if "finetune" in self.stage:
            self.use_occlusions = True
            self.occlusions_secondary_only = False
            self.occlusions_primary_only = False

        # Learning-rate / schedule scaling (trainer.py:209-236): steps and lrs
        # rescale with the ratio of the reference batch to the actual one.
        self.factor = q("Config.factor", 0)
        self.base_batch_size = q("Config.base_batch_size", 65536)
        self.batch_size = q("Config.batch_size", 16384)
        self.render_chunk_size = sp.get(
            "render_chunk_size", q("Config.render_chunk_size", 16384)
        )
        self.train_length_mult = max(1, q("Config.train_length_mult", 1))
        self.scale_factor = max(
            1,
            self.base_batch_size
            // max(
                1,
                (self.batch_size * self.grad_accum_steps)
                // self.secondary_grad_accum_steps,
            ),
        )
        self.total_batch_size = self.batch_size * self.grad_accum_steps
        self.lr_factor = q("Config.lr_factor", 1.0) * q("Config.lr_factor_mult", 1.0)
        self.max_steps = (
            q("Config.max_steps", 25000) * self.scale_factor
        ) // self.train_length_mult
        self.lr_delay_steps = (
            q("Config.lr_delay_steps", 2500) * self.scale_factor
        ) // self.train_length_mult
        self.lr_init = (q("Config.lr_init", 0.01) / self.scale_factor) * self.lr_factor
        self.lr_final = (q("Config.lr_final", 0.001) / self.scale_factor) * self.lr_factor
        self.extra_opt_params = jax.tree_util.tree_map(
            lambda x: x, q("Config.extra_opt_params", {})
        )

        # Loss parameters (trainer.py:238-267)
        self.cache_consistency_loss_weight = q(
            "Config.cache_consistency_loss_weight", 0.0
        )
        self.cache_consistency_loss_type = q("Config.cache_consistency_loss_type", "charb")
        self.finetune_multiplier = sp.get(
            "finetune_multiplier", q("Config.finetune_multiplier", 10.0)
        )
        self.finetune_cache = False
        self.reduce_cache_factor = sp["reduce_cache_factor"]
        self.reduce_surface_light_field_factor = sp["reduce_surface_light_field_factor"]
        self.anneal_slope = sp.get(
            "anneal_slope", q("ProposalVolumeSampler.anneal_slope", 10.0)
        )
        self.material_interlevel_loss_mults = q(
            "Config.material_interlevel_loss_mults", (0.0, 0.0)
        )
        self.material_predicted_normal_loss_mult = q(
            "Config.material_predicted_normal_loss_mult", 1.0
        )
        self.prefixes = sp.get("prefixes")
        self.exclude_prefixes = list(sp.get("exclude_prefixes") or [])
        self.replace_dict = sp.get("replace_dict")
        self.extra_losses = dict(sp.get("extra_losses", {}))
        self.param_regularizers = sp.get(
            "param_regularizers", q("Config.param_regularizers", {})
        )

        # Sampling parameters (trainer.py:269-303)
        self.num_secondary_samples = sp.get(
            "num_secondary_samples",
            q(f"{self.material_mlp_name}.num_secondary_samples", None),
        )
        self.num_secondary_samples_render = sp.get(
            "num_secondary_samples_render", self.num_secondary_samples
        )
        self.num_secondary_samples_diff = sp.get(
            "num_secondary_samples_diff",
            q(f"{self.material_mlp_name}.num_secondary_samples_diff", None),
        )
        self.num_secondary_samples_diff_render = sp.get(
            "num_secondary_samples_diff_render", self.num_secondary_samples_diff
        )
        self.num_surface_light_field_samples = sp.get(
            "num_surface_light_field_samples", None
        )
        self.slf_variate = (
            sp.get("slf_variate", q(f"{self.material_model_name}.slf_variate", False))
            and self.use_surface_light_field
        )
        self.surface_light_field_loss_far = sp.get("surface_light_field_loss_far")
        self.surface_light_field_loss_radius = sp.get("surface_light_field_loss_radius")
        if self.num_secondary_samples_render is not None:
            self.num_secondary_samples_render *= self.sample_render_factor
        if self.num_secondary_samples is not None:
            self.num_secondary_samples *= self.sample_factor
        if self.num_secondary_samples_diff_render is not None:
            self.num_secondary_samples_diff_render *= self.sample_render_factor
        if self.num_secondary_samples_diff is not None:
            self.num_secondary_samples_diff *= self.sample_factor

    def _process_extra_losses(self):
        """trainer.py:305-335."""
        if self.slf_variate:
            self.extra_losses["material_surface_light_field"] = {
                "main": {"mult": 1.0, "start_frac": 0.0}
            }
            self.extra_losses.pop("surface_light_field", None)
        if self.use_geometry_smoothness:
            if not self.use_material:
                self.extra_losses["geometry_smoothness"] = {
                    "main": {"mult": 1.0, "start_frac": 0.0}
                }
            elif "from_scratch" in self.stage:
                self.extra_losses["geometry_smoothness"] = {
                    "cache_main": {"mult": 1.0, "start_frac": 0.0}
                }
        if self.use_material:
            self.extra_losses["direct_indirect_consistency"] = {
                "main": {
                    "mult": self.cache_consistency_loss_weight,
                    "start_frac": 0.0,
                }
            }

    def _process_opt_params(self):
        """Scale per-module lr overrides; select _material entries; freeze
        modules the stage doesn't optimize (trainer.py:337-418)."""
        out = {}
        for mod, params in (self.extra_opt_params or {}).items():
            p = dict(params)
            for k in list(p):
                if k.startswith("lr_init") or k.startswith("lr_final"):
                    p[k] = (p[k] / self.scale_factor) * self.lr_factor
                elif k.startswith("lr_delay_steps"):
                    p[k] = (p[k] * self.scale_factor) // self.train_length_mult
            out[mod] = p
        self.extra_opt_params = out

        if self.use_material and ("from_scratch" not in self.stage):
            for p in self.extra_opt_params.values():
                for k in ("lr_delay_steps", "lr_init", "lr_final"):
                    if f"{k}_material" in p:
                        p[k] = p[f"{k}_material"]

        def disable(keys):
            for k in keys:
                self.extra_opt_params[k] = {
                    "lr_delay_steps": 0,
                    "lr_final": 0.0,
                    "lr_init": 0.0,
                }

        if self.calib_checkpoint and not self.optimize_calib_on_load:
            disable(["VignetteMap"])
        if not self.optimize_geometry:
            disable(["Sampler", "MLP_1", "MLP_2", "density_grid"])
        if "finetune" in self.stage:
            self.param_regularizers = None
            self.finetune_cache = True
            self.cache_consistency_loss_weight *= self.finetune_multiplier
            disable([
                "Sampler", "MLP_1", "MLP_2", "density_grid",
                "MaterialShader", "VignetteMap", "LightSource",
            ])
        if not self.optimize_cache:
            disable(["Cache", "SurfaceLightField", "PersonLightField"])
        if not self.optimize_light:
            disable(["LightSampler"])
        if not self.optimize_surface_light_field:
            disable(["SurfaceLightFieldMem"])

    def _setup_binding_configs(self):
        """Synthesize stage bindings and rebuild the Config (trainer.py:420-502)."""
        self._process_extra_losses()
        self._process_opt_params()

        b = [
            f"Config.max_steps = {self.max_steps}",
            f"Config.batch_size = {self.batch_size}",
            f"Config.grad_accum_steps = {self.grad_accum_steps}",
            f"Config.lr_init = {self.lr_init}",
            f"Config.lr_final = {self.lr_final}",
            f"Config.lr_delay_steps = {self.lr_delay_steps}",
# (extra_opt_params / extra_losses / param_regularizers are bound
            # directly below: they can hold function objects — e.g.
            # @jnp.mean inside param_regularizers — whose repr() does not
            # round-trip through the gin parser.)
            f"Config.finetune_cache = {self.finetune_cache}",
            f"Config.cache_consistency_loss_type = {self.cache_consistency_loss_type!r}",
            f"Config.cache_consistency_loss_weight = {self.cache_consistency_loss_weight}",
            f"Config.use_occlusions = {self.use_occlusions}",
            f"Config.occlusions_secondary_only = {self.occlusions_secondary_only}",
            f"Config.occlusions_primary_only = {self.occlusions_primary_only}",
            f"Config.light_near = {self.light_near}",
            f"{self.material_model_name}.use_material = {self.use_material}",
            f"{self.material_model_name}.use_light_sampler = {self.use_light_sampler}",
            f"{self.material_model_name}.use_surface_light_field = {self.use_surface_light_field}",
            f"ProposalVolumeSampler.anneal_slope = {self.anneal_slope}",
        ]
        if self.use_material:
            b.append("Config.model_type = %ModelType.MATERIAL")
            b.append("Config.is_material = True")
        if self.vis_only:
            if self.vis_only or not self.use_material:
                b.append(f"Config.test_factor = {self.factor}")
            else:
                b.append(f"Config.test_factor = {self.factor * 2}")
        if self.use_material and "from_scratch" not in self.stage:
            pn = self._query("Config.predicted_normal_loss_mult", 0.0)
            pnr = self._query("Config.predicted_normal_reverse_loss_mult", 0.0)
            b += [
                "Config.occ_threshold_start_frac = 0.0",
                "Config.occ_threshold_rate = 0.0",
                "Config.shadow_near_start_frac = 0.0",
                "Config.shadow_near_rate = 0.0",
                f"{self.material_mlp_name}.near_start_frac = 0.0",
                f"{self.material_mlp_name}.near_rate = 0.0",
                "Config.use_normal_weight_ease = False",
                "Config.use_normal_weight_ease_backward = False",
                "Config.use_material_weight_ease = False",
                "Config.use_consistency_weight_ease = False",
                "Config.use_surface_light_field_weight_ease = False",
                f"Config.interlevel_loss_mults = {tuple(self.material_interlevel_loss_mults)!r}",
                f"Config.predicted_normal_loss_mult = {pn * self.material_predicted_normal_loss_mult}",
                f"Config.predicted_normal_reverse_loss_mult = {pnr * self.material_predicted_normal_loss_mult}",
            ]
        if self.stopgrad_cache_geometry:
            b += [
                f"{self.nerf_model_name}.stopgrad_geometry_weight = "
                f"{self._query('Config.stopgrad_cache_geometry_weight', 0.0)}",
                f"{self.nerf_model_name}.stopgrad_geometry_feature_weight = "
                f"{self._query('Config.stopgrad_cache_geometry_feature_weight', 1.0)}",
                f"{self.nerf_model_name}.stopgrad_geometry_normals_weight = "
                f"{self._query('Config.stopgrad_cache_geometry_normals_weight', 1.0)}",
            ]
        if self.stopgrad:
            b += [
                f"{self.material_mlp_name}.stopgrad_rays = True",
                f"{self.material_mlp_name}.stopgrad_samples = True",
                "Config.cache_consistency_stopgrad_weight_cache = 0.0",
            ]
        if self.resample_render:
            b.append(f"{self.material_model_name}.resample_render = True")
        if self.resample:
            b += [
                f"{self.material_model_name}.resample = {self.resample}",
                f"{self.material_model_name}.num_resample = {self.num_resample}",
                f"{self.material_model_name}.use_resample_depth = {self.resample_depth}",
            ]
        if self.render_chunk_size is not None:
            b.append(f"Config.render_chunk_size = {self.render_chunk_size}")
        if self.surface_light_field_loss_far is not None:
            b.append(
                f"Config.surface_light_field_loss_far = {self.surface_light_field_loss_far}"
            )
        if self.surface_light_field_loss_radius is not None:
            b.append(
                f"Config.surface_light_field_loss_radius = "
                f"{self.surface_light_field_loss_radius}"
            )
        if self.slf_variate is not None:
            b.append(f"{self.material_model_name}.slf_variate = {self.slf_variate}")
        if self.num_secondary_samples is not None:
            b += [
                f"{self.material_mlp_name}.num_secondary_samples = {self.num_secondary_samples}",
                f"{self.material_mlp_name}.render_num_secondary_samples = "
                f"{self.num_secondary_samples_render}",
            ]
            if self.num_secondary_samples_diff is not None:
                b += [
                    f"{self.material_mlp_name}.num_secondary_samples_diff = "
                    f"{self.num_secondary_samples_diff}",
                    f"{self.material_mlp_name}.render_num_secondary_samples_diff = "
                    f"{self.num_secondary_samples_diff_render}",
                ]
        if self.num_surface_light_field_samples is not None:
            b.append(
                f"Config.num_surface_light_field_samples = "
                f"{self.num_surface_light_field_samples}"
            )
        if not self.optimize_cache:
            b.append(f"{self.material_mlp_name}.enable_normals_offset = False")

        self.bindings = b
        gin.parse_config("\n".join(b))
        # Object-valued bindings (may contain function references).
        gin.bind("Config", "extra_opt_params", self.extra_opt_params)
        gin.bind("Config", "extra_losses", self.extra_losses)
        if self.param_regularizers is not None:
            gin.bind("Config", "param_regularizers", self.param_regularizers)
        self.config = configs_lib.Config()
        if self.config.checkpoint_dir:
            os.makedirs(self.config.checkpoint_dir, exist_ok=True)
            with open(os.path.join(self.config.checkpoint_dir, "config.gin"), "w") as f:
                f.write(gin.operative_config_str())

    def _setup_rng(self):
        from jax import random

        self.rng = random.PRNGKey(self.config.jax_rng_seed)
        self.render_rng = random.PRNGKey(self.config.jax_rng_seed + 1)
        np.random.seed(self.config.np_rng_seed + jax.process_index())

    def _load_datasets(self):
        config = self.config
        if config.y_up and config.light_source_position is not None:
            p = config.light_source_position
            config.light_source_position = [p[1], p[0], p[2]]
        self.dataset = datasets.load_dataset("train", config.data_dir, config)
        self.test_dataset = datasets.load_dataset("test", config.data_dir, config)

        exposure = getattr(self.test_dataset, "exposure", 1.0) or 1.0
        if config.clip_eval:
            self.postprocess_fn = lambda x: np.clip(
                image_lib.linear_to_srgb(x * exposure), 0.0, 1.0
            )
        else:

            def p_fn(x):
                if len(x.shape) == 4:  # transient [H, W, T, C] -> integrate time
                    x = x.sum(-2)
                    x = np.clip(x / config.img_scale, 0, 1)
                if x.shape[-1] == 1:
                    x = np.tile(x, (1,) * (len(x.shape) - 1) + (3,))
                return image_lib.linear_to_srgb(x * exposure)

            self.postprocess_fn = p_fn

    def _setup_model(self):
        key, self.rng = jax.random.split(self.rng)
        self.mesh = mesh_lib.create_mesh()
        (
            self.model,
            self.state,
            self.render_eval_fn,
            self.train_step,
            self.lr_fn,
        ) = train_lib.setup_model(self.config, key, dataset=self.dataset, mesh=self.mesh)

        self.metric_harness = image_lib.MetricHarness(
            **(self.config.metric_harness_train_config or {})
        )

        if (
            "finetune" not in self.stage
            and self.use_material
            and self.config.partial_checkpoint_dir
            and not self.vis_only
        ):
            self.exclude_prefixes += ["params/MaterialShader"]
        if (
            "finetune" in self.stage
            and self.config.sl_relight
            and self.config.partial_checkpoint_dir
            and not self.vis_only
        ):
            self.exclude_prefixes += ["params/LightSampler"]

    def _state_tree(self):
        return {
            "step": np.asarray(self.state.step),
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
        }

    def _setup_checkpointing(self):
        config = self.config
        self.save_dir = (
            os.path.join(config.checkpoint_dir, "save") if config.checkpoint_dir else None
        )

        if config.partial_checkpoint_dir:
            source = ckpt_lib.load_params(config.partial_checkpoint_dir)
            if source is not None:
                self.state = train_lib.restore_partial_checkpoint(
                    self.state,
                    source["params"],
                    prefixes=self.prefixes,
                    exclude_prefixes=tuple(self.exclude_prefixes),
                    replace_dict=self.replace_dict,
                )
        elif config.checkpoint_dir and ckpt_lib.latest_checkpoint_step(
            config.checkpoint_dir
        ) is not None:
            # Restore with the live state as the structure target so orbax
            # rebuilds tuples/None exactly (a bare restore returns lists).
            tree = ckpt_lib.restore_checkpoint(config.checkpoint_dir, self._state_tree())
            self.state = self.state.replace(
                step=jnp.asarray(tree["step"]),
                params=jax.tree_util.tree_map(jnp.asarray, tree["params"]),
                opt_state=jax.tree_util.tree_map(
                    lambda x: jnp.asarray(x) if x is not None else None,
                    tree["opt_state"],
                    is_leaf=lambda x: x is None,
                ),
            )

        if config.calib_checkpoint:
            source = ckpt_lib.load_params(config.calib_checkpoint)
            if source is not None:
                self.state = train_lib.restore_partial_checkpoint(
                    self.state,
                    source["params"],
                    prefixes=None,
                    exclude_prefixes=tuple(self.exclude_prefixes),
                    replace_dict={"params/VignetteMap": "params/VignetteMap"},
                )

    def _initialize_metrics(self):
        self.albedo_ratio = None
        self.metric_list = {
            k: []
            for k in (
                "albedo_psnr", "psnr", "mae", "transient_iou",
                "l1_median", "l1_mean", "lpips", "ssim",
            )
        }

    # --- checkpoint/save ----------------------------------------------------------

    def save_checkpoint(self, step, blocking=True):
        if not self.config.checkpoint_dir:
            return
        ckpt_lib.save_checkpoint(
            self.config.checkpoint_dir, self._state_tree(), step,
            blocking=blocking)

    # --- eval -----------------------------------------------------------------

    def render_test_view(self, cam_idx, train_frac):
        """Render one held-out view; returns (rendering dict, gt batch)."""
        batch = self.test_dataset.generate_ray_batch(cam_idx)
        if isinstance(batch.rays, pytrees.Pixels):
            # cast_rays_in_train_step mode ships Pixels; eval casts host-side
            # without jitter (reference trainer.py:1226-1234).
            from neural_radiance_caching_tpu.data import camera_utils

            ds = self.test_dataset
            rays = camera_utils.cast_ray_batch(
                ds.cameras, ds.lights, batch.rays, xnp=np,
                impulse_response=ds.impulse_response,
                virtual_cameras=(
                    None
                    if ds.virtual_camtoworlds is ds.camtoworlds
                    else (ds.pixtocams, ds.virtual_camtoworlds)
                ),
            )
            batch = batch.replace(rays=rays)
        H, W = self.test_dataset.height, self.test_dataset.width
        rendering = renderer.render_image(
            self.render_eval_fn,
            self.state.params,
            batch.rays,
            self.render_rng,
            self.config,
            height=H,
            width=W,
            train_frac=train_frac,
            render_repeats=self.render_repeats,
        )
        return rendering, batch

    # --- secondary visualization probe (trainer.py:848-1069, 1991-2052) -------

    def _probe_resolution(self):
        h, w = self.test_dataset.height, self.test_dataset.width
        return min(256, h), min(512, w * 2)

    def render_secondary_rays(self, rays, distance_median, normals, select_x,
                              select_y, train_frac):
        """Panoramic probe: render what the cache sees from one surface point.

        Takes the median-depth surface point under pixel (select_x, select_y),
        offsets it along the surface normal, and renders a full equirect view
        from there with passes ("cache", "light", "is_secondary") — the
        reference's key material-stage debugging tool (trainer.py:848-922).
        """
        from neural_radiance_caching_tpu.data import camera_utils
        from neural_radiance_caching_tpu.ops import render_utils

        H, W = self.test_dataset.height, self.test_dataset.width
        light_h, light_w = self._probe_resolution()
        _, _, light_xyz, _ = render_utils.get_sphere_directions(
            light_h, light_w, flip=self.config.flip_secondary
        )
        light_xyz = np.asarray(light_xyz)

        origins = np.asarray(rays.origins).reshape(H, W, 3)[select_y, select_x]
        dirs = np.asarray(rays.directions).reshape(H, W, 3)[select_y, select_x]
        depth = np.asarray(distance_median).reshape(H, W)[select_y, select_x]
        normal = np.asarray(normals).reshape(H, W, 3)[select_y, select_x]
        position = origins + dirs * depth + 4e-1 * normal

        cam_to_world = np.eye(4, dtype=np.float32)
        cam_to_world[:3, -1] = position

        secondary_rays = camera_utils.cast_spherical_rays(
            cam_to_world,
            light_h,
            light_w,
            self.config.near,
            self.config.secondary_far,
            light_idx=int(np.asarray(rays.light_idx).reshape(-1)[0]),
        )

        # Override directions with the probe's equirect direction grid and
        # copy the primary camera's frame fields so shaders see a consistent
        # camera (reference _update_secondary_rays, trainer.py:925-1025).
        first = lambda a, d: np.asarray(a).reshape(-1, d)[0]
        fill = lambda ref, vec: np.broadcast_to(
            np.asarray(vec, np.float32), np.asarray(ref).shape
        )
        secondary_rays = dataclasses.replace(
            secondary_rays,
            directions=light_xyz.reshape(secondary_rays.directions.shape),
            viewdirs=light_xyz.reshape(secondary_rays.viewdirs.shape),
            lights=fill(secondary_rays.lights, first(rays.lights, 3)),
            imageplane=fill(secondary_rays.imageplane, first(rays.imageplane, 2)),
            look=fill(secondary_rays.look, first(rays.look, 3)),
            up=fill(secondary_rays.up, first(rays.up, 3)),
            cam_origins=fill(secondary_rays.cam_origins, first(rays.cam_origins, 3)),
            vcam_look=fill(secondary_rays.vcam_look, first(rays.look, 3)),
            vcam_up=fill(secondary_rays.vcam_up, first(rays.up, 3)),
            vcam_origins=fill(
                secondary_rays.vcam_origins, first(rays.cam_origins, 3)
            ),
        )
        flat_rays = jax.tree_util.tree_map(
            lambda x: None
            if x is None
            else np.asarray(x).reshape((-1,) + np.asarray(x).shape[2:]),
            secondary_rays,
        )

        if getattr(self, "_render_secondary_fn", None) is None:
            passes = ("cache", "light", "is_secondary")
            if self.vis_surface_light_field:
                passes = passes + ("surface_light_field_vis",)
            self._render_secondary_fn = train_lib.create_render_fn(
                self.model, mesh=self.mesh, passes=passes
            )
        return renderer.render_image(
            self._render_secondary_fn,
            self.state.params,
            flat_rays,
            self.render_rng,
            self.config,
            height=light_h,
            width=light_w,
            train_frac=train_frac,
        )

    def render_vmf(self, rendering, select_x, select_y):
        """Equirect image of the light sampler's vMF mixture at one pixel
        (trainer.py:1026-1069). Needs a rendering made with the
        "light_sampler_vis" pass; returns None if the keys are absent."""
        from neural_radiance_caching_tpu.ops import render_utils

        if "vmf_means" not in rendering:
            return None
        light_h, light_w = self._probe_resolution()
        _, _, light_xyz, _ = render_utils.get_sphere_directions(
            light_h, light_w, flip=self.config.flip_secondary
        )
        means = np.asarray(rendering["vmf_means"])[select_y, select_x]
        means = means / np.maximum(
            np.linalg.norm(means, axis=-1, keepdims=True), 1e-5
        )
        kappas = np.asarray(rendering["vmf_kappas"])[select_y, select_x, ..., 0]
        weights = np.exp(np.asarray(rendering["vmf_logits"])[select_y, select_x, ..., 0])
        weights = weights / weights.sum(-1, keepdims=True)
        density = np.sum(
            weights
            * np.asarray(
                render_utils.eval_vmf(
                    np.asarray(light_xyz)[..., None, :], means, kappas
                )
            ),
            axis=-1,
        ).reshape(light_h, light_w, 1)
        return np.asarray(
            image_lib.linear_to_srgb(np.repeat(density, 3, axis=-1))
        )

    def _visualize_secondary(self, step, rendering, rays, train_frac):
        """Run the probe + vMF vis and save PNGs (trainer.py:1991-2052)."""
        if "distance_median" not in rendering:
            return
        normals_key = (
            "normals_to_use" if "normals_to_use" in rendering else "normals"
        )
        if normals_key not in rendering:
            return
        H, W = self.test_dataset.height, self.test_dataset.width
        select_x = int(np.round(W * 0.3))
        select_y = int(np.round(H * 0.6))
        secondary = self.render_secondary_rays(
            rays,
            rendering["distance_median"],
            rendering[normals_key],
            select_x,
            select_y,
            train_frac,
        )
        suite = (
            vis_lib.visualize_transient_suite
            if self.use_transient
            else vis_lib.visualize_suite
        )
        vis = suite(secondary, self.config)
        if self.save_dir and self.save_results:
            out_dir = os.path.join(self.save_dir, "secondary")
            os.makedirs(out_dir, exist_ok=True)
            vis_lib.save_vis_suite(vis, out_dir, step)
        vmf_img = self.render_vmf(rendering, select_x, select_y)
        if vmf_img is not None and self.save_dir and self.save_results:
            out_dir = os.path.join(self.save_dir, "vmf")
            os.makedirs(out_dir, exist_ok=True)
            vis_lib.save_img_u8(vmf_img, os.path.join(out_dir, f"{step:06d}.png"))
        return secondary

    def log_test_set_evaluation(self, step, train_frac):
        cam_idx = step % self.test_dataset.num_images
        t0 = time.time()
        rendering, batch = self.render_test_view(cam_idx, train_frac)
        H, W = self.test_dataset.height, self.test_dataset.width
        metrics = self._compute_eval_metrics(rendering, batch, H, W)
        for k, v in metrics.items():
            if k in self.metric_list:
                self.metric_list[k].append(float(v))

        if self.save_dir and self.save_results:
            os.makedirs(self.save_dir, exist_ok=True)
            suite = (
                vis_lib.visualize_transient_suite
                if self.use_transient
                else vis_lib.visualize_suite
            )
            vis = suite(rendering, self.config, vis_material=self.use_material)
            vis_lib.save_vis_suite(vis, self.save_dir, step)
            if "rgb" in rendering:
                d = os.path.join(self.save_dir, "color")
                os.makedirs(d, exist_ok=True)
                np.save(os.path.join(d, f"{step:06d}.npy"), rendering["rgb"])
            if self.use_transient and "cache_rgb" in rendering:
                self._save_transient_h5(rendering, step)
        if self.vis_secondary:
            self._visualize_secondary(step, rendering, batch.rays, train_frac)
        print(
            f"eval step={step} cam={cam_idx} "
            + " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
            + f" ({time.time() - t0:.1f}s)",
            flush=True,
        )
        return metrics

    def _compute_eval_metrics(self, rendering, batch, H, W):
        """PSNR/SSIM + normal MAE, depth L1, albedo PSNR, transient IoU
        (trainer.py:1427-1866)."""
        config = self.config
        metrics = {}
        gt = np.asarray(batch.rgb)
        gt = gt.reshape((H, W) + gt.shape[1:])

        if "rgb" in rendering:
            pred = self.postprocess_fn(np.asarray(rendering["rgb"]))
            gt_pp = self.postprocess_fn(gt)
            if gt_pp.shape == pred.shape:
                metrics.update(self.metric_harness(pred, gt_pp))
                if config.use_shift_invariance and pred.ndim == 3:
                    # Best-shift PSNR over an integer-pixel search window
                    # (image.py:70-191): robust to slight camera miscalib.
                    radius = max(
                        abs(config.shift_invariant_start),
                        abs(config.shift_invariant_end),
                    )
                    si_mse, _, _ = image_lib.shift_invariant_mse(
                        pred, gt_pp, (radius, radius), 2
                    )
                    metrics["psnr_shift_invariant"] = float(
                        -10.0 * np.log10(float(si_mse) + 1e-12)
                    )

        masks = (
            np.asarray(batch.masks).reshape(H, W, -1)[..., :1]
            if batch.masks is not None
            else np.ones((H, W, 1), np.float32)
        )

        # Normal mean angular error (trainer.py:1801-1866).
        if batch.normals is not None and (
            "normals" in rendering or "normals_to_use" in rendering
        ):
            normals_gt = np.asarray(batch.normals).reshape(-1, 3)
            normals_gt = normals_gt + (1.0 - masks.reshape(-1, 1))
            norm = np.linalg.norm(normals_gt, axis=-1, keepdims=True)
            normals_gt = np.where(norm < 1e-5, 0.0, normals_gt / np.maximum(norm, 1e-12))
            key = "normals" if config.material_normals_target == "normals" else (
                "normals_to_use" if "normals_to_use" in rendering else "normals"
            )
            acc = np.asarray(rendering.get("acc", np.ones((H, W)))).reshape(-1, 1)
            normals = np.asarray(rendering[key]).reshape(-1, 3) + (1.0 - acc)
            norm = np.linalg.norm(normals, axis=-1, keepdims=True)
            normals = np.where(norm < 1e-5, 0.0, normals / np.maximum(norm, 1e-12))
            angles = np.arccos(
                np.clip(np.sum(normals_gt * normals, axis=-1), -1, 1)
            ) * 180 / np.pi
            if config.evaluate_without_masks:
                metrics["mae"] = float(np.mean(angles))
            else:
                metrics["mae"] = float(np.mean(angles * masks.reshape(-1)))

        # Depth L1 (trainer.py:1756-1799).
        if (
            config.compute_depth_metrics
            and batch.depth is not None
            and "distance_mean" in rendering
        ):
            depth_gt = np.asarray(batch.depth).reshape(H, W)
            for key, name in (("distance_median", "l1_median"),
                              ("distance_mean", "l1_mean")):
                if key not in rendering:
                    continue
                l1 = np.abs(np.asarray(rendering[key]).reshape(H, W) - depth_gt)
                if config.evaluate_without_masks:
                    metrics[name] = float(np.mean(l1))
                else:
                    metrics[name] = float(
                        (l1 * masks[..., 0]).sum() / masks.sum()
                    )

        # Albedo PSNR with a global color calibration (trainer.py:1499-1582):
        # self.albedo_ratio is the run-level median/lstsq ratio computed by
        # _compute_albedo_ratio in vis_only mode; the per-image lstsq is the
        # online fallback during training-time eval.
        if batch.albedos is not None and "material_albedo" in rendering:
            albedo_gt = np.asarray(batch.albedos).reshape(-1, 3)
            albedo = np.clip(
                np.asarray(rendering["material_albedo"]).reshape(-1, 3),
                0.0, self.albedo_clip,
            )
            m = masks.reshape(-1) > 0.5
            if m.any():
                if self.albedo_ratio is None:
                    num = (albedo_gt[m] * albedo[m]).sum(axis=0)
                    den = np.maximum((albedo[m] ** 2).sum(axis=0), 1e-8)
                    ratio = (num / den).reshape(1, 3)
                else:
                    ratio = self.albedo_ratio
                calibrated = np.clip(albedo * ratio, 0.0, 1.0)
                mse = np.mean((calibrated[m] - np.clip(albedo_gt[m], 0, 1)) ** 2)
                metrics["albedo_psnr"] = float(-10.0 * np.log10(mse + 1e-12))

        # Transient IoU (trainer.py:1626-1647).
        if config.use_transient and "cache_rgb" in rendering and gt.ndim == 4:
            pred_t = np.nan_to_num(np.asarray(rendering["cache_rgb"]))
            gt_t = gt[..., :3]
            if pred_t.shape == gt_t.shape:
                inter = np.minimum(pred_t, gt_t).sum()
                union = np.maximum(pred_t, gt_t).sum()
                metrics["transient_iou"] = float(inter / max(union, 1e-12))
        return metrics

    def _save_transient_h5(self, rendering, step):
        import h5py

        d = os.path.join(self.save_dir, "transients")
        os.makedirs(d, exist_ok=True)
        transient = np.nan_to_num(np.asarray(rendering["cache_rgb"]))
        with h5py.File(os.path.join(d, f"{step:06d}.h5"), "w") as f:
            f.create_dataset("data", data=transient, dtype="f")
        self._save_transient_time_slice(transient, step)

    def _save_transient_time_slice(self, transient, step):
        """One time-bin slice per eval view, scrubbing bins
        transient_start_idx → transient_end_idx over the sequence
        (reference trainer.py:1698-1750)."""
        if transient.ndim < 4:
            return
        n_bins = transient.shape[-2]
        total = max(self.test_dataset.num_images, 1)
        frac = (step % total) / float(total)
        t = self.config.transient_start_idx + frac * (
            min(self.config.transient_end_idx, n_bins - 1)
            - self.config.transient_start_idx
        )
        t0, t1 = int(np.floor(t)), min(int(np.ceil(t)), n_bins - 1)
        w = t - t0
        sl = transient[..., t0, :] * (1 - w) + transient[..., t1, :] * w
        d = os.path.join(self.save_dir, "cache_time_slice")
        os.makedirs(d, exist_ok=True)
        peak = float(np.max(sl) + 1e-12)
        vis_lib.save_img_u8(sl / peak, os.path.join(d, f"{step:06d}.png"))

    # --- train -----------------------------------------------------------------

    def train(self):
        if self.viewer_only:
            # Serve the interactive viewer over the restored checkpoint
            # instead of training (the reference declares this flag but
            # never consumes it; here it drives engine/viewer.py).
            from neural_radiance_caching_tpu.engine import viewer as viewer_lib

            viewer_lib.HttpViewer(self).serve_forever(background=False)
            return
        if self.config.disable_pmap_and_jit:
            # Single-device determinism escape hatch (reference
            # trainer.py:595-596 via chex.fake_pmap_and_jit): run the whole
            # loop eagerly so python debuggers/prints work inside the step.
            with jax.disable_jit():
                return self._train_impl()
        return self._train_impl()

    def _train_impl(self):
        config = self.config
        self.state = mesh_lib.replicate(self.state, self.mesh)

        num_steps = (
            config.early_exit_steps
            if config.early_exit_steps is not None
            else self.max_steps
        )
        raybatcher = mesh_lib.DevicePrefetcher(
            datasets.RayBatcher(self.dataset), self.mesh
        )
        rng = jax.random.fold_in(self.rng, jax.process_index())

        init_step = int(jax.device_get(self.state.step)) // self.grad_accum_steps + 1

        if self.vis_only:
            self._run_visualization_only()
            return

        stats_buffer = []
        t_start = time.time()
        log_path = (
            os.path.join(config.checkpoint_dir, "train_log.jsonl")
            if config.checkpoint_dir
            else None
        )

        batch = None
        profiling = False
        for step in range(init_step, num_steps + 1):
            if config.profile_dir:
                if step == config.profile_start_step and not profiling:
                    jax.profiler.start_trace(config.profile_dir)
                    profiling = True
                elif profiling and step == (
                    config.profile_start_step + config.profile_num_steps
                ):
                    jax.profiler.stop_trace()
                    profiling = False
            for s in range(self.grad_accum_steps):
                # Device batches arrive from the prefetch thread (transfer of
                # batch N+1 overlaps step N); with secondary accumulation the
                # same batch feeds several consecutive secondary-ray draws
                # (reference trainer.py:2113-2119).
                if batch is None or s % self.secondary_grad_accum_steps == 0:
                    batch = next(raybatcher)
                cur_step = step - 1
                train_frac = float(np.clip(cur_step / max(1, self.max_steps - 1), 0, 1))
                with jax.profiler.StepTraceAnnotation(
                    "train", step_num=step * self.grad_accum_steps + s
                ):
                    self.state, stats = self.train_step(
                        rng, self.state, batch, train_frac
                    )

            if step % config.gc_every == 0:
                gc.collect()

            if step == 1 or step % config.checkpoint_every == 0:
                # Async: training resumes as soon as the state is on host;
                # the directory write rides a background thread.
                self.save_checkpoint(step, blocking=False)

            stats_buffer.append(stats)
            if step == init_step or step % config.print_every == 0:
                # ONE host fetch per print interval: stats stay on device
                # between prints (device->host sync is the expensive part
                # under a tunneled runtime).
                host_stats = [
                    jax.tree_util.tree_map(lambda x: np.asarray(x), s)
                    for s in stats_buffer
                ]
                loss = float(np.mean([s["loss"] for s in host_stats]))
                steps_done = len(stats_buffer) * self.grad_accum_steps
                dt = time.time() - t_start
                rays_per_sec = self.batch_size * steps_done / max(dt, 1e-6)
                line = {
                    "step": step,
                    "loss": loss,
                    "rays_per_sec": rays_per_sec,
                    "lr": float(self.lr_fn(step)),
                }
                for k, v in host_stats[-1]["losses"].items():
                    line[f"loss/{k}"] = float(np.mean(v))
                print(
                    f"step={step}/{num_steps} loss={loss:.5f} "
                    f"rays/sec={rays_per_sec:.0f}",
                    flush=True,
                )
                if log_path:
                    with open(log_path, "a") as f:
                        f.write(json.dumps(line) + "\n")
                stats_buffer = []
                t_start = time.time()

            if (
                config.train_render_every > 0
                and step % config.train_render_every == 0
                and not config.no_vis
            ):
                self.log_test_set_evaluation(step, train_frac)

        self.save_checkpoint(num_steps)
        raybatcher.stop()

    def _compute_albedo_ratio(self, n_views):
        """Run-level albedo color calibration (reference trainer.py:2202-2240).

        Pre-pass over every 10th test view: collect masked (gt, pred) albedo
        pairs, then solve for a global per-channel ratio — the median of
        gt/pred, or a per-channel least-squares fit in gamma space (the
        reference's channel-zeroed block lstsq reduces to exactly this
        per-channel scalar solve).
        """
        gts, preds = [], []
        for idx in range(self.vis_start, n_views, 10):
            rendering, batch = self.render_test_view(idx, 1.0)
            if batch.albedos is None or "material_albedo" not in rendering:
                return
            gt = np.asarray(batch.albedos).reshape(-1, 3)
            pred = np.clip(
                np.asarray(rendering["material_albedo"]).reshape(-1, 3),
                0.0, self.albedo_clip,
            )
            if batch.masks is not None:
                m = np.asarray(batch.masks).reshape(-1, batch.masks.shape[-1])
                m = m[..., 0] > 0.5
                gt, pred = gt[m], pred[m]
            gts.append(gt)
            preds.append(pred)
        if not gts:
            return
        gt = np.concatenate(gts, axis=0)
        pred = np.concatenate(preds, axis=0)
        if self.albedo_correct_median:
            ratio = np.median(gt / np.clip(pred, 1e-6, 1.0), axis=0)
        else:
            if self.albedo_gamma:
                gt, pred = gt ** (1 / 2.2), pred ** (1 / 2.2)
            ratio = (gt * pred).sum(axis=0) / np.maximum(
                (pred ** 2).sum(axis=0), 1e-8
            )
            if self.albedo_gamma:
                ratio = ratio ** 2.2
        self.albedo_ratio = ratio.reshape(1, 3)
        if self.save_dir:
            np.save(os.path.join(self.save_dir, "albedo_ratio.npy"),
                    self.albedo_ratio)

    def _run_visualization_only(self):
        """Render the full test set, write metrics to results.txt
        (trainer.py:2168-2200)."""
        if self.save_dir:
            os.makedirs(self.save_dir, exist_ok=True)
        n_views = min(self.test_dataset.num_images, self.vis_end)
        if self.config.compute_albedo_metrics and self.albedo_ratio is None:
            self._compute_albedo_ratio(n_views)
        for idx in range(self.vis_start, n_views):
            self.log_test_set_evaluation(idx, 1.0)
        for k, v in self.metric_list.items():
            self.metric_list[k].append(sum(v) / len(v) if v else 0.0)
        if self.save_dir:
            with open(os.path.join(self.save_dir, "results.txt"), "w") as f:
                for key, values in self.metric_list.items():
                    f.write(f"{key}: {values}\n")
