"""On-chip material-stage convergence check (analogous to the cache-stage
31.6 dB check recorded in BASELINE.md).

Trains the flagship cache on the procedural spheres scene (known lambertian
BRDF, analytic GT albedo + normals), warm-starts the flagship material stage
from it via checkpoint surgery, trains the material stage, and reports:
  * albedo PSNR (per-channel lstsq color calibration, masked)
  * normal MAE in degrees (masked)
  * test-view PSNR of the material render

Usage: python scripts/material_convergence_check.py [cache_steps] [mat_steps]
    [--layout reference] [--analytic-normals] [--active]
    [--batch N] [--mat-batch N] [--res N] [--probe-dir DIR]
"""

import sys
import time

sys.path.insert(0, ".")

import jax

# --cpu: tiny-shape smoke runs on hosts where the TPU tunnel may be absent.
# (The JAX_PLATFORMS env var is overridden by sitecustomize on this image;
# the config update after import is the reliable knob.)
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import bench
from neural_radiance_caching_tpu.data import datasets
from neural_radiance_caching_tpu.engine import renderer
from neural_radiance_caching_tpu.engine.configs import Config
from neural_radiance_caching_tpu.parallel import mesh as mesh_lib
from neural_radiance_caching_tpu.parallel import train as train_lib
from neural_radiance_caching_tpu.utils import pytrees

def _int_flag(name, default):
    return (
        int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default
    )


def _str_flag(name, default=None):
    return sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default


_flag_values = {
    sys.argv[i + 1]
    for i, a in enumerate(sys.argv)
    if a.startswith("--") and i + 1 < len(sys.argv)
}
_args = [
    a
    for a in sys.argv[1:]
    if not a.startswith("--") and a != "reference" and a not in _flag_values
]
CACHE_STEPS = int(_args[0]) if len(_args) > 0 else 1200
MAT_STEPS = int(_args[1]) if len(_args) > 1 else 1000
# --layout reference: grids-on-all-levels (the reference default) for the
# quality A/B against the TPU-first flagship.
LAYOUT = "reference" if "--layout" in sys.argv else "flagship"
# --analytic-normals: compute density normals on the final level (the
# reference's default; second-order AD through the XLA encoder path) so the
# predicted-normal losses actually supervise normals_pred — without them
# those losses short-circuit to 0 and normals are only shaped indirectly.
ANALYTIC_NORMALS = "--analytic-normals" in sys.argv
# --active: point-light (active) shading in both stages — the procedural
# scene IS actively lit (albedo * (ambient + lambert)), so the active
# pipeline is the one under which albedo actually disentangles.
ACTIVE = "--active" in sys.argv
# --physical-scene: render the GT with the physically-consistent shading
# (inverse-square point light + sphere shadows + constant-env ambient —
# SyntheticSpheres shading="physical"), the rendering equation the material
# model actually implements. The legacy GT has no falloff and no shadows,
# which under-constrains albedo no matter how the model is configured.
PHYSICAL_SCENE = "--physical-scene" in sys.argv
# --multi-illum: each train/test view lit from a different azimuth (the
# light-stage setup; reference OpenIllumination datasets.py:3271-3410).
# Physical scene only. The single-light physical run leaves an albedo/
# shading split that any spatial factor consistent with the one
# illumination field can satisfy; varying the illuminant across views
# removes that freedom, so this is the lever for the albedo-PSNR rows.
MULTI_ILLUM = "--multi-illum" in sys.argv
# --glossy-scene: physical GT with per-sphere microfacet materials
# (SyntheticSpheres shading="physical_glossy": GGX D / Schlick F / Smith
# k=a/2 — the exact BRDF ops/render_utils.get_lobe evaluates), plus a GT
# roughness map, so the check also scores specular/roughness recovery —
# the NeRO-glossy axis of the reference's benchmarks. Implies physical.
GLOSSY_SCENE = "--glossy-scene" in sys.argv
PHYSICAL_SCENE = PHYSICAL_SCENE or GLOSSY_SCENE
_BASE_TAG = ("glossy" if GLOSSY_SCENE else "physical") if PHYSICAL_SCENE else "legacy"
SCENE_TAG = _BASE_TAG + ("_multi" if MULTI_ILLUM else "")

if ACTIVE:
    _orig_active_params = bench.flagship_cache_params

    def _cache_params_active(config):
        p = _orig_active_params(config)
        p["shader_params"] = dict(
            p["shader_params"], use_active=True, use_ambient=True
        )
        return p

    bench.flagship_cache_params = _cache_params_active

if ANALYTIC_NORMALS:
    _orig_cache_params = bench.flagship_cache_params

    def _cache_params_analytic(config):
        p = _orig_cache_params(config)
        levels = p["sampler_params"]["mlp_params_per_level"]
        final_mlp = dict(levels[2], disable_density_normals=False)
        p["sampler_params"]["mlp_params_per_level"] = (
            levels[0], levels[1], final_mlp,
        )
        return p

    bench.flagship_cache_params = _cache_params_analytic

# --proposal-width N: quality guard for the bench's --proposal-width A/B
# (narrower IPE proposal trunks; cache PSNR must hold for the perf number
# to count).
bench.PROPOSAL_WIDTH = _int_flag("--proposal-width", bench.PROPOSAL_WIDTH)
# --secondary-level-clamp K: quality guard for the secondary-ray LOD A/B
# (fine hash levels skipped for secondary cache queries; material PSNR /
# albedo / normal MAE must hold for the perf number to count). Clamp 6 is
# the bench default since its guard passed; K=0 forces the full pyramid,
# omitting the flag inherits the bench default.
_slc = _int_flag("--secondary-level-clamp", -1)
if _slc == 0:
    bench.SECONDARY_LEVEL_CLAMP = None
elif _slc > 0:
    bench.SECONDARY_LEVEL_CLAMP = _slc

# --primary-level-clamp K: quality guard for the primary-ray LOD A/B (the
# cache-stage scatter-count lever; see bench.PRIMARY_LEVEL_CLAMP).
_plc = _int_flag("--primary-level-clamp", -1)
if _plc > 0:
    bench.PRIMARY_LEVEL_CLAMP = _plc

# --roughness-bias B: overrides the MaterialMLP roughness head bias (the
# reference's 3.0 initializes GGX alpha at softplus(3)~=3.05, far above any
# physical alpha in [0,1]; on short glossy runs the render loss is satisfied
# before alpha descends — see the BASELINE glossy row). A/B knob only: the
# default stays at reference parity.
ROUGHNESS_BIAS = (
    float(sys.argv[sys.argv.index("--roughness-bias") + 1])
    if "--roughness-bias" in sys.argv else None
)

# --planes-min-points N: override the plane-vs-leveled scatter backward
# switchover (bisect knob for the material batch-1024 kernel fault, which
# sits exactly at the default 2^20 fan-out boundary).
if "--planes-min-points" in sys.argv:
    from neural_radiance_caching_tpu.ops import hashgrid as _hashgrid

    _hashgrid.set_planes_min_points(
        int(sys.argv[sys.argv.index("--planes-min-points") + 1])
    )

# --force-xla-encoder: drop every Pallas kernel from the encoder (XLA
# gathers + XLA scatter backward). Bisect probe: if the batch-1024 fault
# persists here, it is not in our kernels at all.
if "--force-xla-encoder" in sys.argv:
    from neural_radiance_caching_tpu.ops import hashgrid as _hashgrid

    _hashgrid.force_xla_encoder(True)

# --light-canonical: condition the indirect nets on azimuth-invariant light
# features in the surface frame (Config.light_canonical_frame) — the
# relight-generalization lever for the multi-illum rows, where TEST views
# carry novel light azimuths (BASELINE.md round-3 physical multi-illum row).
LIGHT_CANONICAL = "--light-canonical" in sys.argv
# --views N: number of training views (multi-illum rows double azimuth
# density with --views 32: one azimuth per view).
NUM_VIEWS = _int_flag("--views", 16)

# Batch/resolution overrides make a tiny-shape CPU smoke of any flag combo
# possible before committing an hour of chip time to it.
BATCH = _int_flag("--batch", 8192)
MAT_BATCH = _int_flag("--mat-batch", 768)
RES = _int_flag("--res", 128)
# --probe-dir DIR: after the material stage trains, emit the secondary-ray
# panorama + vMF visualization artifacts from the trained model through the
# Trainer's own probe methods (reference trainer.py:1991-2052).
PROBE_DIR = _str_flag("--probe-dir")
# --eval-dump DIR: save the scored pred/gt view arrays (defaults to
# <ckpt_root>/eval, set in main) for offline SSIM/LPIPS scoring.
EVAL_DUMP_DIR = _str_flag("--eval-dump")


def make_config(**overrides):
    base = dict(
        dataset_loader="synthetic_spheres",
        batch_size=BATCH,
        near=2.0,
        far=6.0,
        max_steps=max(CACHE_STEPS, 1),
        lr_init=0.01,
        lr_final=0.002,
        lr_delay_steps=100,
        lr_delay_mult=1e-8,
        adam_eps=1e-15,
        data_loss_type="charb",
        interlevel_loss_mults=(0.01, 0.01),
        interlevel_loss_blurs=(0.03, 0.003),
        distortion_loss_mult=0.01,
        predicted_normal_loss_mult=0.05,
        predicted_normal_reverse_loss_mult=0.05,
        mask_lossmult=False,
        linear_to_srgb=True,
        compute_albedo_metrics=True,
        compute_normal_metrics=True,
        render_chunk_size=8192,
        synthetic_spheres_shading=(
            "physical_glossy" if GLOSSY_SCENE
            else ("physical" if PHYSICAL_SCENE else "legacy")
        ),
        synthetic_spheres_multi_illum=MULTI_ILLUM,
        light_canonical_frame=LIGHT_CANONICAL,
    )
    base.update(overrides)
    return Config(**base)


def train_model(model, config, dataset, steps, rng, init_params=None, graft=None,
                ckpt_dir=None):
    import functools

    from neural_radiance_caching_tpu.utils import checkpoints as ckpt_lib

    mesh = mesh_lib.create_mesh()
    variables = jax.jit(functools.partial(model.init, train_frac=1.0, train=False))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), pytrees.dummy_rays(16)
    )
    state, _ = train_lib.create_optimizer(config, variables)
    if graft is not None:
        # Checkpoint surgery: pull the standalone-cache run's params into the
        # material model's Cache submodule (prefix rename put <- take).
        state = train_lib.restore_partial_checkpoint(
            state, graft, replace_dict={"params/Cache/": "params/"}
        )
    start_step = 0
    if ckpt_dir is not None:
        # Resume after interruptions (the axon tunnel flaps mid-run; an
        # hour of chip time must survive that). Data batches are freshly
        # drawn — fine for a convergence check.
        resume = ckpt_lib.latest_checkpoint_step(ckpt_dir)
        if resume is not None:
            state = ckpt_lib.restore_checkpoint(ckpt_dir, state)
            start_step = min(int(resume), steps)
            print(f"  resumed {ckpt_dir} at step {start_step}", flush=True)
    state = mesh_lib.replicate(state, mesh)
    train_step = train_lib.create_train_step(model, config, mesh=mesh)
    batcher = mesh_lib.DevicePrefetcher(datasets.RayBatcher(dataset), mesh)
    t0 = time.time()
    # Tunnel-flap insurance scaled to the run length: every 200 steps on the
    # short runs, ~50 saves max on full-budget (25k-step) campaigns.
    ckpt_every = max(200, steps // 50)
    log_every = max(100, steps // 100)
    for step in range(start_step, steps):
        batch = next(batcher)
        train_frac = step / max(1, steps - 1)
        state, stats = train_step(rng, state, batch, train_frac)
        if step % log_every == 0:
            loss = float(stats["loss"])
            print(f"  step {step}/{steps} loss={loss:.5f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if ckpt_dir is not None and step and step % ckpt_every == 0:
            ckpt_lib.save_checkpoint(ckpt_dir, state, step)
    if ckpt_dir is not None and steps > start_step:
        ckpt_lib.save_checkpoint(ckpt_dir, state, steps)
    batcher.stop()
    return state


def eval_material(model, config, state, test_ds, view=0, stage="material"):
    mesh = mesh_lib.create_mesh()
    render_fn = train_lib.create_render_fn(model, mesh=mesh)
    batch = test_ds.generate_ray_batch(view)
    H = W = RES
    rendering = renderer.render_image(
        render_fn, state.params, batch.rays, jax.random.PRNGKey(7), config,
        height=H, width=W, train_frac=1.0,
    )
    out = {}
    # LDR PSNR convention: clip BOTH sides — the glossy scene's specular
    # peaks are HDR (up to ~3.5), trained on unclipped by the HDR losses.
    gt = np.clip(np.asarray(batch.rgb).reshape(H, W, 3), 0, 1)
    pred = np.clip(np.asarray(rendering["rgb"]).reshape(H, W, 3), 0, 1)
    mse = np.mean((pred - gt) ** 2)
    out["psnr"] = -10 * np.log10(mse + 1e-12)

    # Dump the scored view so run_evaluation.py can add SSIM/LPIPS offline
    # (on CPU, after the chip run) without re-rendering — the quality rows
    # in BASELINE.md carry LPIPS from these dumps.
    if EVAL_DUMP_DIR:
        import os

        # Stage-namespaced: a cache-only check and a material check sharing a
        # ckpt root must not overwrite each other's scored views (ADVICE r4).
        dump = f"{EVAL_DUMP_DIR}/{stage}"
        os.makedirs(f"{dump}/pred", exist_ok=True)
        os.makedirs(f"{dump}/gt", exist_ok=True)
        np.save(f"{dump}/pred/{view:03d}.npy", pred)
        np.save(f"{dump}/gt/{view:03d}.npy", gt)

    mask = np.asarray(batch.masks).reshape(-1) > 0.5
    if "material_albedo" in rendering:
        albedo = np.asarray(rendering["material_albedo"]).reshape(-1, 3)[mask]
        albedo_gt = np.asarray(batch.albedos).reshape(-1, 3)[mask]
        num = (albedo_gt * albedo).sum(axis=0)
        den = np.maximum((albedo**2).sum(axis=0), 1e-8)
        cal = np.clip(albedo * (num / den), 0, 1)
        mse = np.mean((cal - np.clip(albedo_gt, 0, 1)) ** 2)
        out["albedo_psnr"] = -10 * np.log10(mse + 1e-12)

    rough_gt_maps = getattr(test_ds, "roughness_images", None)
    if "material_roughness" in rendering and rough_gt_maps is not None:
        r_pred = np.asarray(rendering["material_roughness"]).reshape(H * W, -1)
        r_pred = r_pred.mean(-1)[mask]
        r_gt = rough_gt_maps[view].reshape(-1)[mask]
        out["roughness_mae"] = float(np.mean(np.abs(r_pred - r_gt)))

    key = "normals_to_use" if "normals_to_use" in rendering else "normals"
    if key in rendering and batch.normals is not None:
        n_pred = np.asarray(rendering[key]).reshape(-1, 3)[mask]
        n_gt = np.asarray(batch.normals).reshape(-1, 3)[mask]
        n_pred = n_pred / np.maximum(np.linalg.norm(n_pred, axis=-1, keepdims=True), 1e-12)
        n_gt = n_gt / np.maximum(np.linalg.norm(n_gt, axis=-1, keepdims=True), 1e-12)
        ang = np.degrees(np.arccos(np.clip((n_pred * n_gt).sum(-1), -1, 1)))
        out["normal_mae_deg"] = float(np.mean(ang))
    return out


def emit_probe(model, config, state, test_ds, out_dir):
    """Secondary panorama + vMF artifacts via the Trainer's probe methods.

    Renders one test view with the light-sampler visualization pass, then
    drives Trainer._visualize_secondary unchanged (the SimpleNamespace shim
    pattern from tests/test_secondary_probe.py) so the saved artifacts come
    from exactly the code path `Trainer.vis_secondary` uses in training runs.
    """
    import types

    from neural_radiance_caching_tpu.engine import trainer as trainer_lib

    mesh = mesh_lib.create_mesh()
    render_fn = train_lib.create_render_fn(
        model, mesh=mesh,
        passes=("cache", "light", "material", "light_sampler_vis"),
    )
    batch = test_ds.generate_ray_batch(0)
    rendering = renderer.render_image(
        render_fn, state.params, batch.rays, jax.random.PRNGKey(7), config,
        height=RES, width=RES, train_frac=1.0,
    )
    shim = types.SimpleNamespace(
        model=model, config=config, state=state, mesh=mesh,
        render_rng=jax.random.PRNGKey(3),
        test_dataset=types.SimpleNamespace(height=RES, width=RES),
        vis_surface_light_field=False,
        use_transient=False,
        save_dir=out_dir, save_results=True,
        _render_secondary_fn=None,
    )
    for name in ("_probe_resolution", "render_secondary_rays", "render_vmf",
                 "_visualize_secondary"):
        setattr(shim, name,
                types.MethodType(getattr(trainer_lib.Trainer, name), shim))
    secondary = shim._visualize_secondary(0, rendering, batch.rays, 1.0)
    if secondary is None:
        print("[probe] SKIPPED: rendering lacks distance_median/normals",
              flush=True)
    else:
        print(f"[probe] artifacts under {out_dir} "
              f"(secondary keys: {sorted(secondary)[:6]}...)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = jax.random.PRNGKey(11)

    config = make_config()
    train_ds = datasets.SyntheticSpheres("train", None, config, num_images=NUM_VIEWS,
                                         resolution=RES)
    print(f"[cache] training {CACHE_STEPS} steps @ batch {BATCH}", flush=True)
    if LAYOUT == "reference":
        cache_model = bench.build_reference_layout_cache_model(config)
    else:
        cache_model = bench.build_flagship_cache_model(config)
    # Tag prefix v2: the flagship BRDF head fix (bench.FLAGSHIP_BRDF_HEAD,
    # sigmoid roughness) changes the material head's numerics without
    # changing param SHAPES, so pre-fix checkpoints would resume silently
    # under the same tag — version the prefix instead.
    tag = "-".join(
        ["matconv2", LAYOUT]
        + (["analytic"] if ANALYTIC_NORMALS else [])
        + (["active"] if ACTIVE else [])
        # SCENE_TAG (legacy/physical/glossy [+ _multi]) — NOT just the
        # physical flag: two runs on different GT variants must never share
        # a checkpoint dir (a glossy run and a physical+multi-illum run
        # collided here and the latter resumed fully-trained, training 0
        # steps on its own data).
        + [SCENE_TAG]
        # Model-shape A/B knobs must also be in the tag: an slc/pw run and
        # the corresponding baseline run share every other tag component,
        # and resuming across them is at best a param-shape mismatch and at
        # worst a silently-invalid "converged in 0 steps" result. The clamp
        # component uses the EFFECTIVE value (bench default included) so
        # default-clamped runs never resume pre-flip unclamped checkpoints.
        + ([f"slc{bench.SECONDARY_LEVEL_CLAMP}"]
           if bench.SECONDARY_LEVEL_CLAMP else [])
        + ([f"plc{bench.PRIMARY_LEVEL_CLAMP}"]
           if bench.PRIMARY_LEVEL_CLAMP else [])
        + ([f"pw{bench.PROPOSAL_WIDTH}"] if "--proposal-width" in sys.argv else [])
        + ([f"rb{ROUGHNESS_BIAS:g}"] if ROUGHNESS_BIAS is not None else [])
        + (["lc"] if LIGHT_CANONICAL else [])
        + ([f"v{NUM_VIEWS}"] if NUM_VIEWS != 16 else [])
        + [f"{CACHE_STEPS}x{MAT_STEPS}", f"b{BATCH}x{MAT_BATCH}", f"r{RES}"]
    )
    ckpt_root = _str_flag("--ckpt-root", f"/tmp/{tag}")
    global EVAL_DUMP_DIR
    if EVAL_DUMP_DIR is None:
        EVAL_DUMP_DIR = f"{ckpt_root}/eval"
    cache_state = train_model(
        cache_model, config, train_ds, CACHE_STEPS, rng,
        ckpt_dir=f"{ckpt_root}/cache",
    )

    if MAT_STEPS <= 0:
        # Cache-only quality check: report the cache render's test PSNR.
        test_ds = datasets.SyntheticSpheres("test", None, config, num_images=2,
                                            resolution=RES)
        metrics = eval_material(cache_model, config, cache_state, test_ds,
                                stage="cache")
        print(f"RESULT layout={LAYOUT} scene={SCENE_TAG} "
              + " ".join(f"{k}={v:.3f}" for k, v in metrics.items()),
              flush=True)
        return

    cache_params = jax.device_get(cache_state.params)
    del cache_state

    mat_config = make_config(
        batch_size=MAT_BATCH,
        max_steps=max(MAT_STEPS, 1),
        secondary_far=8.0,
        material_loss_radius=4.0,
        data_loss_type="rawnerf_unbiased",
        use_gradient_debias=True,
        gradient_checkpointing=True,
        distortion_loss_mult=0.0,
        predicted_normal_loss_mult=0.0,
        predicted_normal_reverse_loss_mult=0.0,
        lr_init=0.004,
        lr_final=0.001,
        extra_opt_params={"Cache": {"lr_init": 0.0004, "lr_final": 0.0001}},
        # Material render fans out 32 secondary samples per pixel with no
        # remat; chunk 8192 compiles to a 34G buffer (reference README also
        # renders the material stage at chunk 1024).
        render_chunk_size=1024,
    )
    mat_ds = datasets.SyntheticSpheres("train", None, mat_config, num_images=NUM_VIEWS,
                                       resolution=RES)
    print(f"[material] training {MAT_STEPS} steps @ batch {MAT_BATCH}", flush=True)
    # Known v5e runtime-fault family (batch 1024): flip the whole encoder
    # to the validated pure-XLA program instead of crashing the worker.
    from neural_radiance_caching_tpu.ops import hashgrid as hashgrid_lib

    hashgrid_lib.guard_material_fanout(MAT_BATCH)
    shader_extras = {}
    if ACTIVE:
        shader_extras["use_active"] = True
    if ROUGHNESS_BIAS is not None:
        shader_extras["brdf_bias"] = {"roughness": ROUGHNESS_BIAS}
    mat_model = bench.build_flagship_material_model(
        mat_config, shader_extras=shader_extras or None
    )
    mat_state = train_model(
        mat_model, mat_config, mat_ds, MAT_STEPS,
        jax.random.fold_in(rng, 1), graft={"params": cache_params["params"]},
        ckpt_dir=f"{ckpt_root}/mat",
    )

    test_ds = datasets.SyntheticSpheres("test", None, mat_config, num_images=2,
                                        resolution=RES)
    metrics = eval_material(mat_model, mat_config, mat_state, test_ds)
    print(f"RESULT scene={SCENE_TAG} "
          + " ".join(f"{k}={v:.3f}" for k, v in metrics.items()),
          flush=True)
    if PROBE_DIR:
        emit_probe(mat_model, mat_config, mat_state, test_ds, PROBE_DIR)


if __name__ == "__main__":
    main()
