"""On-chip TRANSIENT MATERIAL (InvProp inverse rendering) convergence check.

The full InvProp pipeline on hardware: train the flagship time-binned
transient cache (bench.py's transient_stage), checkpoint-surgery it into the
flagship transient MATERIAL stage (bench.py's transient_material_stage:
`material_light_from_scratch` shape with the transient model classes,
time-binned data + cache-consistency + debias losses), train that, and report
on a held-out view:

  * integrated material PSNR (time-binned prediction summed over bins vs GT
    summed over bins),
  * albedo PSNR (per-channel lstsq-calibrated, masked) — the quantity
    InvProp exists to recover from transients,
  * normal MAE (deg),
  * transient IoU raw + impulse-smoothed (same metric definitions as
    scripts/transient_convergence_check.py; reference trainer.py:1626-1647).

Usage: python scripts/transient_material_convergence_check.py \
           [cache_steps] [mat_steps] [--bins N] [--res N] [--images N] \
           [--batch N] [--mat-batch N] [--cpu]
Reference surface: the transient material stage driven through
`material_light_from_scratch` (ref trainer.py stage table, trainer.gin:313)
with Config.use_transient swapping the model classes (ref trainer.py:328).
"""

import sys
import time

sys.path.insert(0, ".")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import bench
from neural_radiance_caching_tpu.data import datasets
from neural_radiance_caching_tpu.engine import renderer
from neural_radiance_caching_tpu.engine.configs import Config
from neural_radiance_caching_tpu.parallel import mesh as mesh_lib
from neural_radiance_caching_tpu.parallel import train as train_lib
from neural_radiance_caching_tpu.utils import checkpoints as ckpt_lib
from neural_radiance_caching_tpu.utils import pytrees


def _int_flag(name, default):
    return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default


_pos = [
    a for i, a in enumerate(sys.argv[1:], 1)
    if not a.startswith("--") and not sys.argv[i - 1].startswith("--")
]
CACHE_STEPS = int(_pos[0]) if len(_pos) > 0 else 1500
MAT_STEPS = int(_pos[1]) if len(_pos) > 1 else 800
N_BINS = _int_flag("--bins", 700)
RES = _int_flag("--res", 64)
N_IMAGES = _int_flag("--images", 8)
BATCH = _int_flag("--batch", 2048)
MAT_BATCH = _int_flag("--mat-batch", 512)


def make_config(**overrides):
    base = dict(
        dataset_loader="synthetic_spheres",
        batch_size=BATCH,
        near=2.0,
        far=6.0,
        max_steps=max(CACHE_STEPS, 1),
        lr_init=0.01,
        lr_final=0.001,
        lr_delay_steps=min(500, CACHE_STEPS // 4),
        lr_delay_mult=1e-8,
        adam_eps=1e-15,
        use_transient=True,
        n_bins=N_BINS,
        exposure_time=14.0 / N_BINS,
        learnable_light=True,
        light_source_position=[0.0, 0.0, 1.0],
        data_loss_type="rawnerf_transient_unbiased",
        linear_to_srgb=False,
        mask_lossmult=False,
        interlevel_loss_mults=(0.01, 0.01),
        interlevel_loss_blurs=(0.03, 0.003),
        distortion_loss_mult=0.01,
        predicted_normal_loss_mult=0.05,
        predicted_normal_reverse_loss_mult=0.05,
        compute_albedo_metrics=True,
        compute_normal_metrics=True,
        render_chunk_size=512,
    )
    base.update(overrides)
    return Config(**base)


def train_model(model, config, dataset, steps, rng, graft=None, ckpt_dir=None):
    import functools

    mesh = mesh_lib.create_mesh()
    variables = jax.jit(functools.partial(model.init, train_frac=1.0, train=False))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), pytrees.dummy_rays(16)
    )
    state, _ = train_lib.create_optimizer(config, variables)
    if graft is not None:
        state = train_lib.restore_partial_checkpoint(
            state, graft, replace_dict={"params/Cache/": "params/"}
        )
    start_step = 0
    if ckpt_dir is not None:
        resume = ckpt_lib.latest_checkpoint_step(ckpt_dir)
        if resume is not None:
            state = ckpt_lib.restore_checkpoint(ckpt_dir, state)
            start_step = min(int(resume), steps)
            print(f"  resumed {ckpt_dir} at step {start_step}", flush=True)
    state = mesh_lib.replicate(state, mesh)
    train_step = train_lib.create_train_step(model, config, mesh=mesh)
    batcher = mesh_lib.DevicePrefetcher(datasets.RayBatcher(dataset), mesh)
    t0 = time.time()
    for step in range(start_step, steps):
        batch = next(batcher)
        train_frac = step / max(1, steps - 1)
        state, stats = train_step(rng, state, batch, train_frac)
        if step % 100 == 0:
            print(f"  step {step}/{steps} loss={float(stats['loss']):.5f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if ckpt_dir is not None and step and step % 200 == 0:
            ckpt_lib.save_checkpoint(ckpt_dir, state, step)
    if ckpt_dir is not None and steps > start_step:
        ckpt_lib.save_checkpoint(ckpt_dir, state, steps)
    batcher.stop()
    return state


def _smooth_bins(x, sigma=2.0):
    taps = np.arange(-8, 9, dtype=np.float64)
    k = np.exp(-(taps**2) / (2 * sigma**2))
    k /= k.sum()
    pad = np.pad(x, ((0, 0), (8, 8), (0, 0)))
    out = np.zeros_like(x)
    for i, w in enumerate(k):
        out += w * pad[:, i:i + x.shape[1], :]
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = jax.random.PRNGKey(13)
    tag = f"trmatconv-{CACHE_STEPS}x{MAT_STEPS}-b{BATCH}x{MAT_BATCH}-r{RES}-i{N_IMAGES}-n{N_BINS}"

    config = make_config()
    train_ds = datasets.SyntheticSpheres(
        "train", None, config, num_images=N_IMAGES, resolution=RES
    )
    cache_model = bench.build_flagship_transient_cache_model(config)
    print(f"[transient cache] {CACHE_STEPS} steps @ batch {BATCH}, "
          f"{N_BINS} bins", flush=True)
    cache_state = train_model(
        cache_model, config, train_ds, CACHE_STEPS, rng,
        ckpt_dir=f"/tmp/{tag}/cache",
    )
    cache_params = jax.device_get(cache_state.params)
    del cache_state

    mat_config = make_config(
        batch_size=MAT_BATCH,
        max_steps=max(MAT_STEPS, 1),
        secondary_far=4.0,
        material_loss_radius=4.0,
        use_gradient_debias=True,
        gradient_checkpointing=True,
        cache_consistency_loss_weight=1.0,
        cache_consistency_loss_type="mse_unbiased",
        distortion_loss_mult=0.0,
        predicted_normal_loss_mult=0.0,
        predicted_normal_reverse_loss_mult=0.0,
        lr_init=0.004,
        lr_final=0.001,
        extra_opt_params={"Cache": {"lr_init": 0.0004, "lr_final": 0.0001}},
        render_chunk_size=256,
    )
    mat_ds = datasets.SyntheticSpheres(
        "train", None, mat_config, num_images=N_IMAGES, resolution=RES
    )
    mat_model = bench.build_flagship_transient_material_model(mat_config)
    print(f"[transient material] {MAT_STEPS} steps @ batch {MAT_BATCH}",
          flush=True)
    mat_state = train_model(
        mat_model, mat_config, mat_ds, MAT_STEPS,
        jax.random.fold_in(rng, 1), graft={"params": cache_params["params"]},
        ckpt_dir=f"/tmp/{tag}/mat",
    )

    test_ds = datasets.SyntheticSpheres(
        "test", None, mat_config, num_images=2, resolution=RES
    )
    mesh = mesh_lib.create_mesh()
    render_fn = train_lib.create_render_fn(mat_model, mesh=mesh)
    batch = test_ds.generate_ray_batch(0)
    rendering = renderer.render_image(
        render_fn, mat_state.params, batch.rays, jax.random.PRNGKey(7),
        mat_config, height=RES, width=RES, train_frac=1.0,
    )
    out = {}
    pred_t = np.nan_to_num(np.asarray(rendering["rgb"])).reshape(
        RES * RES, N_BINS, 3
    )
    gt_t = np.asarray(batch.rgb).reshape(RES * RES, N_BINS, 3)

    pred_i = np.clip(pred_t.sum(axis=1), 0.0, None)
    gt_i = gt_t.sum(axis=1)
    scale = max(gt_i.max(), 1e-6)
    mse = np.mean((pred_i / scale - gt_i / scale) ** 2)
    out["integrated_psnr"] = -10 * np.log10(mse + 1e-12)

    out["transient_iou"] = (
        np.minimum(pred_t, gt_t).sum() / max(np.maximum(pred_t, gt_t).sum(), 1e-12)
    )
    ps, gs = _smooth_bins(pred_t), _smooth_bins(gt_t)
    out["smoothed_iou"] = (
        np.minimum(ps, gs).sum() / max(np.maximum(ps, gs).sum(), 1e-12)
    )

    mask = np.asarray(batch.masks).reshape(-1) > 0.5
    if "material_albedo" in rendering and mask.any():
        albedo = np.asarray(rendering["material_albedo"]).reshape(-1, 3)[mask]
        albedo_gt = np.asarray(batch.albedos).reshape(-1, 3)[mask]
        num = (albedo_gt * albedo).sum(axis=0)
        den = np.maximum((albedo**2).sum(axis=0), 1e-8)
        cal = np.clip(albedo * (num / den), 0, 1)
        out["albedo_psnr"] = -10 * np.log10(
            np.mean((cal - np.clip(albedo_gt, 0, 1)) ** 2) + 1e-12
        )

    key = "normals_to_use" if "normals_to_use" in rendering else "normals"
    if key in rendering and batch.normals is not None and mask.any():
        n_pred = np.asarray(rendering[key]).reshape(-1, 3)[mask]
        n_gt = np.asarray(batch.normals).reshape(-1, 3)[mask]
        n_pred = n_pred / np.maximum(
            np.linalg.norm(n_pred, axis=-1, keepdims=True), 1e-12
        )
        n_gt = n_gt / np.maximum(
            np.linalg.norm(n_gt, axis=-1, keepdims=True), 1e-12
        )
        ang = np.degrees(np.arccos(np.clip((n_pred * n_gt).sum(-1), -1, 1)))
        out["normal_mae_deg"] = float(np.mean(ang))

    print("RESULT " + " ".join(f"{k}={v:.4f}" for k, v in out.items())
          + f" bins={N_BINS} cache_steps={CACHE_STEPS} mat_steps={MAT_STEPS}",
          flush=True)


if __name__ == "__main__":
    main()
