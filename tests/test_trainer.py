"""Trainer orchestration: gin configs, stage registry, warm starts, eval."""

import os
import shutil

import numpy as np
import pytest

import train_with_trainer
from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.utils import checkpoints as ckpt_lib

CONFIG = "configs/synthetic_spheres.gin"
TINY = [
    "--gin_configs=" + CONFIG,
    "--gin_bindings=Config.num_dataset_images=2",
    "--gin_bindings=Config.factor=4",  # 12x12 test renders
    "--gin_bindings=Config.render_chunk_size=144",
]


@pytest.fixture(autouse=True)
def clean_gin():
    yield
    gin.clear_config()


def run(args):
    train_with_trainer.main(args)


@pytest.mark.slow
def test_cache_stage_trains_and_checkpoints(tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt") / "spheres_cache")
    run(TINY + [
        "--gin_bindings=Trainer.stage='cache'",
        f"--gin_bindings=Config.checkpoint_dir='{ckpt}'",
        "--gin_bindings=Config.early_exit_steps=3",
    ])
    assert ckpt_lib.latest_checkpoint_step(ckpt) == 3
    assert os.path.exists(os.path.join(ckpt, "config.gin"))
    assert os.path.exists(os.path.join(ckpt, "train_log.jsonl"))
    # Second run resumes from the checkpoint and is a no-op (init_step > steps).
    run(TINY + [
        "--gin_bindings=Trainer.stage='cache'",
        f"--gin_bindings=Config.checkpoint_dir='{ckpt}'",
        "--gin_bindings=Config.early_exit_steps=3",
    ])
    # Stash for the material test.
    shutil.copytree(ckpt, "/tmp/nrc_test_cache_ckpt", dirs_exist_ok=True)


@pytest.mark.slow
def test_material_stage_warm_start_and_eval(tmp_path_factory):
    source = "/tmp/nrc_test_cache_ckpt"
    if not os.path.isdir(source):
        pytest.skip("cache-stage test must run first")
    ckpt = str(tmp_path_factory.mktemp("ckpt") / "spheres_material")
    run(TINY + [
        "--gin_bindings=Trainer.stage='material_light_from_scratch'",
        "--gin_bindings=Trainer.resample=True",
        "--gin_bindings=Trainer.resample_render=True",
        "--gin_bindings=Trainer.sample_factor=1",
        "--gin_bindings=Trainer.sample_render_factor=1",
        f"--gin_bindings=Config.checkpoint_dir='{ckpt}'",
        f"--gin_bindings=Config.partial_checkpoint_dir='{source}'",
        "--gin_bindings=Config.early_exit_steps=2",
        "--gin_bindings=Config.train_render_every=2",
    ])
    assert ckpt_lib.latest_checkpoint_step(ckpt) == 2
    # Eval rendering ran and saved buffers.
    save = os.path.join(ckpt, "save")
    assert os.path.isdir(os.path.join(save, "color"))
    img = np.load(os.path.join(save, "color", "000002.npy"))
    assert img.shape[-1] == 3 and np.isfinite(img).all()
    # Warm start actually copied cache params: fresh material stage keeps the
    # Cache prefix from the cache run.
    tree = ckpt_lib.load_params(ckpt)
    src = ckpt_lib.load_params(source)
    a = tree["params"]["params"]["Cache"]["Sampler"]
    b = src["params"]["params"]["Cache"]["Sampler"]
    # The sampler was trained further but originates from the cache stage —
    # structures must match exactly for the prefix surgery to have applied.
    assert set(a.keys()) == set(b.keys())


def test_stage_registry_covers_reference_stages():
    from neural_radiance_caching_tpu.engine import configs as configs_lib
    configs_lib.load_config(config_files=[CONFIG])
    stage_params = gin.query_parameter("Trainer.stage_params")
    for stage in (
        "cache", "light", "surface_light_field", "surface_light_field_light",
        "material", "material_light", "material_surface_light_field",
        "material_surface_light_field_light", "material_from_scratch",
        "material_light_from_scratch", "material_light_finetune",
        "material_surface_light_field_from_scratch",
        "material_surface_light_field_light_from_scratch",
    ):
        assert stage in stage_params, stage
        assert "extra_losses" in stage_params[stage]


def test_hotdog_config_constructs_both_stages():
    """The full-size scene config must parse and build the right param sets
    through the Trainer's binding synthesis (abstract init, no compute)."""
    import functools

    import jax

    from neural_radiance_caching_tpu.engine import configs as configs_lib
    from neural_radiance_caching_tpu.engine.trainer import Trainer
    from neural_radiance_caching_tpu.models import construct
    from neural_radiance_caching_tpu.utils import pytrees

    def build(stage, extra=()):
        gin.clear_config()
        configs_lib.load_config(
            config_files=["configs/nerf_ngp_yobo_hotdog.gin"],
            bindings=[
                "Config.dataset_loader = 'synthetic_spheres'",
                "Config.batch_size = 16",
                "Config.near = 0.2",
                f"Trainer.stage = '{stage}'",
                *extra,
            ],
        )
        trainer = Trainer()
        trainer._setup_names()
        trainer._setup_config_parameters()
        trainer._setup_binding_configs()
        model = construct.make_model(trainer.config)
        shapes = jax.eval_shape(
            functools.partial(model.init, train_frac=1.0, train=False),
            jax.random.PRNGKey(0), jax.random.PRNGKey(1), pytrees.dummy_rays(2),
        )
        return sorted(shapes["params"].keys())

    assert build("cache") == ["Cache"]
    groups = build(
        "material_light_from_scratch",
        extra=["Trainer.resample = True", "Trainer.sample_factor = 1"],
    )
    assert {"Cache", "MaterialShader", "LightSampler"} <= set(groups)
