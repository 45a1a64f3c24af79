"""Every benchmark config family constructs both stages through the Trainer.

This is the acceptance test for the ported reference scene configs: the gin
include chain (scene → family → ngp_yobo → trainer) must resolve through the
from-scratch gin engine, the Trainer's binding synthesis must accept the
stage, and the resulting model must build the expected parameter groups.
Abstract init only (jax.eval_shape) — no scene data or compute involved.
"""

import functools

import jax
import pytest

from neural_radiance_caching_tpu.engine import configs as configs_lib
from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.engine.trainer import Trainer
from neural_radiance_caching_tpu.models import construct
from neural_radiance_caching_tpu.utils import pytrees

# One representative scene per family (all five BASELINE workload families
# plus the remaining published ones).
FAMILY_SCENES = [
    "blender_ngp_yobo_lego.gin",
    "glossy_bunny_yobo.gin",
    "neilf_cat_yobo.gin",
    "nero_ngp_yobo_bell.gin",
    "nero_ngp_yobo_teapot.gin",
    "open_ngp_yobo_egg.gin",
    "open_ngp_yobo_stone.gin",
    "open_ngp_yobo_bird.gin",
    "orb_ngp_yobo_teapot.gin",
    "real_ngp_yobo_000.gin",
    "synthetic_ngp_yobo_kitchen.gin",
    "transient_simulation_ngp_yobo_cornell.gin",
    "transient_simulation_ngp_yobo_pots.gin",
    "transient_simulation_ngp_yobo_peppers.gin",
    "transient_simulation_ngp_yobo_kitchen.gin",
    "transient_simulation_ngp_yobo_cornell_itof.gin",
    "transient_simulation_ngp_yobo_cornell_steady_state.gin",
    "transient_simulation_ngp_yobo_statue_fwp.gin",
    "transient_simulation_ngp_yobo_kettle_fwp.gin",
]


@pytest.fixture(autouse=True)
def clean_gin():
    yield
    gin.clear_config()


def build(config_file, stage, extra=()):
    gin.clear_config()
    configs_lib.load_config(
        config_files=[f"configs/{config_file}"],
        bindings=[
            # Tiny shapes so abstract init stays fast; no data dir needed.
            "Config.batch_size = 16",
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


@pytest.mark.parametrize("config_file", FAMILY_SCENES)
def test_cache_stage_constructs(config_file):
    groups = build(config_file, "cache")
    assert "Cache" in groups, groups


@pytest.mark.parametrize("config_file", FAMILY_SCENES)
def test_material_stage_constructs(config_file):
    groups = build(
        config_file,
        "material_light_from_scratch",
        extra=["Trainer.resample = True", "Trainer.sample_factor = 1"],
    )
    assert {"Cache", "MaterialShader"} <= set(groups), groups


def test_all_configs_parse():
    import os

    for f in sorted(os.listdir("configs")):
        if not f.endswith(".gin") or f == "trainer.gin":
            continue
        gin.clear_config()
        configs_lib.load_config(config_files=[os.path.join("configs", f)])


def test_flagship_brdf_head_matches_gin():
    """bench.FLAGSHIP_BRDF_HEAD must stay in lockstep with the flagship gin.

    The programmatic builders (bench, convergence checks) and the gin-driven
    Trainer path must train the SAME material head — the r3/r4 glossy rows
    silently trained the class-default softplus head because the builders
    omitted these bindings (BASELINE.md round-5 ledger).
    """
    import jax

    import bench

    gin.clear_config()
    configs_lib.load_config(config_files=["configs/ngp_yobo.gin"])
    head = bench.FLAGSHIP_BRDF_HEAD
    gin_bias = gin.query_parameter("MaterialMLP.brdf_bias")
    gin_act = gin.query_parameter("MaterialMLP.brdf_activation")
    gin_sg = gin.query_parameter("MaterialMLP.brdf_stopgrad")
    assert gin_bias == head["brdf_bias"]
    assert gin_act["roughness"] is jax.nn.sigmoid
    assert head["brdf_activation"]["roughness"] is jax.nn.sigmoid
    assert gin_sg["roughness"] == head["brdf_stopgrad"]["roughness"] == 0.25
    assert gin.query_parameter("MaterialMLP.min_roughness") == head["min_roughness"]
