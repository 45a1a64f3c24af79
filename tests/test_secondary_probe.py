"""Secondary visualization probe + vMF render (reference trainer.py:848-1069)."""

import os

import numpy as np
import pytest

import train_with_trainer
from neural_radiance_caching_tpu.engine import gin_config as gin

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


@pytest.mark.slow
def test_secondary_probe_renders_and_saves(tmp_path_factory):
    """vis_secondary=True renders a panoramic probe view during eval and
    writes it under save/secondary/."""
    ckpt = str(tmp_path_factory.mktemp("ckpt") / "spheres_probe")
    train_with_trainer.main(TINY + [
        "--gin_bindings=Trainer.stage='cache'",
        "--gin_bindings=Trainer.vis_secondary=True",
        f"--gin_bindings=Config.checkpoint_dir='{ckpt}'",
        "--gin_bindings=Config.early_exit_steps=2",
        "--gin_bindings=Config.train_render_every=2",
    ])
    secondary_dir = os.path.join(ckpt, "save", "secondary")
    assert os.path.isdir(secondary_dir), os.listdir(os.path.join(ckpt, "save"))
    # At least one buffer (e.g. color) was written for the probe view.
    sub = [d for d in os.listdir(secondary_dir)
           if os.listdir(os.path.join(secondary_dir, d))]
    assert sub, os.listdir(secondary_dir)


def test_render_vmf_from_synthetic_params():
    """render_vmf turns per-pixel vMF params into a finite equirect image."""
    import types

    from neural_radiance_caching_tpu.engine import trainer as trainer_lib

    h = w = 4
    k = 3  # mixture components
    rendering = {
        "vmf_means": np.random.RandomState(0).normal(size=(h, w, k, 3)),
        "vmf_kappas": np.full((h, w, k, 1), 8.0),
        "vmf_logits": np.zeros((h, w, k, 1)),
    }
    fake = types.SimpleNamespace(
        test_dataset=types.SimpleNamespace(height=h, width=w),
        config=types.SimpleNamespace(flip_secondary=False),
        _probe_resolution=lambda: (4, 8),
    )
    img = trainer_lib.Trainer.render_vmf(fake, rendering, 1, 2)
    assert img.shape == (4, 8, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    # Missing keys → graceful None.
    assert trainer_lib.Trainer.render_vmf(fake, {}, 0, 0) is None
