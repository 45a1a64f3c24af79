"""bench.trained_psnr_gate: the driver bench's quality canary (tiny smoke)."""

import numpy as np
import pytest

import bench
from neural_radiance_caching_tpu.data import datasets
from neural_radiance_caching_tpu.engine.configs import Config


@pytest.mark.slow
def test_trained_psnr_gate_smoke():
    from test_train_e2e import make_tiny_model

    config = Config(
        dataset_loader="synthetic_spheres",
        batch_size=64,
        near=2.0,
        far=6.0,
        max_steps=10,
        lr_init=5e-3,
        lr_final=2e-3,
        lr_delay_steps=0,
        data_loss_type="charb",
        linear_to_srgb=True,
        mask_lossmult=False,
        render_chunk_size=256,
    )
    ds = datasets.SyntheticSpheres("train", None, config, num_images=4,
                                   resolution=16)
    model = make_tiny_model(config)
    psnr = bench.trained_psnr_gate(model, config, ds, steps=5, resolution=16)
    assert np.isfinite(psnr) and psnr > 0.0

def test_floor_gate_fails_loudly(monkeypatch, capsys):
    """Below-floor trained PSNR must exit nonzero AFTER the JSON prints."""
    import pytest

    monkeypatch.setattr(bench, "_QUALITY_GATE_FAILED",
                        "FAIL: 12.0 dB < floor 20.0")
    with pytest.raises(SystemExit) as e:
        bench._exit_if_gate_failed()
    assert e.value.code == 1
    assert "QUALITY GATE" in capsys.readouterr().err


def test_floor_gate_passes_quietly(monkeypatch):
    monkeypatch.setattr(bench, "_QUALITY_GATE_FAILED", None)
    bench._exit_if_gate_failed()  # no raise
