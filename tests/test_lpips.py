"""LPIPS / E-LPIPS tests (synthesized weights: shape + behavior checks)."""

import numpy as np
import pytest

from neural_radiance_caching_tpu.ops import image as image_lib
from neural_radiance_caching_tpu.ops import lpips as lpips_lib


@pytest.fixture(scope="module")
def params():
    return lpips_lib.synthesize_params(seed=0)


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.RandomState(1)
    a = rng.uniform(size=(32, 48, 3)).astype(np.float32)
    b = np.clip(a + 0.25 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
    return a, b


def test_lpips_zero_on_identical(params, imgs):
    a, _ = imgs
    assert float(lpips_lib.lpips(params, a, a)) == pytest.approx(0.0, abs=1e-6)


def test_lpips_positive_and_scalar(params, imgs):
    a, b = imgs
    d = lpips_lib.lpips(params, a, b)
    assert d.shape == ()
    assert float(d) > 0.0


def test_lpips_batched(params, imgs):
    a, b = imgs
    d = lpips_lib.lpips(params, np.stack([a, a]), np.stack([a, b]))
    assert d.shape == (2,)
    assert float(d[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(d[1]) > 0.0


def test_lpips_monotone_in_noise(params, imgs):
    a, _ = imgs
    rng = np.random.RandomState(2)
    noise = rng.normal(size=a.shape).astype(np.float32)
    d_small = float(lpips_lib.lpips(params, a, np.clip(a + 0.05 * noise, 0, 1)))
    d_large = float(lpips_lib.lpips(params, a, np.clip(a + 0.4 * noise, 0, 1)))
    assert d_large > d_small


def test_weights_roundtrip(tmp_path, params, imgs):
    a, b = imgs
    path = tmp_path / "lpips_vgg16.npz"
    arrays = {}
    for i, (w, bias) in enumerate(params["convs"]):
        arrays[f"conv{i}_w"] = np.asarray(w)
        arrays[f"conv{i}_b"] = np.asarray(bias)
    for j, lin in enumerate(params["lins"]):
        arrays[f"lin{j}"] = np.asarray(lin)
    np.savez(path, **arrays)
    loaded = lpips_lib.load_params(str(path))
    assert loaded["calibrated"]
    d0 = float(lpips_lib.lpips(params, a, b))
    d1 = float(lpips_lib.lpips(loaded, a, b))
    assert d1 == pytest.approx(d0, rel=1e-5)


def test_load_params_missing_returns_none(tmp_path):
    assert lpips_lib.load_params(str(tmp_path / "nope.npz")) is None


def test_metric_harness_with_lpips(params, imgs):
    a, b = imgs
    harness = image_lib.MetricHarness(lpips_params=params)
    metrics = harness(b, a)
    assert set(metrics) == {"psnr", "ssim", "lpips", "avg_err"}
    assert all(np.isfinite(v) for v in metrics.values())
    # Without weights, lpips/avg_err are omitted rather than fabricated.
    bare = image_lib.MetricHarness(lpips_weights_path="/nonexistent")
    assert set(bare(b, a)) == {"psnr", "ssim"}


def test_torch_checkpoint_conversion(tmp_path, imgs):
    """End-to-end converter proof against the real torch-lpips key schema.

    Builds a checkpoint with exactly the key names and tensor shapes of
    `lpips.LPIPS(net='vgg').state_dict()` (random values — no egress here),
    runs scripts/convert_lpips_weights.py's parse path, loads the result
    through ops.lpips.load_params, and computes a distance. Guarantees the
    one manual step (dropping in a real checkpoint) works.
    """
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    try:
        import convert_lpips_weights as conv
    finally:
        sys.path.pop(0)

    rng = np.random.RandomState(3)
    state = {}
    for i, idx in enumerate(conv.TORCH_CONV_IDX):
        cin, cout = lpips_lib.VGG_CONVS[i]
        prefix = f"net.slice{conv._slice_of(idx)}.{idx}"
        state[f"{prefix}.weight"] = torch.tensor(
            rng.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32)
        )
        state[f"{prefix}.bias"] = torch.tensor(
            rng.normal(0, 0.01, (cout,)).astype(np.float32)
        )
    for j, c in enumerate(lpips_lib.SLICE_CHANNELS):
        # Real head weights include tiny negatives (clamped at use in torch).
        state[f"lin{j}.model.1.weight"] = torch.tensor(
            rng.normal(0.02, 0.02, (1, c, 1, 1)).astype(np.float32)
        )
    # The real package also carries scaling-layer buffers; the converter
    # must tolerate (ignore) them.
    state["scaling_layer.shift"] = torch.zeros(1, 3, 1, 1)
    state["scaling_layer.scale"] = torch.ones(1, 3, 1, 1)

    ckpt = tmp_path / "lpips_vgg.pth"
    torch.save(state, ckpt)
    out = tmp_path / "lpips_vgg16.npz"
    conv.from_torch_checkpoint(str(ckpt), str(out))

    loaded = lpips_lib.load_params(str(out))
    assert loaded["calibrated"]
    # OIHW -> HWIO transposition check on the first conv.
    w_torch = state["net.slice1.0.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(loaded["convs"][0][0]), w_torch.transpose(2, 3, 1, 0)
    )
    # Heads flattened + clamped non-negative.
    for j in range(5):
        lin = np.asarray(loaded["lins"][j])
        assert lin.min() >= 0.0 and lin.max() > 0.0

    a, b = imgs
    d = float(lpips_lib.lpips(loaded, a, b))
    assert np.isfinite(d) and d > 0.0
    assert float(lpips_lib.lpips(loaded, a, a)) == pytest.approx(0.0, abs=1e-6)


def test_elpips_deterministic_and_finite(params, imgs):
    a, b = imgs
    e1 = lpips_lib.elpips(params, a, b, num_samples=3, seed=7)
    e2 = lpips_lib.elpips(params, a, b, num_samples=3, seed=7)
    assert e1 == e2
    assert np.isfinite(e1) and e1 > 0.0
    assert lpips_lib.elpips(params, a, a, num_samples=2, seed=0) == pytest.approx(
        0.0, abs=1e-6
    )
