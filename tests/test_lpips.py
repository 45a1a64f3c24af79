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
    assert set(metrics) == {"psnr", "ssim", "lpips", "lpips_calibrated", "avg_err"}
    assert all(np.isfinite(v) for v in metrics.values())
    # Without a calibrated weights file the harness still scores — with the
    # deterministic fallback — and says so via the lpips_calibrated flag.
    bare = image_lib.MetricHarness(lpips_weights_path="/nonexistent")
    bare_metrics = bare(b, a)
    assert bare_metrics["lpips_calibrated"] == 0.0
    assert np.isfinite(bare_metrics["lpips"]) and bare_metrics["lpips"] > 0


def test_fallback_deterministic_across_instances(imgs):
    a, b = imgs
    d0 = float(lpips_lib.lpips(lpips_lib.fallback_params(), a, b))
    d1 = float(lpips_lib.lpips(lpips_lib.fallback_params(), a, b))
    assert d0 == d1 and d0 > 0


def test_fallback_perceptual_ordering():
    """Self-check of what the uncalibrated fallback DOES provide.

    Per-distortion-type monotonicity on structured content: distance must
    grow with severity for pixel noise, blur, and brightness shift, and be
    exactly 0 at severity 0. (Cross-type calibration — e.g. equal-MSE noise
    scoring worse than an equal-MSE brightness shift — is what the LPIPS
    head calibration adds and is deliberately NOT asserted here; that is
    the gap the `lpips_calibrated` flag communicates.)
    """
    y, x = np.mgrid[0:64, 0:64].astype(np.float32) / 63.0
    img = np.stack([
        0.5 + 0.4 * np.sin(8 * x), y * 0.8, ((x * 8).astype(int) % 2) * 0.6
    ], -1).clip(0, 1)
    params = lpips_lib.fallback_params()
    rng = np.random.RandomState(3)
    noise = rng.normal(size=img.shape).astype(np.float32)

    def box_blur(im, k):
        if k <= 1:
            return im
        pad = np.pad(im, ((k // 2, k - 1 - k // 2),) * 2 + ((0, 0),), "edge")
        out = np.zeros_like(im)
        for dy in range(k):
            for dx in range(k):
                out += pad[dy:dy + im.shape[0], dx:dx + im.shape[1]]
        return out / (k * k)

    dist = lambda other: float(lpips_lib.lpips(params, img, other))
    d_noise = [dist(np.clip(img + s * noise, 0, 1)) for s in (0.0, 0.05, 0.15, 0.4)]
    assert d_noise[0] == pytest.approx(0.0, abs=1e-6)
    assert d_noise[1] < d_noise[2] < d_noise[3]
    d_blur = [dist(box_blur(img, k)) for k in (1, 3, 7, 15)]
    assert d_blur[0] == pytest.approx(0.0, abs=1e-6)
    assert d_blur[1] < d_blur[2] < d_blur[3]
    d_shift = [dist(np.clip(img + s, 0, 1)) for s in (0.0, 0.05, 0.1, 0.2)]
    assert d_shift[0] == pytest.approx(0.0, abs=1e-6)
    assert d_shift[1] < d_shift[2] < d_shift[3]


@pytest.mark.slow
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


@pytest.mark.slow
def test_elpips_deterministic_and_finite(params, imgs):
    a, b = imgs
    e1 = lpips_lib.elpips(params, a, b, num_samples=3, seed=7)
    e2 = lpips_lib.elpips(params, a, b, num_samples=3, seed=7)
    assert e1 == e2
    assert np.isfinite(e1) and e1 > 0.0
    assert lpips_lib.elpips(params, a, a, num_samples=2, seed=0) == pytest.approx(
        0.0, abs=1e-6
    )


@pytest.mark.slow
def test_elpips_network_dropout(params, imgs):
    """The E-LPIPS shared network dropout (reference networks.py:60-70):
    deterministic in seed, a small perturbation at keep_prob=0.99, exactly
    the no-dropout ensemble at keep_prob=1.0, and zero self-distance (the
    mask is shared between both images, so identical inputs stay identical
    through every layer)."""
    import jax

    a, b = imgs
    e_drop = lpips_lib.elpips(params, a, b, num_samples=3, seed=7)
    e_drop2 = lpips_lib.elpips(params, a, b, num_samples=3, seed=7)
    assert e_drop == e_drop2
    e_nodrop = lpips_lib.elpips(params, a, b, num_samples=3, seed=7,
                                dropout_keep=1.0)
    assert e_drop != e_nodrop
    # keep_prob=0.99 perturbs the expectation by a few percent, not more.
    assert abs(e_drop - e_nodrop) / max(abs(e_nodrop), 1e-9) < 0.25
    assert lpips_lib.elpips(params, a, a, num_samples=2, seed=0) == pytest.approx(
        0.0, abs=1e-6
    )
    # Direct lpips() with a dropout key: shared-mask self-distance is 0.
    d = float(lpips_lib.lpips(params, a, a, pool="avg",
                              dropout_rng=jax.random.PRNGKey(3)))
    assert d == pytest.approx(0.0, abs=1e-6)
