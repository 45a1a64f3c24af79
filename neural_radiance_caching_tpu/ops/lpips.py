"""LPIPS perceptual distance in pure JAX (VGG-16 backbone + linear heads).

Behavioral parity targets:
  - reference lpips_tf.py:29-92 (net-lin/vgg v0.1 graph: inputs in [0,1],
    scaled to [-1,1], NCHW VGG, per-layer unit-normalize, squared diff,
    1x1 linear head, spatial mean, sum over layers).
  - reference evaluation/elpips/pnetlin.py:20-181 (shift/scale constants,
    feature normalization, linear-head application) and
    evaluation/elpips/networks.py:469-671 (VGG-16 slice structure).
  - reference evaluation/elpips/elpips.py (E-LPIPS input-transformation
    ensemble; implemented host-side in `elpips` below).

TPU-first notes: convolutions run in NHWC/HWIO layout (XLA's native TPU
layout) instead of the reference's NCHW, features can be computed in
bfloat16 with float32 normalization, and the whole distance is one jittable
function of a parameter pytree — no TF1 graph surgery.

Weights: this environment has no network egress and no pretrained VGG
weights on disk, so calibrated weights must be supplied as an `.npz` file
(see `scripts/convert_lpips_weights.py` for converters from the torch
`lpips` package checkpoint or the E-LPIPS `.npy` dicts). The loader searches,
in order:
  1. the explicit `path` argument,
  2. the `NRC_LPIPS_WEIGHTS` environment variable,
  3. `~/.cache/neural_radiance_caching_tpu/lpips_vgg16.npz`,
  4. `<repo>/weights/lpips_vgg16.npz`.
`synthesize_params` builds deterministic random parameters for shape/smoke
tests only — distances from synthesized weights are NOT comparable to
published LPIPS numbers (params carry `calibrated=False`).

When no calibrated file exists, `default_params` falls back to the
UNCALIBRATED variant: a fixed-seed He-initialized VGG-16 with uniform unit
linear heads. This is the LPIPS paper's untrained-network baseline (Zhang et
al., CVPR 2018, Table 5 "Net (random)": Gaussian-init nets score ~78% 2AFC
vs ~63% for L2 — most of LPIPS' perceptual power is the deep-feature
architecture, not the ImageNet weights or the head calibration). Values are
self-consistent across runs (fixed seed) and perceptually ordered (see
tests/test_lpips.py::test_fallback_perceptual_ordering) but NOT comparable
to published calibrated-LPIPS tables; reports must carry the
`lpips_calibrated` flag the MetricHarness emits alongside.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG-16 convolutional backbone: (in_channels, out_channels) per conv layer;
# slice boundaries (LPIPS taps) fall after relu1_2/2_2/3_3/4_3/5_3.
VGG_CONVS = (
    (3, 64), (64, 64),                       # slice 1
    (64, 128), (128, 128),                   # slice 2
    (128, 256), (256, 256), (256, 256),      # slice 3
    (256, 512), (512, 512), (512, 512),      # slice 4
    (512, 512), (512, 512), (512, 512),      # slice 5
)
# Index (into VGG_CONVS) of the last conv of each slice.
SLICE_ENDS = (1, 3, 6, 9, 12)
SLICE_CHANNELS = (64, 128, 256, 512, 512)

# Input normalization constants (pnetlin.py:100-101). Inputs in [0,1] are
# first mapped to [-1,1] (lpips_tf.py:55-56), then shifted/scaled.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_DEFAULT_PATHS = (
    os.environ.get("NRC_LPIPS_WEIGHTS", ""),
    os.path.expanduser("~/.cache/neural_radiance_caching_tpu/lpips_vgg16.npz"),
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "weights", "lpips_vgg16.npz"),
)


def find_weights(path: Optional[str] = None) -> Optional[str]:
    """First existing weights file among `path` and the documented defaults."""
    for p in (path,) + _DEFAULT_PATHS:
        if p and os.path.isfile(p):
            return p
    return None


def load_params(path: Optional[str] = None):
    """Load calibrated LPIPS params from an .npz produced by the converter.

    Expected keys: conv{i}_w [kh,kw,cin,cout], conv{i}_b [cout] for
    i in 0..12, and lin{j} [c_j] (non-negative head weights) for j in 0..4.
    Returns a params pytree with `calibrated=True`, or None if no file found.
    """
    path = find_weights(path)
    if path is None:
        return None
    data = np.load(path)
    convs = []
    for i, (cin, cout) in enumerate(VGG_CONVS):
        w = np.asarray(data[f"conv{i}_w"], np.float32)
        b = np.asarray(data[f"conv{i}_b"], np.float32)
        if w.shape != (3, 3, cin, cout) or b.shape != (cout,):
            raise ValueError(
                f"conv{i} shape mismatch in {path}: {w.shape}, {b.shape}"
            )
        convs.append((jnp.asarray(w), jnp.asarray(b)))
    lins = []
    for j, c in enumerate(SLICE_CHANNELS):
        lin = np.asarray(data[f"lin{j}"], np.float32).reshape(-1)
        if lin.shape != (c,):
            raise ValueError(f"lin{j} shape mismatch in {path}: {lin.shape}")
        lins.append(jnp.asarray(np.maximum(lin, 0.0)))
    return {"convs": convs, "lins": lins, "calibrated": True}


def synthesize_params(seed: int = 0):
    """Deterministic random params for SHAPE TESTS ONLY (calibrated=False)."""
    rng = np.random.RandomState(seed)
    convs = []
    for cin, cout in VGG_CONVS:
        std = np.sqrt(2.0 / (9 * cin))
        w = rng.normal(0.0, std, (3, 3, cin, cout)).astype(np.float32)
        b = np.zeros((cout,), np.float32)
        convs.append((jnp.asarray(w), jnp.asarray(b)))
    lins = [
        jnp.asarray(rng.uniform(0.0, 1.0, (c,)).astype(np.float32) / c)
        for c in SLICE_CHANNELS
    ]
    return {"convs": convs, "lins": lins, "calibrated": False}


# Fixed seed of the uncalibrated fallback: one global constant so every
# harness instance in every process scores with the SAME network.
_FALLBACK_SEED = 1818


def fallback_params():
    """Deterministic uncalibrated LPIPS params (untrained-VGG baseline).

    He-initialized convs from a fixed seed and uniform 1/C linear heads (the
    unweighted per-layer average the LPIPS paper uses for its untrained
    baseline). `calibrated=False`; see the module docstring for what these
    numbers mean and don't mean.
    """
    rng = np.random.RandomState(_FALLBACK_SEED)
    convs = []
    for cin, cout in VGG_CONVS:
        std = np.sqrt(2.0 / (9 * cin))
        w = rng.normal(0.0, std, (3, 3, cin, cout)).astype(np.float32)
        convs.append((jnp.asarray(w), jnp.zeros((cout,), jnp.float32)))
    lins = [jnp.full((c,), 1.0 / c, jnp.float32) for c in SLICE_CHANNELS]
    return {"convs": convs, "lins": lins, "calibrated": False}


def default_params(path: Optional[str] = None):
    """Calibrated params when a weights file exists, else the fallback."""
    params = load_params(path)
    return params if params is not None else fallback_params()


def _conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(out + b.astype(x.dtype))


def _pool2(x, mode):
    if mode == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def vgg16_features(params, x, pool: str = "max", compute_dtype=jnp.float32):
    """Post-ReLU activations at the five LPIPS tap points. x: [N,H,W,3]."""
    feats = []
    h = x.astype(compute_dtype)
    end_set = set(SLICE_ENDS)
    for i, (w, b) in enumerate(params["convs"]):
        h = _conv(h, w, b)
        if i in end_set:
            feats.append(h)
            if i != SLICE_ENDS[-1]:
                h = _pool2(h, pool)
    return feats


def vgg16_features_pair(params, x0, x1, pool: str = "max",
                        compute_dtype=jnp.float32,
                        dropout_rng=None, dropout_keep=0.99):
    """Both images through the net with SHARED pre-conv dropout masks.

    Matches the reference E-LPIPS network dropout (elpips/networks.py:60-70):
    before every conv, one Bernoulli(keep_prob) mask — scaled by 1/keep — is
    sampled at the activation shape and applied to BOTH images' tensors, so
    the ensemble perturbs the feature subspace the distance is measured in,
    not the distance itself. dropout_rng=None disables dropout (then this is
    two `vgg16_features` passes).
    """
    feats0, feats1 = [], []
    h0 = x0.astype(compute_dtype)
    h1 = x1.astype(compute_dtype)
    end_set = set(SLICE_ENDS)
    rng = dropout_rng
    for i, (w, b) in enumerate(params["convs"]):
        if rng is not None:
            rng, key = jax.random.split(rng)
            mask = (
                jax.random.uniform(key, h0.shape) < dropout_keep
            ).astype(compute_dtype) / dropout_keep
            h0 = h0 * mask
            h1 = h1 * mask
        h0 = _conv(h0, w, b)
        h1 = _conv(h1, w, b)
        if i in end_set:
            feats0.append(h0)
            feats1.append(h1)
            if i != SLICE_ENDS[-1]:
                h0 = _pool2(h0, pool)
                h1 = _pool2(h1, pool)
    return feats0, feats1


def _normalize_features(f, eps=1e-10):
    # Unit-normalize along channels in float32 (pnetlin.py:20-23).
    f = f.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True))
    return f / (norm + eps)


@functools.partial(jax.jit, static_argnames=("pool", "compute_dtype"))
def lpips(params, img0, img1, pool: str = "max", compute_dtype=jnp.float32,
          dropout_rng=None, dropout_keep=0.99):
    """LPIPS distance between images in [0,1]. Accepts [H,W,3] or [N,H,W,3].

    Returns a scalar ([H,W,3] inputs) or an [N] vector. Matches the
    reference net-lin/vgg pipeline (lpips_tf.py:29-92, pnetlin.py:148-181).
    `dropout_rng` enables the E-LPIPS shared network dropout
    (see vgg16_features_pair).
    """
    squeeze = img0.ndim == 3
    if squeeze:
        img0, img1 = img0[None], img1[None]
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    def prep(im):
        im = im.astype(jnp.float32) * 2.0 - 1.0
        return (im - shift) / scale

    f0, f1 = vgg16_features_pair(
        params, prep(img0), prep(img1), pool=pool, compute_dtype=compute_dtype,
        dropout_rng=dropout_rng, dropout_keep=dropout_keep,
    )
    total = 0.0
    for a, b, lin in zip(f0, f1, params["lins"]):
        diff = jnp.square(_normalize_features(a) - _normalize_features(b))
        # Spatial mean first, then the 1x1 linear head (pnetlin.py:103-125).
        total = total + jnp.sum(jnp.mean(diff, axis=(1, 2)) * lin, axis=-1)
    return total[0] if squeeze else total


# ---------------------------------------------------------------------------
# E-LPIPS: self-ensemble over random input transformations (elpips.py).
# The transformation sampling runs host-side (numpy) because crops/scales
# change array shapes; the distance itself is the jitted `lpips` above with
# the ensemble's average-pooled VGG (networks.py:672 vgg16_full_avg).
# ---------------------------------------------------------------------------


def _sample_transform(rng, h, w, num_scales, offset_max=7):
    probs = np.array([1.0 / i**2 for i in range(1, num_scales + 1)])
    probs /= probs.sum()
    scale = int(rng.choice(num_scales, p=probs)) + 1
    return {
        "offset": rng.randint(0, offset_max + 1, size=2),
        "scale": scale,
        "scale_offset": rng.randint(0, scale, size=2),
        "flip": int(rng.randint(4)),
        "swap": int(rng.randint(2)),
        "color": (0.2 + 0.8 * rng.uniform(size=3)).astype(np.float32),
        "perm": rng.permutation(3),
    }


def _apply_transform(img, t):
    """Apply one sampled E-LPIPS transform to an [H,W,3] numpy image."""
    img = np.asarray(img, np.float32)
    oy, ox = t["offset"]
    img = img[oy:, ox:]
    # Scale: crop to a multiple of `scale` (fast_and_approximate mode of
    # elpips.py — cropping instead of padding), then box-downsample.
    s = t["scale"]
    if s > 1:
        sy, sx = t["scale_offset"]
        img = img[sy:, sx:]
        hh, ww = (img.shape[0] // s) * s, (img.shape[1] // s) * s
        img = img[:hh, :ww].reshape(hh // s, s, ww // s, s, 3).mean((1, 3))
    if t["flip"] & 1:
        img = img[:, ::-1]
    if t["flip"] & 2:
        img = img[::-1]
    if t["swap"]:
        img = np.swapaxes(img, 0, 1)
    img = img[..., t["perm"]] * t["color"]
    return np.ascontiguousarray(img)


def elpips(params, img0, img1, num_samples: int = 8, seed: int = 0,
           num_scales: Optional[int] = None, dropout_keep: float = 0.99):
    """E-LPIPS: expectation of LPIPS over the input-transformation ensemble.

    Matches reference evaluation/elpips/elpips.py with
    `fast_and_approximate=True` (crop-based) and the vgg_ensemble metric
    (average-pooled VGG), including the per-sample shared network dropout
    (config.enable_dropout, keep_prob 0.99 — elpips.py:17-18,
    networks.py:60-70). Images: [H,W,3] in [0,1]. Deterministic in `seed`.
    `dropout_keep=1.0` disables dropout.
    """
    img0 = np.asarray(img0, np.float32)
    img1 = np.asarray(img1, np.float32)
    h, w = img0.shape[:2]
    if num_scales is None:
        # set_scale_levels_by_image_size: min(h,w)//64, at least 1.
        num_scales = max(1, min(h, w) // 64)
    rng = np.random.RandomState(seed)
    vals = []
    for k in range(num_samples):
        t = _sample_transform(rng, h, w, num_scales)
        a = _apply_transform(img0, t)
        b = _apply_transform(img1, t)
        drop_rng = (
            jax.random.PRNGKey((seed * 7919 + k) & 0x7FFFFFFF)
            if dropout_keep < 1.0 else None
        )
        vals.append(float(lpips(params, jnp.asarray(a), jnp.asarray(b),
                                pool="avg", dropout_rng=drop_rng,
                                dropout_keep=dropout_keep)))
    return float(np.mean(vals))
