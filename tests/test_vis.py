"""Visualization suite: buffers in [0,1], expected keys, PNG saving."""

import os

import numpy as np

from neural_radiance_caching_tpu.utils import vis


def _rendering(h=6, w=7):
    rng = np.random.RandomState(0)
    return {
        "rgb": rng.rand(h, w, 3).astype(np.float32),
        "cache_rgb": rng.rand(h, w, 3).astype(np.float32),
        "cache_diffuse_rgb": rng.rand(h, w, 3).astype(np.float32),
        "acc": rng.rand(h, w).astype(np.float32),
        "distance_mean": (1 + rng.rand(h, w)).astype(np.float32),
        "distance_median": (1 + rng.rand(h, w)).astype(np.float32),
        "distance_percentile_5": (1 + rng.rand(h, w)).astype(np.float32),
        "distance_percentile_95": (1 + rng.rand(h, w)).astype(np.float32),
        "normals": (rng.rand(h, w, 3) * 2 - 1).astype(np.float32),
        "material_albedo": rng.rand(h, w, 3).astype(np.float32),
        "material_roughness": rng.rand(h, w, 1).astype(np.float32),
        "diffuse_rgb": rng.rand(h, w, 3).astype(np.float32),
        "occ": rng.rand(h, w, 1).astype(np.float32),
        "lossmult": rng.rand(h, w, 1).astype(np.float32),
    }


def test_visualize_suite_keys_and_range():
    out = vis.visualize_suite(_rendering(), vis_material=True)
    for key in ("color", "color_cache", "depth_mean", "depth_median",
                "depth_triplet", "acc", "normals", "material_albedo",
                "material_diffuse_color", "material_occ"):
        assert key in out, key
        buf = out[key]
        assert np.isfinite(buf).all(), key
        assert buf.min() >= 0 and buf.max() <= 1 + 1e-6, key
        assert buf.shape[-1] == 3 or buf.ndim == 2, key


def test_visualize_transient_suite():
    h, w, t = 4, 5, 8
    rng = np.random.RandomState(1)
    rendering = {
        "rgb": rng.rand(h, w, t, 3).astype(np.float32) * 0.1,
        "cache_rgb": rng.rand(h, w, t, 3).astype(np.float32) * 0.1,
        "transient_indirect": rng.rand(h, w, t, 3).astype(np.float32) * 0.1,
        "acc": rng.rand(h, w).astype(np.float32),
        "distance_mean": (1 + rng.rand(h, w)).astype(np.float32),
        "distance_median": (1 + rng.rand(h, w)).astype(np.float32),
    }
    out = vis.visualize_transient_suite(rendering)
    assert out["color"].shape == (h, w, 3)
    assert "indirect_integrated" in out


def test_save_vis_suite(tmp_path):
    out = vis.visualize_suite(_rendering())
    vis.save_vis_suite(out, str(tmp_path), 7)
    assert os.path.exists(tmp_path / "color" / "000007.png")
    assert os.path.exists(tmp_path / "depth_mean" / "000007.png")


def test_weighted_percentile_matches_unweighted():
    x = np.linspace(0, 10, 101)
    w = np.ones_like(x)
    lo, hi = vis.weighted_percentile(x, w, [25, 75])
    assert 2.0 < lo < 3.0 and 7.0 < hi < 8.0
