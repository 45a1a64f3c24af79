"""Tests for the offline data-prep tools (scripts/transient_prep.py,
scripts/trajectory_fit.py) — the re-expressed functional core of the
reference's scripts/transient_utils_no_torch.py and
scripts/trajectory_parametrization.py."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import trajectory_fit
import transient_prep


def test_depth_from_total_distance_roundtrip():
    rng = np.random.default_rng(0)
    h, w = 6, 5
    origins = rng.normal(size=(h, w, 3))
    viewdirs = rng.normal(size=(h, w, 3))
    viewdirs /= np.linalg.norm(viewdirs, axis=-1, keepdims=True)
    light_pos = np.array([2.0, -1.0, 3.0])
    depth_gt = rng.uniform(0.5, 4.0, size=(h, w))
    pts = origins + depth_gt[..., None] * viewdirs
    total = depth_gt + np.linalg.norm(pts - light_pos, axis=-1)

    depth = transient_prep.depth_from_total_distance(
        total, light_pos, viewdirs, origins)
    np.testing.assert_allclose(depth, depth_gt, rtol=1e-9)

    # The iterative refinement agrees from a cold start on noiseless data.
    refined = transient_prep.refine_depth_least_squares(
        total, light_pos, viewdirs, origins)
    np.testing.assert_allclose(refined, depth_gt, rtol=1e-6)


def test_shift_transient_matches_manual_interp():
    rng = np.random.default_rng(1)
    transient = rng.uniform(size=(3, 16, 2))
    out = transient_prep.shift_transient(transient, shift_val=2.5,
                                         exposure_time=1.0)
    # Output bin t reads input bin t + 2.5 (lerp), zero past the end.
    expect = 0.5 * transient[:, 2:-1] + 0.5 * transient[:, 3:]
    np.testing.assert_allclose(out[:, :13], expect, rtol=1e-6)
    np.testing.assert_allclose(out[:, 14:], 0.0, atol=1e-12)

    # Negative shift pads zeros at the front.
    back = transient_prep.shift_transient(transient, shift_val=-3.0,
                                          exposure_time=1.0)
    np.testing.assert_allclose(back[:, 3:], transient[:, :13], rtol=1e-6)
    np.testing.assert_allclose(back[:, :3], 0.0, atol=1e-12)


def test_downsample_and_shift_shapes():
    transient = np.arange(8 * 8 * 10 * 3, dtype=np.float64).reshape(8, 8, 10, 3)
    out = transient_prep.downsample_and_shift(
        transient, downsample_factor=4, shift_val=0.0, exposure_time=1.0,
        n_bins=8)
    assert out.shape == (2, 2, 8, 3)
    # factor 4 = two stride-2 decimations: rows/cols 0 and 4 survive.
    np.testing.assert_allclose(out[0, 0], transient[0, 0, :8])
    np.testing.assert_allclose(out[1, 1], transient[4, 4, :8])


def test_direct_tof_to_cw_tof_matches_loop():
    rng = np.random.default_rng(2)
    dtof = rng.uniform(size=(4, 4, 12, 3)).astype(np.float32)
    freq, exposure = 75e6, 0.01
    phases = [0.0, np.pi / 2, np.pi]
    got = transient_prep.direct_tof_to_cw_tof(dtof, freq, exposure, phases)
    assert got.shape == (4, 4, 3, 3)
    # The reference's per-bin loop (transient_utils_no_torch.py:836-853).
    expect = np.zeros_like(got)
    c = transient_prep.SPEED_OF_LIGHT
    for p_idx, p in enumerate(phases):
        for t in range(12):
            phase = 2 * np.pi * freq * (t * exposure / c) + p
            expect[:, :, p_idx, :] += dtof[:, :, t, :] * np.cos(phase)
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_trajectory_linear_and_sphere():
    k0 = {"origin": [2.0, 0.0, 0.0], "target": [0.0, 0.0, 0.0],
          "up": [0.0, 0.0, 1.0], "time": 0.0}
    k1 = {"origin": [0.0, 3.0, 0.0], "target": [0.0, 0.0, 0.0],
          "up": [0.0, 0.0, 1.0], "time": 1.0}

    lin = trajectory_fit.build_trajectory([k0, k1], [("linear", 4)])
    assert len(lin) == 6  # 2 keyframes + 4 interpolated
    np.testing.assert_allclose(lin[1]["origin"], [2.0, 0.0, 0.0])  # w=0 copy
    np.testing.assert_allclose(lin[3]["origin"], [1.0, 1.5, 0.0])  # midpoint

    sph = trajectory_fit.build_trajectory([k0, k1], [("sphere", 4)])
    # Orbit about the origin: radius lerps 2 -> 3, angle sweeps 90 deg.
    mid = sph[3]["origin"]
    np.testing.assert_allclose(np.linalg.norm(mid), 2.5, rtol=1e-9)
    angle = np.arctan2(mid[1], mid[0])
    np.testing.assert_allclose(angle, np.pi / 4, rtol=1e-9)


def test_look_at_and_transforms_json(tmp_path):
    c2w = trajectory_fit.look_at_c2w([0.0, -2.0, 0.0], [0.0, 0.0, 0.0])
    # Forward is -Z column: camera at -Y looking at origin -> forward = +Y.
    np.testing.assert_allclose(-c2w[:3, 2], [0.0, 1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(c2w[:3, 3], [0.0, -2.0, 0.0])
    # Rotation block is orthonormal.
    r = c2w[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)

    traj = trajectory_fit.build_trajectory(
        [{"origin": [2.0, 0.0, 1.0], "target": [0.0, 0.0, 0.0],
          "up": [0.0, 0.0, 1.0], "time": float(t)} for t in range(3)],
        [("linear", 2), ("linear", 2)])
    out = tmp_path / "transforms_test.json"
    trajectory_fit.save_transforms(str(out), traj)
    data = json.loads(out.read_text())
    assert data["camera_angle_x"] > 0
    assert len(data["frames"]) == len(traj)
    assert data["frames"][0]["file_path"] == "0000.h5"
    assert np.asarray(data["frames"][0]["transform_matrix"]).shape == (4, 4)


def test_smooth_positions_preserves_smooth_path():
    # A path already on a smooth curve survives spline fitting unchanged.
    ts = np.linspace(0.0, 1.0, 9)
    traj = [{"origin": np.array([np.cos(t), np.sin(t), t]),
             "target": np.zeros(3), "up": np.array([0.0, 0.0, 1.0]),
             "time": t} for t in ts]
    smoothed = trajectory_fit.smooth_positions(
        [dict(kf) for kf in traj], smoothing=0.0)
    for raw, fit in zip(traj, smoothed):
        np.testing.assert_allclose(fit["origin"], raw["origin"], atol=1e-7)


def test_trajectory_cli(tmp_path):
    spec = {
        "keyframes": [
            {"origin": [2.0, 0.0, 0.5], "target": [0, 0, 0],
             "up": [0, 0, 1], "time": 0.0},
            {"origin": [0.0, 2.0, 0.5], "target": [0, 0, 0],
             "up": [0, 0, 1], "time": 1.0},
        ],
        "interpolations": [["sphere", 6]],
        "center": [0.0, 0.0, 0.5],
    }
    kf_path = tmp_path / "keyframes.json"
    kf_path.write_text(json.dumps(spec))
    out_path = tmp_path / "transforms.json"
    trajectory_fit.main([str(kf_path), str(out_path), "--smooth", "0.0"])
    data = json.loads(out_path.read_text())
    assert len(data["frames"]) == 8


def test_transient_video_frames_tone_mapping(tmp_path):
    from neural_radiance_caching_tpu.utils import videos_utils as vu

    rng = np.random.default_rng(0)
    tr = rng.uniform(size=(8, 6, 5, 3)).astype(np.float32)
    frames = vu.transient_video_frames(tr)
    assert frames.shape == (5, 8, 6, 3) and frames.dtype == np.uint8
    # Reference tone map (transient_utils_no_torch.py:143-151): bin/2 +
    # integrated/4, gamma 1/2.2, clip.
    t, i, j = 2, 1, 1
    expect = np.clip(
        np.clip(tr[i, j, t] / 2.0 + tr[i, j].sum(0) / 4.0, 0, None)
        ** (1 / 2.2), 0, 1)
    np.testing.assert_allclose(
        frames[t, i, j] / 255.0, expect, atol=1 / 255 + 1e-6)
    # Background-off frames are strictly dimmer.
    assert vu.transient_video_frames(tr, background=False).mean() < frames.mean()
    out = tmp_path / "flight.mp4"
    assert vu.create_video_from_transient(tr, str(out), fps=10)
