"""Lens distortion, fisheye/panoramic projection, and render-path generation."""

import numpy as np

from neural_radiance_caching_tpu.data import camera_utils
from neural_radiance_caching_tpu.utils import pytrees


DISTORTION = {"k1": 0.05, "k2": -0.01, "p1": 0.002, "p2": -0.001}


def test_distortion_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.uniform(-0.4, 0.4, (1000,))
    y = rng.uniform(-0.4, 0.4, (1000,))
    xd, yd = camera_utils.distort_coordinates(x, y, DISTORTION)
    xu, yu = camera_utils.undistort_coordinates(xd, yd, DISTORTION)
    np.testing.assert_allclose(xu, x, atol=1e-6)
    np.testing.assert_allclose(yu, y, atol=1e-6)


def test_pixels_to_rays_distorted_vs_pinhole():
    """Distortion bends off-axis rays but leaves the center ray alone."""
    h = w = 9
    pixtocam = camera_utils.get_pixtocam(focal=10.0, width=w, height=h)
    pose = np.eye(4)[:3, :4].astype(np.float32)
    pix_x, pix_y = camera_utils.pixel_coordinates(w, h)

    out_plain = camera_utils.pixels_to_rays(
        pix_x, pix_y, pixtocam[None], pose[None])
    out_dist = camera_utils.pixels_to_rays(
        pix_x, pix_y, pixtocam[None], pose[None],
        distortion_params={"k1": 0.2})
    vd_plain, vd_dist = out_plain[2], out_dist[2]
    # Center pixel: r=0, no distortion (pixel center lands on the axis
    # halfway between the two middle pixels; use the closest one).
    c = h // 2
    # Corner pixels must differ.
    assert np.abs(vd_plain[0, 0] - vd_dist[0, 0]).max() > 1e-4
    # All rays stay unit length.
    np.testing.assert_allclose(
        np.linalg.norm(vd_dist, axis=-1), 1.0, atol=1e-5)


def test_fisheye_and_panoramic_directions_unit():
    h = w = 8
    pose = np.eye(4)[:3, :4].astype(np.float32)
    pix_x, pix_y = camera_utils.pixel_coordinates(w, h)
    fish = camera_utils.pixels_to_rays(
        pix_x, pix_y,
        camera_utils.get_pixtocam(focal=6.0, width=w, height=h)[None],
        pose[None], camtype=camera_utils.ProjectionType.FISHEYE)
    np.testing.assert_allclose(np.linalg.norm(fish[2], axis=-1), 1.0, atol=1e-5)

    rays = camera_utils.cast_spherical_rays(pose, h, w, near=0.1, far=10.0)
    assert isinstance(rays, pytrees.Rays)
    vd = np.asarray(rays.viewdirs)
    np.testing.assert_allclose(np.linalg.norm(vd, axis=-1), 1.0, atol=1e-4)
    # A panoramic camera covers all octants of the sphere.
    signs = set(map(tuple, np.sign(vd.reshape(-1, 3)).astype(int).tolist()))
    assert len([s for s in signs if 0 not in s]) == 8


def test_cast_pinhole_rays_shapes():
    pose = np.eye(4)[:3, :4].astype(np.float32)
    rays = camera_utils.cast_pinhole_rays(pose, 6, 8, focal=8.0, near=0.1, far=5.0)
    assert rays.origins.shape == (6, 8, 3)
    assert rays.near.shape == (6, 8, 1)
    assert rays.lights.shape == (6, 8, 3)
    assert np.isfinite(np.asarray(rays.radii)).all()


def _ring_poses(n=12, radius=3.0):
    return camera_utils.generate_spherical_poses(n, radius)


def test_generate_spiral_path():
    poses = _ring_poses()
    path = camera_utils.generate_spiral_path(
        poses, bounds=np.array([0.5, 8.0]), n_frames=30)
    assert path.shape == (30, 3, 4)
    # Rotations stay orthonormal.
    rtr = np.einsum("nij,nik->njk", path[:, :3, :3], path[:, :3, :3])
    np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), rtr.shape), atol=1e-5)


def test_generate_interpolated_path():
    poses = _ring_poses(6)
    path = camera_utils.generate_interpolated_path(poses, n_interp=10)
    assert path.shape[0] == 10 * (6 - 1) - 1
    assert path.shape[1:] == (3, 4)
    rtr = np.einsum("nij,nik->njk", path[:, :3, :3], path[:, :3, :3])
    np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), rtr.shape), atol=1e-4)
    # The spline path starts near the first keyframe.
    assert np.linalg.norm(path[0, :3, 3] - poses[0, :3, 3]) < 1.0


def test_cast_ray_batch_with_distortion():
    """Per-camera distortion flows through cast_ray_batch."""
    n_cams, h, w = 2, 4, 4
    pixtocams = np.stack([camera_utils.get_pixtocam(5.0, w, h)] * n_cams)
    poses = np.stack([np.eye(4)[:3, :4]] * n_cams).astype(np.float32)
    cams = (pixtocams, poses, {"k1": 0.1}, None)
    nrays = 8
    pixels = pytrees.Pixels(
        pix_x_int=np.arange(nrays) % w,
        pix_y_int=np.arange(nrays) // w % h,
        lossmult=np.ones((nrays, 1), np.float32),
        near=np.full((nrays, 1), 0.1, np.float32),
        far=np.full((nrays, 1), 5.0, np.float32),
        cam_idx=(np.arange(nrays) % n_cams).reshape(-1, 1).astype(np.int32),
        light_idx=np.zeros((nrays, 1), np.int32),
    )
    lights = poses[:, :3, -1]
    rays = camera_utils.cast_ray_batch(cams, lights, pixels)
    assert np.isfinite(np.asarray(rays.viewdirs)).all()
    cams_plain = (pixtocams, poses, None, None)
    rays_plain = camera_utils.cast_ray_batch(cams_plain, lights, pixels)
    assert np.abs(
        np.asarray(rays.viewdirs) - np.asarray(rays_plain.viewdirs)
    ).max() > 1e-5


def test_convert_to_ndc_projective_consistency():
    """Points along a world ray project onto the straight NDC line.

    The NDC warp's defining property (NeRF appendix C): perspective-project
    any point of the (near-plane-slid) world ray and it must land on
    origins_ndc + s * directions_ndc at the s whose z matches.
    """
    rng = np.random.RandomState(7)
    o = rng.randn(32, 3)
    o[:, 2] = -np.abs(o[:, 2]) - 2.0  # strictly in front (dz < 0 region)
    d = rng.randn(32, 3)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    f, w, h = 12.0, 10.0, 8.0
    pixtocam = np.linalg.inv(camera_utils.intrinsic_matrix(f, f, w / 2, h / 2))
    o_ndc, d_ndc = camera_utils.convert_to_ndc(o, d, pixtocam)
    np.testing.assert_allclose(o_ndc[:, 2], -1.0, atol=1e-6)
    np.testing.assert_allclose((o_ndc + d_ndc)[:, 2], 1.0, atol=1e-6)

    scale_x, scale_y = 1.0 / pixtocam[0, 2], 1.0 / pixtocam[1, 2]
    slide = -(1.0 + o[:, 2]) / d[:, 2]
    near_origin = o + slide[:, None] * d
    for t in (0.25, 3.0, 50.0):
        p = near_origin + t * d
        x_proj = scale_x * p[:, 0] / p[:, 2]
        y_proj = scale_y * p[:, 1] / p[:, 2]
        z_proj = 1.0 + 2.0 / p[:, 2]  # near=1 perspective depth in NDC
        s = (z_proj - o_ndc[:, 2]) / d_ndc[:, 2]
        assert ((0 <= s) & (s < 1)).all()
        np.testing.assert_allclose(o_ndc[:, 0] + s * d_ndc[:, 0], x_proj,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(o_ndc[:, 1] + s * d_ndc[:, 1], y_proj,
                                   rtol=1e-5, atol=1e-6)


def test_pixels_to_rays_ndc_radii_from_origins():
    """With pixtocam_ndc set, rays warp to NDC and radii stay positive."""
    f, res = 10.0, 8
    pixtocam = np.linalg.inv(
        camera_utils.intrinsic_matrix(f, f, res / 2, res / 2)
    )
    camtoworld = np.eye(3, 4)[None]
    pix = np.arange(4, dtype=np.int32)
    out = camera_utils.pixels_to_rays(
        pix, pix, pixtocam[None], camtoworld, pixtocam_ndc=pixtocam
    )
    origins, directions, viewdirs, radii = out[0], out[1], out[2], out[3]
    np.testing.assert_allclose(origins[..., 2], -1.0, atol=1e-5)
    np.testing.assert_allclose(directions[..., 2], 2.0, atol=1e-5)
    # viewdirs stay world-space unit vectors.
    np.testing.assert_allclose(np.linalg.norm(viewdirs, axis=-1), 1.0,
                               atol=1e-5)
    assert (radii > 0).all() and np.isfinite(radii).all()
