"""Camera math: pixel→ray casting and pose utilities.

Behavioral parity target: reference internal/camera_utils.py (pixels_to_rays
:896-1074, cast_ray_batch :1225-1329). Perspective (pinhole) projection is
implemented this round; fisheye/panoramic and distortion solves land with the
COLMAP loaders.
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.utils import pytrees


class ProjectionType(enum.Enum):
    PERSPECTIVE = "perspective"
    FISHEYE = "fisheye"
    FISHEYE_EQUISOLID = "fisheye_equisolid"
    PANORAMIC = "pano"


def get_pixtocam(focal, width, height, xnp=np):
    """Inverse intrinsic matrix for a centered pinhole camera."""
    camtopix = xnp.array(
        [[focal, 0, 0.5 * width], [0, focal, 0.5 * height], [0, 0, 1]], dtype=xnp.float32
    )
    return xnp.linalg.inv(camtopix)


def intrinsic_matrix(fx, fy, cx, cy, xnp=np):
    """Intrinsic matrix from focal lengths + principal point
    (camera_utils.py parity)."""
    return xnp.array(
        [[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=xnp.float32
    )


def pixel_coordinates(width, height, xnp=np):
    """Integer (x, y) pixel grids, 'xy' indexing."""
    return xnp.meshgrid(xnp.arange(width), xnp.arange(height), indexing="xy")


def pad_poses(p):
    """[... 3 4] -> [... 4 4] with a bottom (0,0,0,1) row."""
    bottom = np.broadcast_to([0, 0, 0, 1.0], p[..., :1, :4].shape)
    return np.concatenate([p[..., :3, :4], bottom], axis=-2)


def unpad_poses(p):
    return p[..., :3, :4]


def viewmatrix(lookdir, up, position):
    """Camera-to-world from viewing direction + up + position."""

    def normalize(x):
        return x / (np.linalg.norm(x) + 1e-12)

    vec2 = normalize(lookdir)
    vec0 = normalize(np.cross(up, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, position], axis=1)


def average_pose(poses):
    """Mean camera pose (mip-NeRF 360 recentering)."""
    position = poses[:, :3, 3].mean(0)
    z_axis = poses[:, :3, 2].mean(0)
    up = poses[:, :3, 1].mean(0)
    return viewmatrix(z_axis, up, position)


def recenter_poses(poses):
    """Recenter around the average pose; returns (poses, transform [4,4])."""
    cam2world = average_pose(poses)
    transform = np.linalg.inv(pad_poses(cam2world[None])[0])
    poses = transform @ pad_poses(poses)
    return unpad_poses(poses), transform


def transform_poses_pca(poses):
    """Align the world frame to the principal axes of the camera positions
    (camera_utils.transform_poses_pca parity; standard mip-360 math)."""
    t = poses[:, :3, 3]
    t_mean = t.mean(axis=0)
    t = t - t_mean

    eigval, eigvec = np.linalg.eig(t.T @ t)
    inds = np.argsort(eigval)[::-1]
    eigvec = eigvec[:, inds]
    rot = eigvec.T
    if np.linalg.det(rot) < 0:
        rot = np.diag(np.array([1, 1, -1])) @ rot

    transform = np.concatenate([rot, rot @ -t_mean[:, None]], -1)
    poses_recentered = unpad_poses(transform @ pad_poses(poses))
    transform = np.concatenate([transform, np.eye(4)[3:]], axis=0)

    # Flip coordinate system if z component of y-axis is negative.
    if poses_recentered.mean(axis=0)[2, 1] < 0:
        poses_recentered = np.diag(np.array([1, -1, -1])) @ poses_recentered
        transform = np.diag(np.array([1, -1, -1, 1])) @ transform

    # Scale to fit positions in [-1, 1]^3.
    scale_factor = 1.0 / np.max(np.abs(poses_recentered[:, :3, 3]))
    poses_recentered[:, :3, 3] *= scale_factor
    transform = np.diag(np.array([scale_factor] * 3 + [1])) @ transform
    return poses_recentered, transform


def focus_point_fn(poses):
    """Least-squares point minimizing distance to all cameras' z-axes."""
    directions = poses[:, :3, 2:3]
    origins = poses[:, :3, 3:4]
    m = np.eye(3) - directions * np.transpose(directions, [0, 2, 1])
    mt_m = np.transpose(m, [0, 2, 1]) @ m
    return np.linalg.inv(mt_m.mean(0)) @ (mt_m @ origins).mean(0)[:, 0]


def transform_poses_focus(poses):
    """Recenter on the cameras' mutual focus point, average-up as +z
    (camera_utils.transform_poses_focus parity)."""
    focus = focus_point_fn(poses)
    up = poses[:, :3, 1].mean(0)
    up = up / np.linalg.norm(up)
    # Rotation taking `up` to +z.
    z = np.array([0.0, 0.0, 1.0])
    v = np.cross(up, z)
    s = np.linalg.norm(v)
    c = up @ z
    if s < 1e-8:
        rot = np.eye(3) if c > 0 else np.diag(np.array([1.0, -1.0, -1.0]))
    else:
        vx = np.array(
            [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]]
        )
        rot = np.eye(3) + vx + vx @ vx * ((1 - c) / s**2)
    transform = np.concatenate([rot, rot @ -focus[:, None]], -1)
    out = unpad_poses(pad_poses(transform[None])[0] @ pad_poses(poses))
    transform = np.concatenate([transform, np.eye(4)[3:]], axis=0)
    return out, transform


def generate_ellipse_path(poses, n_frames=120, z_variation=0.0, z_phase=0.0,
                          lock_up=False, relative_to_first_pose=False,
                          flip_y=False, first_pose=None):
    """Elliptical render path around the scene (camera_utils parity)."""
    if first_pose is not None:
        ref = np.array(first_pose)[:3, :4]
    elif relative_to_first_pose:
        ref = poses[0]
    else:
        ref = average_pose(poses)

    center = poses[:, :3, 3].mean(axis=0)
    offsets = poses[:, :3, 3] - center
    sc = np.percentile(np.abs(offsets), 90, axis=0)

    theta = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    positions = center + np.stack(
        [
            sc[0] * np.cos(theta),
            sc[1] * np.sin(theta) * (-1.0 if flip_y else 1.0),
            sc[2] * z_variation * np.sin(theta + z_phase),
        ],
        axis=-1,
    )
    positions = positions + ref[:3, 3] * 0.0  # path stays around the scene center

    up = ref[:3, 1] if lock_up else poses[:, :3, 1].mean(0)
    look_at = center
    return np.stack(
        [viewmatrix(look_at - p, up, p) for p in positions], axis=0
    ).astype(np.float32)


def gather_cameras(cameras, inds):
    """Index each (possibly None / shared) camera array by inds.

    Only arrays whose leading axis matches the number of cameras (taken from
    the first element, the poses) are gathered; shared intrinsics pass through.
    """
    n = np.asarray(cameras[0]).shape[0]

    def gather(x):
        if x is None:
            return None
        if isinstance(x, dict):
            return {k: gather(v) for k, v in x.items()}
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == n:
            return x[inds]
        return x

    return tuple(gather(c) for c in cameras)


def pixels_to_rays(
    pix_x_int,
    pix_y_int,
    pixtocams,
    camtoworlds,
    distortion_params=None,
    camtype=ProjectionType.PERSPECTIVE,
    rng=None,
    jitter=0,
    xnp=np,
    virtual_camtoworlds=None,
):
    """Cast rays through pixel centers; returns all per-ray camera fields.

    Radii follow the mip-NeRF convention: half the distance to the
    neighboring pixels' directions, scaled by 2/sqrt(12).
    """
    if camtype != ProjectionType.PERSPECTIVE:
        raise NotImplementedError(f"camtype {camtype} not yet implemented")

    def pix_to_dir(x, y):
        return xnp.stack([x + 0.5, y + 0.5, xnp.ones_like(x)], axis=-1)

    if jitter > 0 and rng is not None:
        k1, k2 = jax.random.split(rng)
        if jitter == 1:
            dx = jax.random.uniform(k1, shape=pix_x_int.shape) - 0.5
            dy = jax.random.uniform(k2, shape=pix_y_int.shape) - 0.5
        else:
            dx = jax.random.normal(k1, shape=pix_x_int.shape) * 0.5
            dy = jax.random.normal(k2, shape=pix_y_int.shape) * 0.5
    else:
        dx = 0.0
        dy = 0.0

    pixel_dirs_stacked = xnp.stack(
        [
            pix_to_dir(pix_x_int + dx, pix_y_int + dy),
            pix_to_dir(pix_x_int + 1 + dx, pix_y_int + dy),
            pix_to_dir(pix_x_int + dx, pix_y_int + 1 + dy),
        ],
        axis=0,
    )

    mat_vec_mul = lambda a, b: xnp.matmul(a, b[..., None])[..., 0]
    camera_dirs_stacked = mat_vec_mul(pixtocams, pixel_dirs_stacked)

    if distortion_params is not None:
        raise NotImplementedError("distortion not yet implemented")

    # OpenCV → OpenGL.
    camera_dirs_stacked = xnp.matmul(
        camera_dirs_stacked, xnp.diag(xnp.array([1.0, -1.0, -1.0], dtype=xnp.float32))
    )
    imageplane = camera_dirs_stacked[0, ..., :2]

    directions_stacked = mat_vec_mul(camtoworlds[..., :3, :3], camera_dirs_stacked)
    directions, ddx, ddy = directions_stacked

    origins = xnp.broadcast_to(camtoworlds[..., :3, -1], directions.shape)
    viewdirs = directions / xnp.linalg.norm(directions, axis=-1, keepdims=True)

    look = xnp.broadcast_to(-camtoworlds[..., :3, 2], directions.shape)
    up = xnp.broadcast_to(camtoworlds[..., :3, 1], directions.shape)

    if virtual_camtoworlds is None:
        vcam_look, vcam_up, vcam_origins = look, up, origins
    else:
        vcam_look = xnp.broadcast_to(-virtual_camtoworlds[..., :3, 2], directions.shape)
        vcam_up = xnp.broadcast_to(virtual_camtoworlds[..., :3, 1], directions.shape)
        vcam_origins = xnp.broadcast_to(virtual_camtoworlds[..., :3, -1], directions.shape)

    dx_norm = xnp.linalg.norm(ddx - directions, axis=-1)
    dy_norm = xnp.linalg.norm(ddy - directions, axis=-1)
    radii = (0.5 * (dx_norm + dy_norm))[..., None] * 2 / xnp.sqrt(12)

    return (
        origins,
        directions,
        viewdirs,
        radii,
        imageplane,
        look,
        up,
        origins,
        vcam_look,
        vcam_up,
        vcam_origins,
    )


def cast_ray_batch(
    cameras,
    lights,
    pixels: pytrees.Pixels,
    camtype=ProjectionType.PERSPECTIVE,
    rng=None,
    jitter=0,
    xnp=np,
    impulse_response=None,
    virtual_cameras=None,
) -> pytrees.Rays:
    """Turn a Pixels batch into a Rays batch by indexing per-ray cameras.

    `cameras` is (pixtocams [N,3,3], camtoworlds [N,3,4], distortion, _) and
    `lights` is [N_lights or N_cams, 3]; both gathered by cam_idx/light_idx
    (camera_utils.py:1225-1329).
    """
    pixtocams, camtoworlds = cameras[0], cameras[1]
    cam_idx = pixels.cam_idx[..., 0]
    light_idx = pixels.light_idx[..., 0]

    # Shared-intrinsics datasets store a single [1, 3, 3] pixtocam.
    pixtocam = pixtocams[cam_idx if pixtocams.shape[0] > 1 else xnp.zeros_like(cam_idx)]
    camtoworld = camtoworlds[cam_idx]
    light = lights[light_idx if lights.shape[0] > 1 else xnp.zeros_like(light_idx)]
    virtual_camtoworld = (
        virtual_cameras[1][cam_idx] if virtual_cameras is not None else None
    )

    (
        origins,
        directions,
        viewdirs,
        radii,
        imageplane,
        look,
        up,
        cam_origins,
        vcam_look,
        vcam_up,
        vcam_origins,
    ) = pixels_to_rays(
        pixels.pix_x_int,
        pixels.pix_y_int,
        pixtocam,
        camtoworld,
        camtype=camtype,
        rng=rng,
        jitter=jitter,
        xnp=xnp,
        virtual_camtoworlds=virtual_camtoworld,
    )

    return pytrees.Rays(
        origins=origins,
        directions=directions,
        viewdirs=viewdirs,
        radii=radii,
        lights=light,
        imageplane=imageplane,
        look=look,
        up=up,
        cam_origins=cam_origins,
        vcam_look=vcam_look,
        vcam_up=vcam_up,
        vcam_origins=vcam_origins,
        lossmult=pixels.lossmult,
        near=pixels.near,
        far=pixels.far,
        cam_idx=pixels.cam_idx,
        light_idx=pixels.light_idx,
        pix_x_int=pixels.pix_x_int,
        pix_y_int=pixels.pix_y_int,
        exposure_idx=pixels.exposure_idx,
        exposure_values=pixels.exposure_values,
        impulse_response=impulse_response,
    )


def generate_spherical_poses(n, radius, center=np.zeros(3), up_axis=2, min_elevation=0.2,
                             max_elevation=0.9, seed=0):
    """Camera-to-world matrices on a sphere looking at `center` (OpenGL)."""
    rng = np.random.RandomState(seed)
    poses = []
    for i in range(n):
        azim = 2 * np.pi * i / n + rng.uniform(0, 0.1)
        elev = rng.uniform(min_elevation, max_elevation) * np.pi / 2
        pos = center + radius * np.array(
            [np.cos(azim) * np.cos(elev), np.sin(azim) * np.cos(elev), np.sin(elev)]
        )
        forward = center - pos
        forward = forward / np.linalg.norm(forward)
        world_up = np.zeros(3)
        world_up[up_axis] = 1.0
        right = np.cross(forward, world_up)
        right = right / np.linalg.norm(right)
        cam_up = np.cross(right, forward)
        # OpenGL convention: -z is forward.
        rot = np.stack([right, cam_up, -forward], axis=-1)
        pose = np.concatenate([rot, pos[:, None]], axis=-1)
        poses.append(pose.astype(np.float32))
    return np.stack(poses)
