"""Camera math: pixel→ray casting, lens distortion, and pose utilities.

Behavioral parity target: reference internal/camera_utils.py (pixels_to_rays
:896-1074, distortion solve :771-886, cast_ray_batch :1225-1329, render paths
:198-231/:306-545, general/pinhole/spherical casting :1332-1442). Supports
perspective, fisheye (equidistant + equisolid), and panoramic projections,
with OpenCV radial/tangential distortion inverted by a fixed-iteration Newton
solve.
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


def viewmatrix(lookdir, up, position, lock_up=False):
    """Camera-to-world from viewing direction + up + position.

    By default `lookdir` is kept exact and `up` is re-orthogonalized; with
    lock_up=True the up vector is kept and the look direction bends instead
    (reference camera_utils.py:147-163).
    """

    def normalize(x):
        return x / (np.linalg.norm(x) + 1e-12)

    vec1 = normalize(up)
    vec2 = normalize(lookdir)
    vec0 = normalize(np.cross(vec1, vec2))
    if lock_up:
        vec2 = normalize(np.cross(vec0, vec1))
    else:
        vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, position], axis=1)


def rotation_about_axis(degrees, axis=0):
    """4x4 rotation about one coordinate axis (camera_utils.py:166-176)."""
    radians = degrees / 180.0 * np.pi
    rot2x2 = np.array(
        [[np.cos(radians), -np.sin(radians)], [np.sin(radians), np.cos(radians)]]
    )
    r = np.eye(3)
    r[1:3, 1:3] = rot2x2
    r = np.roll(np.roll(r, axis, axis=0), axis, axis=1)
    p = np.eye(4)
    p[:3, :3] = r
    return p


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
    (camera_utils.transform_poses_pca parity; standard mip-360 behavior:
    principal-axis rotation, handedness fix, upright flip, unit-box scale)."""
    positions = poses[:, :3, 3]
    center = positions.mean(axis=0)

    # Principal axes via SVD of the centered positions (right singular
    # vectors, descending variance) become the new world axes.
    _, _, axes = np.linalg.svd(positions - center, full_matrices=False)
    if np.linalg.det(axes) < 0:  # keep the frame right-handed
        axes[-1] *= -1.0

    world_from_old = np.eye(4)
    world_from_old[:3, :3] = axes
    world_from_old[:3, 3] = axes @ -center
    aligned = unpad_poses(world_from_old @ pad_poses(poses))

    # Put the average camera "up" into +z (flip the y/z world axes otherwise).
    if aligned[:, 2, 1].mean() < 0:
        aligned = np.diag(np.array([1.0, -1.0, -1.0])) @ aligned
        world_from_old = (
            np.diag(np.array([1.0, -1.0, -1.0, 1.0])) @ world_from_old
        )

    # Scale so every camera position lands inside [-1, 1]^3.
    extent = np.max(np.abs(aligned[:, :3, 3]))
    world_from_old = np.diag(np.array([1 / extent] * 3 + [1.0])) @ world_from_old
    aligned[:, :3, 3] /= extent
    return aligned, world_from_old


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


# --- OpenCV lens distortion (camera_utils.py:771-886) --------------------------


def distort_coordinates(x, y, params):
    """Apply the OpenCV radial (k1..k4) + tangential (p1, p2) model."""
    k1 = params.get("k1", 0.0)
    k2 = params.get("k2", 0.0)
    k3 = params.get("k3", 0.0)
    k4 = params.get("k4", 0.0)
    p1 = params.get("p1", 0.0)
    p2 = params.get("p2", 0.0)
    r2 = x * x + y * y
    # Horner form of k1·r² + k2·r⁴ + k3·r⁶ + k4·r⁸.
    radial = r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
    xd = x * (1.0 + radial) + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * (1.0 + radial) + 2.0 * p2 * x * y + p1 * (r2 + 2.0 * y * y)
    return xd, yd


def undistort_coordinates(xd, yd, params, xnp=np, max_iterations=10, eps=1e-9):
    """Invert distort_coordinates with a fixed-iteration 2D Newton solve.

    Initialized at the distorted point; each step solves the 2x2 linear
    system J·Δ = -F with the closed-form Jacobian of the distortion model.
    Fixed iteration count keeps it jittable (camera_utils.py:844-886).
    """
    k1 = params.get("k1", 0.0)
    k2 = params.get("k2", 0.0)
    k3 = params.get("k3", 0.0)
    k4 = params.get("k4", 0.0)
    p1 = params.get("p1", 0.0)
    p2 = params.get("p2", 0.0)

    x = xd * xnp.ones_like(xd)
    y = yd * xnp.ones_like(yd)
    for _ in range(max_iterations):
        r2 = x * x + y * y
        d = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
        # d/d(r²) of the radial factor, then chain rule through r² = x²+y².
        d_r = k1 + r2 * (2.0 * k2 + r2 * (3.0 * k3 + r2 * (4.0 * k4)))
        fx = d * x + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x) - xd
        fy = d * y + 2.0 * p2 * x * y + p1 * (r2 + 2.0 * y * y) - yd
        jxx = d + 2.0 * x * x * d_r + 2.0 * p1 * y + 6.0 * p2 * x
        jxy = 2.0 * x * y * d_r + 2.0 * p1 * x + 2.0 * p2 * y
        jyx = 2.0 * x * y * d_r + 2.0 * p2 * y + 2.0 * p1 * x
        jyy = d + 2.0 * y * y * d_r + 2.0 * p2 * x + 6.0 * p1 * y
        det = jxx * jyy - jxy * jyx
        safe = xnp.abs(det) > eps
        inv_det = xnp.where(safe, 1.0 / xnp.where(safe, det, 1.0), 0.0)
        x = x - (fx * jyy - fy * jxy) * inv_det
        y = y - (fy * jxx - fx * jyx) * inv_det
    return x, y


def convert_to_ndc(origins, directions, pixtocam, near=1.0, xnp=np):
    """Map forward-facing rays into the shared projective NDC cube.

    The standard NeRF NDC warp (Mildenhall et al. 2020, appendix C;
    behavioral parity: reference camera_utils.py:51-118): rays are slid
    along themselves onto the z = -near plane, then the near intersection
    projects to z = -1 and the infinite far point to z = +1, so [near, inf)
    becomes t_ndc in [0, 1). Only the two projective scale factors are
    needed from the inverse intrinsics. Returned directions are NOT unit
    length by construction.
    """
    slide = -(near + origins[..., 2]) / directions[..., 2]
    origins = origins + slide[..., None] * directions

    # pixtocam[i, 2] carries -cx/f (resp. -cy/f) for a centered pinhole, so
    # its reciprocal is the projective half-frustum scale.
    scale_x = 1.0 / pixtocam[0, 2]
    scale_y = 1.0 / pixtocam[1, 2]

    def project(p, z_plane):
        return xnp.stack(
            [
                scale_x * p[..., 0] / p[..., 2],
                scale_y * p[..., 1] / p[..., 2],
                xnp.full_like(p[..., 2], z_plane),
            ],
            axis=-1,
        )

    near_points = project(origins, -1.0)
    # The far endpoint depends only on the direction (t -> infinity).
    far_points = project(directions, 1.0)
    return near_points, far_points - near_points


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
    pixtocam_ndc=None,
):
    """Cast rays through pixel centers; returns all per-ray camera fields.

    Radii follow the mip-NeRF convention: half the distance to the
    neighboring pixels' directions, scaled by 2/sqrt(12).
    """

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
        dx, dy = 0.0, 0.0

    # Probe each pixel plus its +x and +y neighbours in one stacked batch;
    # the neighbour directions feed the mip radii below.
    pixel_dirs_stacked = xnp.stack(
        [
            pix_to_dir(pix_x_int + ox + dx, pix_y_int + oy + dy)
            for ox, oy in ((0, 0), (1, 0), (0, 1))
        ],
        axis=0,
    )

    mat_vec_mul = lambda a, b: xnp.matmul(a, b[..., None])[..., 0]
    camera_dirs_stacked = mat_vec_mul(pixtocams, pixel_dirs_stacked)

    if distortion_params is not None:
        # Stored params describe the forward (world→image) distortion; ray
        # casting needs the inverse, solved per pixel.
        x, y = undistort_coordinates(
            camera_dirs_stacked[..., 0],
            camera_dirs_stacked[..., 1],
            distortion_params,
            xnp=xnp,
        )
        camera_dirs_stacked = xnp.stack([x, y, xnp.ones_like(x)], axis=-1)

    if camtype in (ProjectionType.FISHEYE, ProjectionType.FISHEYE_EQUISOLID):
        # Image-plane radius (in focal units) → polar angle.
        r = xnp.sqrt(
            xnp.sum(xnp.square(camera_dirs_stacked[..., :2]), axis=-1)
        )
        if camtype == ProjectionType.FISHEYE:
            theta = xnp.minimum(xnp.pi, r)  # equidistant: θ = r
        else:
            theta = 2.0 * xnp.arcsin(r / 2.0)  # equisolid: r = 2 sin(θ/2)
        sin_over_r = xnp.sin(theta) / xnp.maximum(r, 1e-12)
        camera_dirs_stacked = xnp.stack(
            [
                camera_dirs_stacked[..., 0] * sin_over_r,
                camera_dirs_stacked[..., 1] * sin_over_r,
                xnp.cos(theta),
            ],
            axis=-1,
        )
    elif camtype == ProjectionType.PANORAMIC:
        # Equirect: pixtocam maps pixels to (θ azimuth, φ polar). Negated y/z
        # follow the OpenCV convention (camera_utils.py:1016-1029).
        theta = camera_dirs_stacked[..., 0]
        phi = camera_dirs_stacked[..., 1]
        camera_dirs_stacked = xnp.stack(
            [
                -xnp.sin(phi) * xnp.sin(theta),
                -xnp.cos(phi),
                -xnp.sin(phi) * xnp.cos(theta),
            ],
            axis=-1,
        )

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

    if pixtocam_ndc is None:
        dx_norm = xnp.linalg.norm(ddx - directions, axis=-1)
        dy_norm = xnp.linalg.norm(ddy - directions, axis=-1)
    else:
        # Forward-facing NDC scenes: warp rays into the projective cube.
        # Neighbour-pixel spacing (for the mip radii) is measured between
        # warped ORIGINS — NDC directions aren't unit length, so direction
        # deltas would no longer track footprint size.
        origins_ndc_dx, _ = convert_to_ndc(origins, ddx, pixtocam_ndc, xnp=xnp)
        origins_ndc_dy, _ = convert_to_ndc(origins, ddy, pixtocam_ndc, xnp=xnp)
        origins, directions = convert_to_ndc(
            origins, directions, pixtocam_ndc, xnp=xnp
        )
        dx_norm = xnp.linalg.norm(origins_ndc_dx - origins, axis=-1)
        dy_norm = xnp.linalg.norm(origins_ndc_dy - origins, axis=-1)
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

    `cameras` is (pixtocams [N,3,3], camtoworlds [N,3,4], distortion,
    pixtocam_ndc) and `lights` is [N_lights or N_cams, 3]; both gathered by
    cam_idx/light_idx (camera_utils.py:1225-1329). A non-None pixtocam_ndc
    ([3,3], shared across cameras) warps the cast rays into NDC space
    (forward-facing datasets: PixelRig).
    """
    pixtocams, camtoworlds = cameras[0], cameras[1]
    distortion_params = cameras[2] if len(cameras) > 2 else None
    pixtocam_ndc = cameras[3] if len(cameras) > 3 else None
    cam_idx = pixels.cam_idx[..., 0]
    light_idx = pixels.light_idx[..., 0]
    if isinstance(distortion_params, dict):
        # Per-camera arrays are gathered by cam_idx; shared floats pass through.
        distortion_params = {
            k: (
                v[cam_idx]
                if hasattr(v, "ndim") and np.asarray(v).ndim >= 1
                else v
            )
            for k, v in distortion_params.items()
        }

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
        distortion_params=distortion_params,
        camtype=camtype,
        rng=rng,
        jitter=jitter,
        xnp=xnp,
        virtual_camtoworlds=virtual_camtoworld,
        pixtocam_ndc=pixtocam_ndc,
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


# --- free-camera ray batches (camera_utils.py:1332-1442) -----------------------


def cast_general_rays(
    camtoworld,
    pixtocam,
    height,
    width,
    near,
    far,
    distortion_params=None,
    camtype=ProjectionType.PERSPECTIVE,
    rng=None,
    jitter=0,
    cam_idx=0,
    light_idx=0,
    lights=None,
    xnp=np,
):
    """Full-image ray batch for an arbitrary camera (not tied to a dataset)."""
    pix_x_int, pix_y_int = pixel_coordinates(width, height, xnp=np)
    pix_x_int = xnp.asarray(pix_x_int)
    pix_y_int = xnp.asarray(pix_y_int)

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
        pix_x_int,
        pix_y_int,
        xnp.asarray(pixtocam, xnp.float32),
        xnp.asarray(camtoworld, xnp.float32)[..., :3, :4],
        distortion_params=distortion_params,
        camtype=camtype,
        rng=rng,
        jitter=jitter,
        xnp=xnp,
    )

    scalar = lambda v: xnp.broadcast_to(v, pix_x_int.shape)[..., None]
    if lights is None:
        lights = xnp.asarray(camtoworld, xnp.float32)[..., :3, -1]
    lights = xnp.broadcast_to(lights, directions.shape)
    return pytrees.Rays(
        origins=origins,
        directions=directions,
        viewdirs=viewdirs,
        radii=radii,
        lights=lights,
        imageplane=imageplane,
        look=look,
        up=up,
        cam_origins=cam_origins,
        vcam_look=vcam_look,
        vcam_up=vcam_up,
        vcam_origins=vcam_origins,
        lossmult=scalar(1.0),
        near=scalar(xnp.float32(near)),
        far=scalar(xnp.float32(far)),
        cam_idx=scalar(1).astype(xnp.int32) * cam_idx,
        light_idx=scalar(1).astype(xnp.int32) * light_idx,
        pix_x_int=pix_x_int,
        pix_y_int=pix_y_int,
    )


def cast_pinhole_rays(camtoworld, height, width, focal, near, far, rng=None,
                      jitter=0, xnp=np, **kwargs):
    """Pinhole full-image ray batch (camera_utils.py:1386-1412)."""
    return cast_general_rays(
        camtoworld,
        get_pixtocam(focal, width, height, xnp=np),
        height,
        width,
        near,
        far,
        camtype=ProjectionType.PERSPECTIVE,
        rng=rng,
        jitter=jitter,
        xnp=xnp,
        **kwargs,
    )


def cast_spherical_rays(camtoworld, height, width, near, far, rng=None,
                        jitter=0, light_idx=0, xnp=np, **kwargs):
    """Panoramic (equirect) ray batch from one pose — the Trainer's secondary
    visualization probe camera (camera_utils.py:1415-1442)."""
    pixtocam = np.diag(
        np.array([2.0 * np.pi / width, np.pi / height, 1.0], np.float32)
    )
    return cast_general_rays(
        camtoworld,
        pixtocam,
        height,
        width,
        near,
        far,
        camtype=ProjectionType.PANORAMIC,
        rng=rng,
        jitter=jitter,
        light_idx=light_idx,
        xnp=xnp,
        **kwargs,
    )


# --- render-path generation (camera_utils.py:193-231, 411-545) -----------------

# Forward-facing spiral heuristics (camera_utils.py:193-195).
NEAR_STRETCH = 0.9
FAR_STRETCH = 5.0
FOCUS_DISTANCE = 0.75


def generate_spiral_path(poses, bounds, n_frames=120, n_rots=2, zrate=0.5):
    """Forward-facing spiral render path (LLFF-style)."""
    near_bound = bounds.min() * NEAR_STRETCH
    far_bound = bounds.max() * FAR_STRETCH
    # Focus depth: disparity-space blend of the near/far bounds.
    focal = 1 / ((1 - FOCUS_DISTANCE) / near_bound + FOCUS_DISTANCE / far_bound)

    # Spiral radius per axis: 90th percentile of |camera position|, with a
    # homogeneous 1 appended so the offsets transform as points.
    radii = np.append(np.percentile(np.abs(poses[:, :3, 3]), 90, axis=0), 1.0)

    center_pose = average_pose(poses)
    mean_up = poses[:, :3, 1].mean(0)
    target = center_pose @ np.array([0.0, 0.0, -focal, 1.0])
    angles = np.linspace(0.0, 2.0 * np.pi * n_rots, n_frames, endpoint=False)
    offsets = radii * np.stack(
        [np.cos(angles), -np.sin(angles), -np.sin(angles * zrate),
         np.ones_like(angles)], axis=-1)
    eyes = offsets @ center_pose.T
    return np.stack(
        [viewmatrix(eye - target, mean_up, eye) for eye in eyes], axis=0)


def generate_interpolated_path(
    poses,
    n_interp,
    spline_degree=5,
    smoothness=0.03,
    rot_weight=0.1,
    lock_up=False,
    fixed_up_vector=None,
    lookahead_i=None,
    const_speed=False,
    n_buffer=None,
    periodic=False,
):
    """Smooth B-spline path through keyframe poses (camera_utils.py:411-545).

    Each pose is converted to a (position, lookat-point, up-point) triple so
    rotation and translation interpolate in one consistent space; the spline
    runs over the stacked 9-vector and is converted back to view matrices.
    Returns (n_interp * (n_keyframes - 1)) poses of shape [N, 3, 4].
    """
    import scipy.interpolate

    def poses_to_points(ps, dist):
        pos = ps[:, :3, -1]
        lookat = pos - dist * ps[:, :3, 2]
        up = pos + dist * ps[:, :3, 1]
        return np.stack([pos, lookat, up], 1)

    def points_to_poses(points):
        out = []
        for i in range(len(points)):
            pos, lookat_point, up_point = points[i]
            if lookahead_i is not None and i + lookahead_i < len(points):
                lookat = pos - points[i + lookahead_i][0]
            else:
                lookat = pos - lookat_point
            up = (up_point - pos) if fixed_up_vector is None else fixed_up_vector
            out.append(viewmatrix(lookat, up, pos, lock_up=lock_up))
        return np.array(out)

    def insert_buffer_poses(ps, nb):
        dz = np.mean(np.linalg.norm(ps[1:, :3, 3] - ps[:-1, :3, 3], axis=-1))

        def shift(pose, d):
            result = np.copy(pose)
            z = result[:3, 2] / np.linalg.norm(result[:3, 2])
            result[:3, 3] += z * d
            return result

        prefix = np.stack([shift(ps[0], (i + 1) * dz) for i in range(nb)])[::-1]
        suffix = np.stack([shift(ps[-1], -(i + 1) * dz) for i in range(nb)])
        return np.concatenate([prefix, ps, suffix])

    def interp(points, u, k, s):
        sh = points.shape
        pts = np.reshape(points, (sh[0], -1))
        k = min(k, sh[0] - 1)
        tck, u_keyframes = scipy.interpolate.splprep(pts.T, k=k, s=s, per=periodic)
        new_points = np.array(scipy.interpolate.splev(u, tck))
        return np.reshape(new_points.T, (len(u), sh[1], sh[2])), u_keyframes

    if n_buffer is not None:
        poses = insert_buffer_poses(poses, n_buffer)
    points = poses_to_points(poses, dist=rot_weight)
    n_frames = n_interp * (points.shape[0] - 1)
    u = np.linspace(0, 1, n_frames, endpoint=True)
    new_points, u_keyframes = interp(points, u=u, k=spline_degree, s=smoothness)
    out_poses = points_to_poses(new_points)

    if n_buffer is not None:
        lo, hi = u_keyframes[n_buffer], u_keyframes[-n_buffer - 1]
        mask = (u >= lo) & (u <= hi)
        out_poses, u = out_poses[mask], u[mask]

    if const_speed:
        from neural_radiance_caching_tpu.ops import stepfun

        positions = out_poses[:, :3, -1]
        lengths = np.linalg.norm(positions[1:] - positions[:-1], axis=-1)
        u = np.asarray(
            stepfun.sample(None, u, np.log(lengths), len(out_poses) + 1)
        )
        new_points, _ = interp(points, u=u, k=spline_degree, s=smoothness)
        out_poses = points_to_poses(new_points)

    return out_poses[:-1]


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
