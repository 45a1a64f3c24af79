"""Datasets and ray batching.

Behavioral parity target: reference internal/datasets.py (Dataset ABC
:591-1066, RayBatcher :1069-1150, pose loaders :333-555, loaders :1169-3770).

All 22 reference loaders are implemented (blender, blender_active,
transient_simulation[_itof], fwp_transient_captured, orb, open_illum, neilf,
real, fipt_real/synthetic, glossy_real/synthetic, llff, tat_nerfpp, tat_fvs,
dtu, rtmv, pixelrig, aerial, preloaded) plus the procedural
synthetic_spheres scene used by tests/benchmarks. PixelRig/Aerial read
cameras from an open JSON/npz encoding (_read_sfm_camera) because the
reference's Google-internal CameraProto path is dead code even upstream.

Batching is host-side numpy: `next_train` draws random pixels (from stacked
images, a flattened pixel table, or transient h5 sample streams), casts them
to rays, and the training loop device_puts the batch with a data-axis
NamedSharding (no per-device reshape, see parallel.mesh).
"""

from __future__ import annotations

import io
import json
import os
import queue
import threading
from typing import Optional

import jax
import numpy as np

from neural_radiance_caching_tpu.data import camera_utils, env_maps
from neural_radiance_caching_tpu.data import io as io_lib
from neural_radiance_caching_tpu.ops import image as image_ops
from neural_radiance_caching_tpu.utils import pytrees


def load_dataset(split, data_dir, config, **kwargs):
    """Dataset dispatcher (datasets.py:182-206)."""
    loaders = {
        "blender": Blender,
        "blender_active": BlenderActive,
        "transient_simulation": TransientSimulation,
        "transient_simulation_itof": TransientSimulationIToF,
        "fwp_transient_captured": FWPTransientCaptured,
        "orb": ORB,
        "open_illum": OpenIllum,
        "neilf": Neilf,
        "real": Real,
        "fipt_real": FIPTReal,
        "fipt_synthetic": FIPTSynthetic,
        "glossy_real": GlossyReal,
        "glossy_synthetic": GlossySynthetic,
        "llff": LLFF,
        "tat_nerfpp": TanksAndTemplesNerfPP,
        "tat_fvs": TanksAndTemplesFVS,
        "dtu": DTU,
        "rtmv": RTMV,
        "pixelrig": PixelRig,
        "aerial": Aerial,
        "preloaded": PreloadedData,
        "synthetic_spheres": SyntheticSpheres,
    }
    return loaders[config.dataset_loader](split, data_dir, config, **kwargs)


# --- pose loaders ----------------------------------------------------------------


def _extract_ngp_intrinsics(frame, w, h):
    focal_keys = ["fl_x", "fl_y", "camera_angle_x", "camera_angle_y", "focal_in_mm"]
    if not any(k in frame for k in focal_keys):
        return None
    cx = frame.get("cx", w / 2.0)
    cy = frame.get("cy", h / 2.0)
    if "focal_in_mm" in frame:
        fx = w * frame["focal_in_mm"] / frame["sensor_size_horizontal_in_mm"]
    elif "fl_x" in frame:
        fx = frame["fl_x"]
    else:
        fx = 0.5 * w / np.tan(0.5 * float(frame["camera_angle_x"]))
    if "fl_y" in frame:
        fy = frame["fl_y"]
    elif "camera_angle_y" in frame:
        fy = 0.5 * h / np.tan(0.5 * float(frame["camera_angle_y"]))
    else:
        fy = fx
    return np.linalg.inv(camera_utils.intrinsic_matrix(fx, fy, cx, cy))


def _extract_distortion(frame):
    coeffs = ["k1", "k2", "p1", "p2"]
    if not any(c in frame for c in coeffs):
        return None
    return {c: frame.get(c, 0.0) for c in coeffs}


def _meta_camtype(meta):
    if "camera_type" in meta:
        if "fisheye" in meta["camera_type"]:
            return camera_utils.ProjectionType.FISHEYE_EQUISOLID
        return camera_utils.ProjectionType(meta["camera_type"])
    return camera_utils.ProjectionType.PERSPECTIVE


def load_ngp_posedata(config, data_dir, pose_file_name="transforms.json",
                      require_files=False):
    """Parse an instant-ngp/nerf-synthetic transforms JSON
    (datasets.py:452-555).

    Returns (names, camtoworlds [N,3,4 as stored NxMx4], pixtocams,
    distortion_params, camtype, nameprefixes)."""
    with open(os.path.join(data_dir, pose_file_name)) as f:
        meta = json.load(f)
    frames = meta["frames"]
    if not isinstance(frames, list):
        frames = [frames[k] for k in sorted(frames.keys())]
    if config is not None and config.num_dataset_images > 0:
        frames = frames[: config.num_dataset_images]

    w = meta.get("w")
    h = meta.get("h")

    names, nameprefixes, camtoworlds, pixtocams, distortions = [], [], [], [], []
    for frame in frames:
        ext = io_lib.find_file(data_dir, frame)
        if require_files and ext is None:
            continue
        filepath = frame["file_path"]
        if w is None or h is None:
            # Resolution not in the JSON: read one image to get it.
            probe = os.path.join(data_dir, filepath + (ext or ""))
            if os.path.exists(probe):
                img = (
                    io_lib.load_exr(probe)
                    if probe.lower().endswith(".exr")
                    else io_lib.load_img(probe)
                )
                h, w = img.shape[:2]
            else:
                w = h = None if config is None else config.width
        names.append(os.path.basename(filepath) + (ext or ""))
        nameprefixes.append(filepath)
        camtoworlds.append(np.array(frame["transform_matrix"], np.float32))
        pixtocams.append(
            _extract_ngp_intrinsics(frame, w or 1, h or 1)
        )
        distortions.append(_extract_distortion(frame))
    camtoworlds = np.stack(camtoworlds, axis=0).astype(np.float32)

    if pixtocams[0] is None:
        pixtocams = _extract_ngp_intrinsics(meta, w or 1, h or 1)
    else:
        pixtocams = np.stack(pixtocams, axis=0)
    if distortions[0] is None:
        distortions = _extract_distortion(meta)
    else:
        distortions = jax.tree_util.tree_map(lambda *a: np.array(a), *distortions)

    return names, camtoworlds, pixtocams, distortions, _meta_camtype(meta), nameprefixes


def load_fwp_posedata(config, data_dir, pose_file_name="transforms.json",
                      frame_step=1):
    """FWP captured transients: per-frame 'camera' intrinsic matrices scaled to
    config.width (datasets.py:365-449)."""
    with open(os.path.join(data_dir, pose_file_name)) as f:
        meta = json.load(f)
    frames = meta["frames"]
    if not isinstance(frames, list):
        frames = [frames[k] for k in sorted(frames.keys())]
    if config.num_dataset_images > 0:
        frames = frames[: config.num_dataset_images]
    w, h = config.width, config.height

    def extract_intrinsics(frame):
        if "camera" not in frame:
            return None
        intrinsics = np.array(frame["camera"], np.float64)
        factor = int(512 / w)
        intrinsics = intrinsics / factor
        intrinsics[2, 2] = 1
        return np.linalg.inv(intrinsics)

    names, nameprefixes, camtoworlds, pixtocams, distortions = [], [], [], [], []
    for frame in frames[::frame_step]:
        filepath = frame["file_path"]
        nameprefixes.append(filepath)
        names.append(os.path.splitext(os.path.basename(filepath))[0] + ".h5")
        camtoworlds.append(np.array(frame["transform_matrix"], np.float32))
        pixtocams.append(extract_intrinsics(frame))
        distortions.append(_extract_distortion(frame))
    camtoworlds = np.stack(camtoworlds, axis=0).astype(np.float32)
    if pixtocams[0] is None:
        pixtocams = extract_intrinsics(meta)
    else:
        pixtocams = np.stack(pixtocams, axis=0)
    if distortions[0] is None:
        distortions = _extract_distortion(meta)
    else:
        distortions = jax.tree_util.tree_map(lambda *a: np.array(a), *distortions)
    return names, camtoworlds, pixtocams, distortions, _meta_camtype(meta), nameprefixes


def load_llff_posedata(data_dir):
    """poses_bounds.npy in the LLFF layout (datasets.py:333-363)."""
    posefile = os.path.join(data_dir, "poses_bounds.npy")
    if not os.path.exists(posefile):
        raise ValueError(f"poses_bounds.npy does not exist in {data_dir}.")
    poses_arr = np.load(posefile)
    bounds = poses_arr[:, -2:]
    poses_hwf = poses_arr[:, :-2].reshape([-1, 3, 5])
    poses_llff = poses_hwf[:, :, :4]
    # [down, right, backwards] -> [right, up, backwards].
    nerf_to_llff = np.array(
        [[0, -1, 0, 0], [1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
    )
    poses = poses_llff @ nerf_to_llff
    h, w, f = poses_hwf[0, :, 4]
    pixtocams = camera_utils.get_pixtocam(f, w, h)
    return poses, pixtocams, None, camera_utils.ProjectionType.PERSPECTIVE, bounds


def flatten_data(images, dim=3):
    """Variable-resolution image list -> (pixels [P,dim], indices [P,3])."""

    def flatten_and_concat(values, n):
        return np.concatenate([np.array(z).reshape(-1, n) for z in values])

    def index_array(i, w, h):
        x, y = camera_utils.pixel_coordinates(w, h)
        return np.stack([np.full((h, w), i), x, y], axis=-1)

    indices = [
        index_array(i, z.shape[1], z.shape[0]) for i, z in enumerate(images)
    ]
    return flatten_and_concat(images, dim), flatten_and_concat(indices, 3)


def _convolve_bins(x, kernel):
    """Correlate `[N, bins, ch]` transients with a symmetric 1-D kernel along
    the bin axis ('same' size) — numerically identical to the model-side
    `jax.scipy.signal.convolve(x, k[None, :, None], mode="same")` for the
    symmetric kernels used here."""
    half = len(kernel) // 2
    pad = np.pad(x, ((0, 0), (half, half), (0, 0)))
    out = np.zeros_like(x)
    for i, w in enumerate(kernel):
        out += w * pad[:, i : i + x.shape[1], :]
    return out


def flatten_transient_data(images, n_bins, num_rgb_channels=3):
    """Transient image list -> (pixels [P,T,C], indices [P,3])."""
    pixels, indices = flatten_data(
        [z.reshape(z.shape[0], z.shape[1], -1) for z in images],
        dim=n_bins * num_rgb_channels,
    )
    return pixels.reshape(-1, n_bins, num_rgb_channels), indices


# --- base class --------------------------------------------------------------------


class Dataset:
    """Base dataset: holds images + cameras, serves ray batches."""

    def __init__(self, split, data_dir, config):
        self.split = split
        self.data_dir = data_dir
        self.config = config
        self._patch_size = max(config.patch_size, 1)
        self._batch_size = config.batch_size // jax.process_count()
        self.near = config.near
        self.far = config.far
        self._render_spherical = False
        self._flattened = False
        self._use_tiffs = config.use_tiffs
        self._use_exrs = config.use_exrs
        self._load_disps = config.compute_disp_metrics or config.load_disps
        self._load_normals = config.compute_normal_metrics or config.load_normals
        self._load_albedos = config.compute_albedo_metrics or config.load_albedos
        self._load_env_map = config.compute_relight_metrics
        self.multi_illum = config.multi_illumination
        self.rotate_illum = config.rotate_illumination

        self.images = None  # [N, H, W, 3] float32
        self.camtoworlds = None  # [N, 3, 4]
        self.virtual_camtoworlds = None
        self.pixtocams = None  # [N or 1, 3, 3]
        self.distortion_params = None
        self.camtype = camera_utils.ProjectionType.PERSPECTIVE
        self.lights = None  # [N, 3]
        self.light_idx = None
        self.alphas = None
        self.masks = None
        self.mask_images = None
        self.normal_images = None
        self.albedo_images = None
        self.depth_images = None
        self.disp_images = None
        self.exposure = 1.0
        self.impulse_response = None
        self.env_map = None
        self.env_map_pmf = None
        self.env_map_pdf = None
        self.env_map_dirs = None
        self.env_map_h = None
        self.env_map_w = None
        self.images_flattened = None
        self.indices_flattened = None
        self.light_idx_flattened = None
        self.pixtocam_ndc = None  # [3, 3] set only by forward-facing NDC loaders

        self.mesh = None  # TriangleMesh for the sampler's mesh shortcut

        self._np_rng = np.random.RandomState(
            config.np_rng_seed + (0 if split == "train" else 1)
        )
        self._load_renderings(config)
        self.reload_mesh(config)

        if self.images is not None:
            self.num_images = self.images.shape[0]
            self.height, self.width = self.images.shape[1:3]
        else:
            self.num_images = self.camtoworlds.shape[0]
        if self.masks is None and self.mask_images is not None:
            self.masks = np.asarray(self.mask_images, np.float32).reshape(
                self.mask_images.shape[:3] + (-1,)
            )[..., :1]
        if self.pixtocams is not None and self.pixtocams.ndim == 2:
            self.pixtocams = self.pixtocams[None]
        self.pixtocams = (
            None if self.pixtocams is None else self.pixtocams.astype(np.float32)
        )
        if self.lights is None:
            self.lights = self.camtoworlds[:, :3, -1]
        if self.virtual_camtoworlds is None:
            self.virtual_camtoworlds = self.camtoworlds

    def _load_renderings(self, config):
        raise NotImplementedError

    def reload_mesh(self, config):
        """Load `Config.meshfile` into a device TriangleMesh.

        The reference declares this hook but drops the loaded mesh on the
        floor (internal/datasets.py:2008-2012 — `dataset.mesh` stays None
        and the sampler's mesh-intersection shortcut, sampling.py:217-233,
        is unreachable); here the capability is wired: every loader gets the
        mesh when a meshfile is configured. From-scratch OBJ parsing — no
        trimesh dependency.
        """
        if getattr(config, "meshfile", ""):
            from neural_radiance_caching_tpu.ops import mesh as mesh_lib

            self.mesh = mesh_lib.load_obj(config.meshfile)

    @property
    def cameras(self):
        return (
            self.pixtocams,
            self.camtoworlds,
            self.distortion_params,
            self.pixtocam_ndc,
        )

    def get_train_cameras(self, config):
        return self.cameras

    def get_train_virtual_cameras(self, config):
        return (
            self.pixtocams,
            self.virtual_camtoworlds,
            self.distortion_params,
            self.pixtocam_ndc,
        )

    # --- batching ---------------------------------------------------------

    def _make_pixels(self, cam_idx, pix_x, pix_y, lossmult=None, light_idx=None):
        n = pix_x.shape[0]
        if light_idx is None:
            light_idx = (
                self.light_idx[cam_idx, pix_y, pix_x]
                if self.light_idx is not None
                else np.zeros((n, 1), np.int32)
            )
        return pytrees.Pixels(
            pix_x_int=pix_x,
            pix_y_int=pix_y,
            lossmult=(
                np.ones((n, 1), np.float32)
                if lossmult is None
                else lossmult.reshape(n, 1).astype(np.float32)
            ),
            near=np.full((n, 1), self.near, np.float32),
            far=np.full((n, 1), self.far, np.float32),
            cam_idx=cam_idx.reshape(n, 1).astype(np.int32),
            light_idx=np.asarray(light_idx).reshape(n, 1).astype(np.int32),
        )

    def _cast(self, pixels):
        if self.config.cast_rays_in_train_step:
            return pixels
        return camera_utils.cast_ray_batch(
            self.cameras, self.lights, pixels, xnp=np,
            impulse_response=self.impulse_response,
            virtual_cameras=(
                None
                if self.virtual_camtoworlds is self.camtoworlds
                else (self.pixtocams, self.virtual_camtoworlds)
            ),
        )

    def _gather_batch(self, cam_idx, pix_x, pix_y, lossmult=None):
        pixels = self._make_pixels(cam_idx, pix_x, pix_y, lossmult=lossmult)
        rgb = self.images[cam_idx, pix_y, pix_x]
        masks = self.masks[cam_idx, pix_y, pix_x] if self.masks is not None else None
        normals = (
            self.normal_images[cam_idx, pix_y, pix_x]
            if self.normal_images is not None
            else None
        )
        albedos = (
            self.albedo_images[cam_idx, pix_y, pix_x]
            if self.albedo_images is not None
            else None
        )
        alphas = self.alphas[cam_idx, pix_y, pix_x] if self.alphas is not None else None
        return pytrees.Batch(
            rays=self._cast(pixels), rgb=rgb, masks=masks, normals=normals,
            albedos=albedos, alphas=alphas,
        )

    def next_train(self):
        """Random pixels across all train images."""
        n = self._batch_size
        if self._flattened:
            inds = self._np_rng.randint(0, self.images_flattened.shape[0], (n,))
            indices = self.indices_flattened[inds]
            cam_idx, pix_x, pix_y = indices[:, 0], indices[:, 1], indices[:, 2]
            pixels = self._make_pixels(
                cam_idx, pix_x, pix_y,
                light_idx=self.light_idx_flattened[inds]
                if self.light_idx_flattened is not None
                else None,
            )
            rgb = self.images_flattened[inds]
            masks = (
                self.masks[cam_idx, pix_y, pix_x] if self.masks is not None else None
            )
            return pytrees.Batch(rays=self._cast(pixels), rgb=rgb, masks=masks)
        p = self._patch_size
        if p > 1:
            # Patch sampling (reference datasets.py:964-980): draw upper-left
            # corners, expand to p×p grids, keep each patch's pixels
            # contiguous in the flat batch so losses can reshape (-1, p*p).
            num_patches = n // (p * p)
            border = self.config.num_border_pixels_to_mask
            corner_x = self._np_rng.randint(
                border, self.width - border - p + 1, (num_patches, 1, 1)
            )
            corner_y = self._np_rng.randint(
                border, self.height - border - p + 1, (num_patches, 1, 1)
            )
            dx, dy = camera_utils.pixel_coordinates(p, p)
            pix_x = (corner_x + dx).reshape(-1)
            pix_y = (corner_y + dy).reshape(-1)
            cam_idx = np.repeat(
                self._np_rng.randint(0, self.num_images, (num_patches,)), p * p
            )
            return self._gather_batch(cam_idx, pix_x, pix_y)
        cam_idx = self._np_rng.randint(0, self.num_images, (n,))
        pix_x = self._np_rng.randint(0, self.width, (n,))
        pix_y = self._np_rng.randint(0, self.height, (n,))
        return self._gather_batch(cam_idx, pix_x, pix_y)

    def generate_ray_batch(self, cam_idx: int):
        """All pixels of one image, for eval rendering."""
        pix_x, pix_y = camera_utils.pixel_coordinates(self.width, self.height)
        pix_x = pix_x.reshape(-1)
        pix_y = pix_y.reshape(-1)
        cam = np.full_like(pix_x, cam_idx)
        return self._gather_batch(cam, pix_x, pix_y)

    def __iter__(self):
        while True:
            yield self.next_train()


class RayBatcher(threading.Thread):
    """Prefetching iterator over training batches (datasets.py:1069-1150)."""

    def __init__(self, dataset: Dataset, queue_size: int = 2):
        super().__init__(daemon=True)
        self.dataset = dataset
        self._queue = queue.Queue(queue_size)
        self._stop = threading.Event()
        self.start()

    def run(self):
        while not self._stop.is_set():
            self._queue.put(self.dataset.next_train())

    def __iter__(self):
        return self

    def __next__(self):
        return self._queue.get()

    def stop(self):
        self._stop.set()
        try:
            self._queue.get_nowait()
        except queue.Empty:
            pass


# --- blender family -----------------------------------------------------------------


class Blender(Dataset):
    """NeRF-synthetic / TensoIR blender scenes (datasets.py:1169+)."""

    def _load_renderings(self, config):
        split_name = "train" if self.split == "train" else "test"
        _, camtoworlds, pixtocams, distortions, camtype, nameprefixes = (
            load_ngp_posedata(config, self.data_dir, f"transforms_{split_name}.json")
        )

        images = []
        for prefix in nameprefixes:
            image, _, _, _, _ = io_lib.get_imgs(
                self.data_dir, max(config.factor, 1), self._use_tiffs,
                self._use_exrs, False, False, False, False, prefix,
            )
            images.append(image)
        images = np.stack(images)

        if images.shape[-1] == 4:
            self.alphas = images[..., -1]
            self.masks = self.alphas[..., None]
        else:
            self.alphas = np.ones_like(images[..., 0])
            self.masks = self.alphas[..., None]

        rgb = images[..., :3]
        if not config.linear_to_srgb and not self._use_exrs:
            rgb = np.clip(image_ops.srgb_to_linear(rgb), 0.0, np.inf)
        # White background compositing.
        self.images = (rgb * self.masks + (1.0 - self.masks)).astype(np.float32)

        self.camtoworlds = camtoworlds[:, :3, :4]
        self.pixtocams = (
            pixtocams if pixtocams is not None else None
        )
        if self.pixtocams is None:
            raise ValueError("transforms.json must carry intrinsics")
        self.distortion_params = distortions
        self.camtype = camtype
        self.lights = self.camtoworlds[:, :3, -1]


class BlenderActive(Dataset):
    """Blender scenes with active (flash) lighting + aux GT buffers
    (datasets.py:1351-1424)."""

    def _load_renderings(self, config):
        split_name = "train" if self.split == "train" else "test"
        _, camtoworlds, pixtocams, distortions, camtype, nameprefixes = (
            load_ngp_posedata(config, self.data_dir, f"transforms_{split_name}.json")
        )

        all_imgs = [
            io_lib.get_imgs(
                self.data_dir, max(config.factor, 1), self._use_tiffs,
                self._use_exrs, self._load_disps, self._load_normals, False,
                self._load_albedos, p,
            )
            for p in nameprefixes
        ]
        images, disp_images, normal_images, _, albedo_images = zip(*all_imgs)

        self.images = np.stack(images, axis=0).astype(np.float32)
        self.alphas = np.copy(self.images[..., -1])
        if not config.linear_to_srgb and not self._use_exrs:
            self.images = np.clip(
                image_ops.srgb_to_linear(self.images), 0.0, np.inf
            )
        self.masks = self.alphas[..., None]
        self.images = self.images[..., :3] * self.masks + (1.0 - self.masks)

        if self._load_albedos:
            self.albedo_images = np.stack(albedo_images, axis=0)[..., :3]
            self.albedo_images = (
                self.albedo_images * self.masks + (1.0 - self.masks)
            )
        if self._load_disps:
            self.disp_images = np.stack(disp_images, axis=0)
        if self._load_normals:
            self.normal_images = np.stack(normal_images, axis=0)[..., :3]
            self.normal_images = (
                self.normal_images * self.masks + (1.0 - self.masks)
            )

        self.camtoworlds = camtoworlds[:, :3, :4]
        self.pixtocams = pixtocams
        self.distortion_params = distortions
        self.camtype = camtype


# --- transient family ----------------------------------------------------------------


class TransientSimulation(Dataset):
    """Simulated time-resolved captures: h5 sample streams for training,
    whole-frame h5 volumes for eval (datasets.py:1426-1641)."""

    def _load_renderings(self, config):
        self.height = config.height if self.split == "train" else (
            config.height if config.vis_only else config.test_height
        )
        self.width = config.width if self.split == "train" else (
            config.width if config.vis_only else config.test_width
        )

        if config.eval_path and self.split == "test":
            pose_file = "transforms_path2.json"
        elif config.eval_train:
            pose_file = "transforms_train.json"
        else:
            pose_file = f"transforms_{self.split}.json"
        _, camtoworlds, pixtocams, distortions, camtype, nameprefixes = (
            load_ngp_posedata(config, self.data_dir, pose_file)
        )
        self._pose_file = pose_file
        self._nameprefixes = nameprefixes

        if self.split == "train":
            import h5py

            eff = os.path.join(self.data_dir, "train_efficient")
            self.x_array = h5py.File(os.path.join(eff, "x.h5"), "r")
            self.y_array = h5py.File(os.path.join(eff, "y.h5"), "r")
            self.samples_array = h5py.File(os.path.join(eff, "samples.h5"), "r")
            self.file_indices_array = h5py.File(
                os.path.join(eff, "file_indices.h5"), "r"
            )

        self.camtoworlds = camtoworlds[:, :3, :4]
        self.pixtocams = pixtocams
        self.distortion_params = distortions
        self.camtype = camtype
        self.lights = self.camtoworlds[..., :3, -1]

        if config.fixed_light and config.light_transforms:
            light_transform = np.array(
                config.light_transforms[config.light_transform_idx], np.float32
            )
            self.lights = np.tile(
                light_transform[:3, -1][None], (self.lights.shape[0], 1)
            )
            self.virtual_camtoworlds = np.tile(
                light_transform[None, :3, :4], (self.camtoworlds.shape[0], 1, 1)
            )
        if config.fixed_camera:
            self.camtoworlds = np.tile(
                self.camtoworlds[config.viz_index][None],
                (self.camtoworlds.shape[0], 1, 1),
            )[: self.lights.shape[0]]

        if config.impulse_response:
            ir = np.load(config.impulse_response)
            ir = ir[
                config.impulse_response_start_bin :
                config.impulse_response_start_bin + config.n_impulse_response_bins
            ]
            self.impulse_response = ir[::-1].copy()

        # Placeholder image stack so base bookkeeping has shapes; eval frames
        # stream from h5 in generate_ray_batch.
        self.images = np.zeros(
            (camtoworlds.shape[0], self.height, self.width, 3), np.float32
        )

    def _make_transient_batch(self, pix_x, pix_y, cam_idx, rgb, lossmult=None):
        rgb = np.clip(
            rgb[..., :3] / self.config.dataset_scale, 0.0, self.config.rgb_max
        )
        mask = (
            np.linalg.norm(rgb, axis=-1, keepdims=True).sum(axis=-2) > 0
        ).astype(np.float32)
        pixels = self._make_pixels(
            cam_idx, pix_x, pix_y, lossmult=lossmult,
            light_idx=cam_idx.astype(np.int32),
        )
        return pytrees.Batch(
            rays=self._cast(pixels), rgb=rgb, masks=mask, alphas=mask,
            impulse_response=self.impulse_response,
        )

    def next_train(self):
        n = self._batch_size
        cfg = self.config
        max_start = self.file_indices_array["dataset"].shape[0] - n
        start = self._np_rng.randint(0, max_start)
        sl = slice(start, start + n)
        cam_idx = np.array(self.file_indices_array["dataset"][sl]).astype(np.int32)
        pix_x = np.array(self.x_array["dataset"][sl]).astype(np.int32)
        pix_y = np.array(self.y_array["dataset"][sl]).astype(np.int32)
        rgb = np.array(
            self.samples_array["dataset"][sl, cfg.start_bin : cfg.start_bin + cfg.n_bins]
        ).astype(np.float32)
        return self._make_transient_batch(pix_x, pix_y, cam_idx, rgb)

    def generate_ray_batch(self, cam_idx: int):
        import h5py

        cfg = self.config
        with open(os.path.join(self.data_dir, self._pose_file)) as f:
            data = json.load(f)
        file_path = data["frames"][cam_idx]["file_path"]

        if not cfg.eval_path:
            with h5py.File(os.path.join(self.data_dir, file_path), "r") as h5_file:
                rgb = np.array(
                    h5_file["data"][
                        :, :, cfg.test_start_bin : cfg.test_start_bin + cfg.n_bins
                    ]
                ).astype(np.float32)
        else:
            rgb = np.zeros((self.height, self.width, cfg.n_bins, 1), np.float32)
        if rgb.ndim == 3:
            rgb = rgb[..., None]

        # Stored frames are full resolution (512 in the reference captures);
        # decimate down to the configured eval height.
        ratio = int(np.log2(max(1, rgb.shape[0] // self.height)))
        if ratio > 0 and not cfg.eval_path:
            for _ in range(ratio):
                rgb = rgb[::2, ::2, : cfg.n_bins]

        pix_x, pix_y = camera_utils.pixel_coordinates(rgb.shape[1], rgb.shape[0])
        cam = np.full_like(pix_x.reshape(-1), cam_idx)
        return self._make_transient_batch(
            pix_x.reshape(-1), pix_y.reshape(-1), cam,
            rgb.reshape(-1, rgb.shape[-2], rgb.shape[-1]),
        )


class FWPTransientCaptured(TransientSimulation):
    """Captured transients (FWP rig): per-frame intrinsics, dark level,
    excluded frames (datasets.py:1701-1912)."""

    def _load_renderings(self, config):
        self.height = config.height if self.split == "train" else (
            config.height if config.vis_only else config.test_height
        )
        self.width = config.width if self.split == "train" else (
            config.width if config.vis_only else config.test_width
        )
        if config.eval_path and self.split == "test":
            pose_file = "transforms_path2.json"
        elif config.eval_train:
            pose_file = "transforms_all.json"
        else:
            pose_file = f"transforms_{self.split}.json"
        _, camtoworlds, pixtocams, distortions, camtype, nameprefixes = (
            load_fwp_posedata(config, self.data_dir, pose_file,
                              frame_step=2 if (config.eval_path and self.split == "test") else 1)
        )
        self._pose_file = pose_file
        self._nameprefixes = nameprefixes

        if self.split == "train":
            import h5py

            eff = os.path.join(self.data_dir, "train_efficient")
            self.x_array = h5py.File(os.path.join(eff, "x.h5"), "r")
            self.y_array = h5py.File(os.path.join(eff, "y.h5"), "r")
            self.samples_array = h5py.File(os.path.join(eff, "samples.h5"), "r")
            self.file_indices_array = h5py.File(
                os.path.join(eff, "file_indices.h5"), "r"
            )

        self.camtoworlds = camtoworlds[:, :3, :4]
        self.pixtocams = pixtocams
        self.distortion_params = distortions
        self.camtype = camtype

        lights = np.tile(
            np.array(config.light_source_position or [0.0, 0.0, 0.0], np.float32),
            (self.camtoworlds.shape[0], 1),
        )
        if config.light_static_wrt_camera:
            hom = np.concatenate([lights, np.ones_like(lights[:, :1])], axis=1)
            lights = np.einsum("nij,nj->ni", camtoworlds[:, :3, :4], hom)
        self.lights = lights

        if config.impulse_response:
            ir = np.load(config.impulse_response)
            ir = ir[
                config.impulse_response_start_bin :
                config.impulse_response_start_bin + config.n_impulse_response_bins
            ]
            self.impulse_response = ir[::-1].copy()

        self.train_exclude_indices = np.array(
            [
                i for i, name in enumerate(nameprefixes)
                if any(prefix in name for prefix in config.train_exclude_prefixes)
            ],
            np.int32,
        )
        self.images = np.zeros(
            (camtoworlds.shape[0], self.height, self.width, 3), np.float32
        )

    def _make_transient_batch(self, pix_x, pix_y, cam_idx, rgb, lossmult=None):
        cfg = self.config
        scaled = rgb[..., :3] / cfg.dataset_scale
        clipped = np.clip(scaled - cfg.dark_level, 0.0, cfg.rgb_max)
        mask = (
            np.linalg.norm(scaled, axis=-1, keepdims=True).sum(axis=-2)
            >= cfg.mask_threshold
        ).astype(np.float32)
        pixels = self._make_pixels(
            cam_idx, pix_x, pix_y, lossmult=lossmult,
            light_idx=cam_idx.astype(np.int32),
        )
        return pytrees.Batch(
            rays=self._cast(pixels), rgb=clipped, masks=mask, alphas=mask,
            impulse_response=self.impulse_response,
        )

    def next_train(self):
        n = self._batch_size
        cfg = self.config
        max_start = self.file_indices_array["dataset"].shape[0] - n
        start = self._np_rng.randint(0, max_start)
        sl = slice(start, start + n)
        cam_idx = np.array(self.file_indices_array["dataset"][sl]).astype(np.int32)
        pix_x = np.array(self.x_array["dataset"][sl]).astype(np.int32)
        pix_y = np.array(self.y_array["dataset"][sl]).astype(np.int32)
        rgb = np.array(
            self.samples_array["dataset"][sl, cfg.start_bin : cfg.start_bin + cfg.n_bins]
        ).astype(np.float32)
        lossmult = np.all(
            cam_idx[..., None] != self.train_exclude_indices[None], axis=-1
        ).astype(np.float32)
        return self._make_transient_batch(pix_x, pix_y, cam_idx, rgb, lossmult=lossmult)


class TransientSimulationIToF(Dataset):
    """iToF-style transient frames stored as whole images
    (datasets.py:1643-1698)."""

    def _load_renderings(self, config):
        split_name = "train" if self.split == "train" else "test"
        _, camtoworlds, pixtocams, distortions, camtype, nameprefixes = (
            load_ngp_posedata(config, self.data_dir, f"transforms_{split_name}.json")
        )
        images = [
            io_lib.get_imgs(
                self.data_dir, max(config.factor, 1), self._use_tiffs,
                self._use_exrs, False, False, False, False, p,
            )[0]
            for p in nameprefixes
        ]
        images = np.stack(images, axis=0)
        self.masks = (images[..., -1].sum(-1) > 0).astype(np.float32)[..., None]
        self.alphas = self.masks[..., 0]
        images = images[..., :3]
        images = np.clip(images * 255 / config.dataset_scale, 0, 1000.0)
        self.images = images.astype(np.float32)

        self._flattened = True
        self.images_flattened, self.indices_flattened = flatten_transient_data(
            [z for z in self.images], n_bins=4
        )
        self.camtoworlds = camtoworlds[:, :3, :4]
        self.pixtocams = pixtocams
        self.distortion_params = distortions
        self.camtype = camtype
        self.lights = self.camtoworlds[..., :3, -1]


# --- inverse-rendering captures -------------------------------------------------------


class ORB(Dataset):
    """Object Relighting Benchmark captures (datasets.py:1915-2006)."""

    def _load_renderings(self, config):
        split_name = "train" if self.split == "train" else "test"
        _, camtoworlds_train, _, _, _, _ = load_ngp_posedata(
            config, self.data_dir, "transforms_train.json"
        )
        _, camtoworlds, pixtocams, distortions, camtype, nameprefixes = (
            load_ngp_posedata(config, self.data_dir, f"transforms_{split_name}.json")
        )

        factor = max(config.factor, 1)
        pixtocams = pixtocams @ np.diag([factor, factor, 1.0])

        camtoworlds_train = camtoworlds_train[:, :3, :4]
        camtoworlds = camtoworlds[:, :3, :4]
        camtoworlds_train, tform = camera_utils.recenter_poses(camtoworlds_train)
        camtoworlds = camera_utils.unpad_poses(
            tform @ camera_utils.pad_poses(camtoworlds)
        )
        scale_factor = 1.0 / np.max(np.abs(camtoworlds_train[:, :3, 3]))
        camtoworlds[:, :3, 3] *= scale_factor

        images, mask_images, normal_images = [], [], []
        for prefix in nameprefixes:
            image, _, normal_image, mask_image, _ = io_lib.get_imgs(
                self.data_dir, config.factor, self._use_tiffs, self._use_exrs,
                False, self._load_normals, True, False, prefix,
                "train" if self.split == "train" else "test",
            )
            images.append(np.clip(image, 0.0, 4.0))
            mask_images.append(mask_image > 0.5)
            normal_images.append(normal_image)

        self.images = np.stack(images, axis=0)
        self.mask_images = np.stack(mask_images, axis=0).astype(np.float32)
        if self._load_normals:
            self.normal_images = np.stack(normal_images, axis=0)
            self.alphas = self.images[..., -1]
        rgb = self.images[..., :3]
        alpha = self.mask_images.reshape(rgb.shape[:3] + (-1,))[..., :1]
        self.images = (rgb * alpha + (1.0 - alpha)).astype(np.float32)
        self.masks = alpha

        if config.vis_render_path and self.split == "test":
            num_render = 120
            camtoworlds = camera_utils.generate_ellipse_path(
                camtoworlds, n_frames=num_render, lock_up=False,
                relative_to_first_pose=True, flip_y=True,
            )
            self.images = np.repeat(self.images[0:1], num_render, 0)
            self.masks = np.repeat(self.masks[0:1], num_render, 0)

        self.camtoworlds = camtoworlds
        self.pixtocams = pixtocams
        self.distortion_params = distortions
        self.camtype = camtype
        self.lights = self.camtoworlds[..., :3, -1]


class OpenIllum(Dataset):
    """OpenIllumination light-stage captures, multi-illumination + relighting
    env maps (datasets.py:2015-2187)."""

    ILLUM_MAPS_MULTI = ["013", "011", "009"]

    def _load_renderings(self, config):
        import cv2

        if self._load_env_map:
            illum_maps = [config.env_map_name]
        elif config.vis_only or not self.multi_illum:
            illum_maps = ["013"]
        else:
            illum_maps = list(self.ILLUM_MAPS_MULTI)

        split_name = "train" if self.split == "train" else "test"
        _, camtoworlds, pixtocams, distortions, camtype, nameprefixes = (
            load_ngp_posedata(config, self.data_dir, f"transforms_{split_name}.json")
        )
        factor = max(
            config.factor if self.split == "train" else (config.test_factor or config.factor),
            1,
        )
        pixtocams = pixtocams @ np.diag([factor, factor, 1.0])
        camtoworlds = camtoworlds @ np.diag([1, -1, -1, 1.0])
        camtoworlds = camtoworlds[:, :3, :4]

        images, mask_images, light_indices = [], [], []
        for light_idx, illum_map in enumerate(illum_maps):
            for prefix in nameprefixes:
                image = io_lib.get_img(
                    1, ".JPG",
                    os.path.join(
                        self.data_dir,
                        prefix.replace("./images", f"../Lights/{illum_map}/raw_undistorted"),
                    ),
                ) / 255.0
                image = cv2.resize(
                    image, (image.shape[1] // factor, image.shape[0] // factor),
                    interpolation=cv2.INTER_LANCZOS4,
                )
                image = np.clip(image_ops.srgb_to_linear(image), 0.0, np.inf)
                images.append(image)

                mask_sub = "./com_masks" if self.split == "train" else "./obj_masks"
                mask = io_lib.get_img(
                    1, ".png",
                    os.path.join(self.data_dir, prefix.replace("./images", mask_sub)),
                ) / 255.0
                mask = cv2.resize(
                    mask, (mask.shape[1] // factor, mask.shape[0] // factor),
                    interpolation=cv2.INTER_NEAREST,
                )
                thresh = 0.5 if self.split == "train" else 0.0
                mask_images.append(mask[..., None] > thresh)
                light_indices.append(
                    np.ones_like(images[-1][..., 0:1], np.int32) * light_idx
                )

        self.light_idx = np.stack(light_indices, axis=0)
        self.images = np.stack(images, axis=0)
        self.mask_images = np.stack(mask_images, axis=0).astype(np.float32)
        rgb = self.images[..., :3]
        alpha = self.mask_images[..., :1]
        self.images = (rgb * alpha + (1.0 - alpha)).astype(np.float32)
        self.masks = alpha

        if self.multi_illum:
            camtoworlds = np.concatenate([camtoworlds] * len(illum_maps), axis=0)
            pixtocams = np.concatenate([pixtocams] * len(illum_maps), axis=0)

        if self.multi_illum or self._load_env_map:
            tables = [
                env_maps.load_env_map(
                    os.path.join(self.data_dir, f"../../../env_maps/hdrs/{name}.hdr"),
                    scale=2.5,
                )
                for name in illum_maps
            ]
            self.env_map = np.concatenate([t["env_map"] for t in tables], axis=-2)
            self.env_map_pmf = np.concatenate(
                [t["env_map_pmf"] for t in tables], axis=-1
            )
            self.env_map_pdf = np.concatenate(
                [t["env_map_pdf"] for t in tables], axis=-1
            )
            self.env_map_dirs = np.concatenate(
                [t["env_map_dirs"] for t in tables], axis=-2
            )
            self.env_map_h = tables[0]["env_map_h"]
            self.env_map_w = tables[0]["env_map_w"]

        self.camtoworlds = camtoworlds
        self.pixtocams = pixtocams
        self.distortion_params = distortions
        self.camtype = camtype
        self.lights = self.camtoworlds[..., :3, -1]


class Neilf(Dataset):
    """NeILF++ sfm_scene captures (datasets.py:2253-2348)."""

    VALIDATION_INDEXES = [9, 18, 30, 41, 50, 62, 73, 82, 94]

    def _load_renderings(self, config):
        with open(os.path.join(self.data_dir, "sfm_scene.json")) as f:
            sfm_scene = json.load(f)

        intrinsics, extrinsics = {}, {}
        for index, info in sfm_scene["camera_track_map"]["images"].items():
            if info["flg"] == 2:
                k = np.zeros((4, 4))
                k[0, 0], k[1, 1] = info["camera"]["intrinsic"]["focal"]
                k[0, 2], k[1, 2] = info["camera"]["intrinsic"]["ppt"]
                k[2, 2] = k[3, 3] = 1
                intrinsics[index] = k
                extrinsics[index] = np.array(info["camera"]["extrinsic"]).reshape(4, 4)

        image_list = sfm_scene["image_path"]["file_paths"]
        image_indexes = [str(k) for k in sorted(int(k) for k in image_list)]
        num_images = len(image_indexes)
        validation = {v % num_images for v in self.VALIDATION_INDEXES}
        selected = [
            idx for i, idx in enumerate(image_indexes)
            if (i in validation) == (self.split != "train")
        ]

        images, camtoworlds, pixtocams = [], [], []
        for image_index in selected:
            pose = np.linalg.inv(extrinsics[image_index])[:3, :4] @ np.diag(
                [1.0, -1.0, -1.0, 1.0]
            )
            camtoworlds.append(pose)
            pixtocams.append(np.linalg.inv(intrinsics[image_index][:3, :3]))
            prefix = os.path.split(os.path.splitext(image_list[image_index])[0])[1]
            fprefix = os.path.join(self.data_dir, "images", prefix)
            for ext in (".png", ".jpg", ".tiff", ".exr"):
                if os.path.exists(fprefix + ext):
                    img = io_lib.get_img(max(config.factor, 1), ext, fprefix)
                    if ext != ".exr":
                        img = img / 255.0
                    break
            else:
                raise FileNotFoundError(fprefix)
            images.append(img[..., :3] * 0.25)

        camtoworlds = np.stack(camtoworlds, axis=0)
        pixtocams = np.stack(pixtocams, axis=0)
        scale_factor = 1.0 / np.max(np.abs(camtoworlds[:, :3, 3]))
        camtoworlds[:, :3, 3] *= scale_factor
        permute = np.array([[1.0, 0, 0], [0, 0, 1], [0, 1, 0]])
        camtoworlds = permute @ camtoworlds

        self.images = np.stack(images, axis=0).astype(np.float32)
        self.camtoworlds = camtoworlds.astype(np.float32)
        self.pixtocams = pixtocams.astype(np.float32)


class Real(Dataset):
    """Real captures with NGP-format poses recentered by the train split
    (datasets.py:2351-2449)."""

    def _load_renderings(self, config):
        split_name = "train" if self.split == "train" else "test"
        _, camtoworlds_train, _, _, _, _ = load_ngp_posedata(
            config, self.data_dir, "transforms_train.json"
        )
        _, camtoworlds, pixtocams, distortions, camtype, nameprefixes = (
            load_ngp_posedata(config, self.data_dir, f"transforms_{split_name}.json")
        )
        factor = max(config.factor, 1)
        pixtocams = pixtocams @ np.diag([factor, factor, 1.0])

        camtoworlds_train = camtoworlds_train[:, :3, :4]
        camtoworlds = camtoworlds[:, :3, :4]
        camtoworlds_train, tform = camera_utils.recenter_poses(camtoworlds_train)
        camtoworlds = camera_utils.unpad_poses(
            tform @ camera_utils.pad_poses(camtoworlds)
        )
        scale_factor = 1.0 / np.max(np.abs(camtoworlds_train[:, :3, 3]))
        camtoworlds[:, :3, 3] *= scale_factor

        images = []
        for prefix in nameprefixes:
            image, _, _, _, _ = io_lib.get_imgs(
                self.data_dir, config.factor, self._use_tiffs, self._use_exrs,
                False, False, False, False, prefix,
            )
            images.append(image)
        self.images = np.stack(images, axis=0).astype(np.float32)
        if not self._use_exrs and not config.linear_to_srgb:
            self.images = np.clip(
                image_ops.srgb_to_linear(self.images), 0.0, np.inf
            )
        self.images = self.images[..., :3]

        self.camtoworlds = camtoworlds
        self.pixtocams = pixtocams
        self.distortion_params = distortions
        self.camtype = camtype


class GlossySynthetic(Dataset):
    """NeRO glossy synthetic: pickled cameras, depth-derived masks
    (datasets.py:2749-2927)."""

    def _load_renderings(self, config):
        import glob
        import pickle

        from PIL import Image

        with open(os.path.join(self.data_dir, "../synthetic_split_128.pkl"), "rb") as f:
            test_ids, train_ids = pickle.load(f)
        scene = self.data_dir.split("/")[-1]

        if self._load_env_map:
            data_dir = os.path.join(
                self.data_dir, f"../relight_gt/{scene}_{config.env_map_name}"
            )
            im_num = len(glob.glob(f"{data_dir}/*.pkl"))
            im_ids = [str(k) for k in range(im_num)]
        elif self.split == "train":
            data_dir = self.data_dir
            im_num = len(glob.glob(f"{self.data_dir}/*.pkl"))
            im_ids = [str(k) for k in range(im_num)]
        else:
            data_dir = self.data_dir
            im_ids = sorted(test_ids)

        images, mask_images, depth_images, camtoworlds, pixtocams = [], [], [], [], []
        for im_id in im_ids:
            with open(os.path.join(data_dir, im_id + "-camera.pkl"), "rb") as f:
                cam_data = pickle.load(f)
            pose = np.eye(4)
            pose[:3, :4] = cam_data[0]
            camtoworlds.append(np.linalg.inv(pose))
            pixtocams.append(cam_data[1])

            with open(os.path.join(data_dir, im_id + ".png"), "rb") as f:
                image = np.array(Image.open(f)) / 255.0
            image = np.clip(image_ops.srgb_to_linear(image), 0.0, np.inf)
            images.append(image)

            depth_file = os.path.join(data_dir, im_id + "-depth.png")
            if os.path.exists(depth_file):
                depth = io_lib.load_img(depth_file).astype(np.float32) / 65535 * 15
                if depth.ndim == 3:
                    depth = depth[..., 0]
                mask = (depth < 14.5).astype(np.float32)
            else:
                mask = image[..., 3]
                depth = np.zeros_like(mask)
            depth_images.append(depth[..., None])
            mask_images.append(mask[..., None])

        camtoworlds = np.array(camtoworlds)
        pixtocams = np.linalg.inv(np.array(pixtocams))
        camtoworlds = (camtoworlds @ np.diag([1, -1, -1, 1.0]))[:, :3, :4]

        self.images = np.stack(images, axis=0).astype(np.float32)
        self.mask_images = np.stack(mask_images, axis=0).astype(np.float32)
        self.depth_images = np.stack(depth_images, axis=0)
        self.alphas = np.copy(self.mask_images[..., 0])
        rgb, alpha = self.images[..., :3], self.mask_images
        self.images = (rgb * alpha + (1.0 - alpha)).astype(np.float32)
        self.masks = alpha

        self._flattened = True
        self.images_flattened, self.indices_flattened = flatten_data(
            [z for z in self.images]
        )
        self.light_idx_flattened = np.zeros(
            (self.images_flattened.shape[0], 1), np.int32
        )

        if self._load_env_map:
            tables = env_maps.load_env_map(
                os.path.join(self.data_dir, f"../relight_gt/{config.env_map_name}.exr"),
                downsample=4, y_up=True, flip=True,
            )
            for k, v in tables.items():
                setattr(self, k, v)

        self.camtoworlds = camtoworlds
        self.pixtocams = pixtocams.astype(np.float32)
        self.lights = self.camtoworlds[..., :3, -1]


class GlossyReal(Dataset):
    """NeRO glossy real captures: cache.pkl poses normalized by the object
    point cloud (datasets.py:2620-2747)."""

    META_INFO = {
        "bear": {"forward": [0.539944, -0.342791, 0.341446],
                 "up": [0.0512875, -0.645326, -0.762183]},
        "coral": {"forward": [0.004226, -0.235523, 0.267582],
                  "up": [0.0477973, -0.748313, -0.661622]},
        "maneki": {"forward": [-2.336584, -0.406351, 0.482029],
                   "up": [-0.0117387, -0.738751, -0.673876]},
        "bunny": {"forward": [0.437076, -1.672467, 1.436961],
                  "up": [-0.0693234, -0.644819, -0.761185]},
        "vase": {"forward": [-0.911907, -0.132777, 0.180063],
                 "up": [-0.01911, -0.738918, -0.673524]},
    }

    def _load_point_cloud(self, pcl_path):
        # Minimal ASCII/binary PLY vertex reader (plyfile not available).
        with open(pcl_path, "rb") as f:
            header = []
            while True:
                line = f.readline().decode("ascii", "ignore").strip()
                header.append(line)
                if line == "end_header":
                    break
            n_verts = 0
            props = []
            fmt = "ascii"
            for line in header:
                if line.startswith("format"):
                    fmt = line.split()[1]
                if line.startswith("element vertex"):
                    n_verts = int(line.split()[-1])
                if line.startswith("property") and n_verts:
                    props.append(line.split()[-1])
            if fmt == "ascii":
                data = np.loadtxt(f, max_rows=n_verts)
            else:
                dt = np.dtype(
                    [(p, "<f4" if "float" in "float" else "<f4") for p in props]
                )
                data = np.frombuffer(f.read(n_verts * dt.itemsize), dtype=dt)
                data = np.stack([data[p] for p in props], axis=1)
        ix, iy, iz = props.index("x"), props.index("y"), props.index("z")
        return np.stack([data[:, ix], data[:, iy], data[:, iz]], axis=1).astype(float)

    def _compute_rotation(self, vert, forward):
        y = np.cross(vert, forward)
        x = np.cross(y, vert)
        vert = vert / np.linalg.norm(vert)
        x = x / np.linalg.norm(x)
        y = y / np.linalg.norm(y)
        return np.stack([x, y, vert], 0)

    def _normalize(self, poses):
        ref_points = self._load_point_cloud(
            os.path.join(self.data_dir, "object_point_cloud.ply")
        )
        max_pt, min_pt = np.max(ref_points, 0), np.min(ref_points, 0)
        center = (max_pt + min_pt) * 0.5
        offset = -center
        scale = 1 / np.max(np.linalg.norm(ref_points - center[None], 2, 1))
        meta = self.META_INFO[self.object_name]
        up = np.asarray(meta["up"], np.float32)
        forward = np.asarray(meta["forward"], np.float32)
        up, forward = up / np.linalg.norm(up), forward / np.linalg.norm(forward)
        r_rec = self._compute_rotation(up, forward)
        for img_id, pose in poses.items():
            rot, t = pose[:, :3], pose[:, 3]
            poses[img_id] = np.concatenate(
                [rot @ r_rec.T, ((t - rot @ offset) * scale)[:, None]], -1
            )
        return poses

    def _load_renderings(self, config):
        import pickle

        self.object_name = self.data_dir.rstrip("/").split("/")[-1]
        with open(os.path.join(self.data_dir, "cache.pkl"), "rb") as f:
            poses_dict, ks_dict, names_dict, _ = pickle.load(f)
        poses_dict = self._normalize(poses_dict)
        probe = io_lib.load_img(
            os.path.join(self.data_dir, "images", names_dict[1])
        )
        h, w = probe.shape[:2]

        camtoworlds, pixtocams, nameprefixes = [], [], []
        for key in names_dict:
            pose = np.eye(4)
            pose[:3, :4] = np.array(poses_dict[key])
            pose = np.linalg.inv(pose)
            k = ks_dict[key]
            ratio = 1024.0 / max(h, w)
            th, tw = int(ratio * h), int(ratio * w)
            k = np.diag([tw / w, th / h, 1.0]) @ k
            camtoworlds.append(pose[:3, :4])
            pixtocams.append(k)
            nameprefixes.append(os.path.join("images_raw_1024", names_dict[key]))

        camtoworlds = np.array(camtoworlds)
        pixtocams = np.linalg.inv(np.array(pixtocams))
        camtoworlds = camtoworlds @ np.diag([1, -1, -1, 1.0])
        camtoworlds, _ = camera_utils.transform_poses_pca(camtoworlds[:, :3, :4])

        images = []
        for prefix in nameprefixes:
            image, _, _, _, _ = io_lib.get_imgs(
                self.data_dir, config.factor, False, False, False, False,
                False, False, prefix,
            )
            if self._use_exrs:
                image = np.clip(image_ops.srgb_to_linear(image), 0.0, np.inf)
            images.append(image)
        self.images = np.stack(images, axis=0)[..., :3].astype(np.float32)

        self.camtoworlds = camtoworlds.astype(np.float32)
        self.pixtocams = pixtocams.astype(np.float32)


class LLFF(Dataset):
    """Forward-facing / real-world scenes with poses from poses_bounds.npy or
    NGP JSONs (datasets.py:2929-3294; COLMAP-binary parsing not needed for
    those two paths)."""

    def _load_renderings(self, config):
        image_subdir = config.image_subdir or "images"
        factor = 1 if config.factor == 0 else config.factor
        image_dir_suffix = "" if factor == 1 else f"_{config.factor}"
        colmap_image_dir = os.path.join(self.data_dir, image_subdir)

        bounds = None
        if config.llff_load_from_poses_bounds:
            image_names = sorted(os.listdir(colmap_image_dir))
            poses, pixtocams, distortions, camtype, bounds = load_llff_posedata(
                self.data_dir
            )
        elif config.load_ngp_format_poses:
            image_names, poses, pixtocams, distortions, camtype, _ = (
                load_ngp_posedata(config, self.data_dir)
            )
            poses = poses[:, :3, :4]
        else:
            from neural_radiance_caching_tpu.data import colmap

            image_names, poses, pixtocams, distortions, camtype = (
                colmap.load_colmap_posedata(self.data_dir)
            )

        if config.load_alphabetical:
            inds = np.argsort(image_names)
            image_names = [image_names[i] for i in inds]
            poses, pixtocams, distortions = camera_utils.gather_cameras(
                (poses, pixtocams, distortions), inds
            )

        pixtocams = (pixtocams @ np.diag([factor, factor, 1.0])).astype(np.float32)
        self.camtype = camtype

        image_dir = os.path.join(self.data_dir, image_subdir + image_dir_suffix)
        files = sorted(os.listdir(image_dir))
        images = np.stack(
            [io_lib.load_img(os.path.join(image_dir, f)) / 255.0 for f in files]
        )
        if not config.linear_to_srgb:
            images = np.clip(image_ops.srgb_to_linear(images), 0.0, np.inf)

        if config.forward_facing and bounds is not None:
            # NDC-style rescale: shift near plane to 1 (mip-NeRF 360 recipe).
            scale = 1.0 / (bounds.min() * 0.75)
            poses[:, :3, 3] *= scale
            bounds = bounds * scale
        else:
            poses, _ = camera_utils.transform_poses_pca(poses)

        # Train/test split by llffhold.
        all_indices = np.arange(images.shape[0])
        if config.llffhold > 0:
            test_indices = all_indices[:: config.llffhold]
        else:
            test_indices = all_indices[:0]
        split_indices = {
            "test": test_indices,
            "train": np.array([i for i in all_indices if i not in test_indices]),
        }
        indices = split_indices["train" if self.split == "train" else "test"]

        self.images = images[indices][..., :3].astype(np.float32)
        self.camtoworlds = poses[indices].astype(np.float32)
        if pixtocams.ndim == 3 and pixtocams.shape[0] > 1:
            self.pixtocams = pixtocams[indices]
        else:
            self.pixtocams = pixtocams
        self.distortion_params = distortions


def read_cam_params_fipt(cam_file):
    """FIPT OpenGL camera text file: count, then 3 rows (origin/lookat/up)
    per camera (datasets.py:2436-2445)."""
    with open(cam_file) as f:
        cam_data = f.read().splitlines()
    cam_num = int(cam_data[0])
    cam_params = np.array([x.split(" ") for x in cam_data[1:]]).astype(np.float32)
    assert cam_params.shape[0] == cam_num * 3
    return np.split(cam_params, cam_num, axis=0)


class FIPTReal(Dataset):
    """FIPT real captures: cam.txt / K_list.txt + EXR frames
    (datasets.py:2450-2545)."""

    def _load_renderings(self, config):
        root = os.path.expanduser(self.data_dir)
        c2ws = []
        for c2w_raw in read_cam_params_fipt(os.path.join(root, "cam.txt")):
            origin, lookat, up = [v.flatten() for v in np.split(c2w_raw.T, 3, axis=1)]
            at = (lookat - origin) / np.linalg.norm(lookat - origin)
            rot = np.stack((np.cross(-up, at), up, -at), -1).astype(np.float32)
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :4] = np.hstack((rot, origin.reshape(3, 1).astype(np.float32)))
            c2ws.append(pose)
        c2ws = np.stack(c2ws, 0)[:, :3, :4]
        ks = np.stack(read_cam_params_fipt(os.path.join(root, "K_list.txt")), 0)
        self.camtoworlds, _ = camera_utils.transform_poses_pca(c2ws)
        self.pixtocams = np.linalg.inv(ks).astype(np.float32)

        image_dir = os.path.join(root, "Image")
        nameprefixes = sorted(
            os.path.join("Image", p[: -len(".exr")])
            for p in os.listdir(image_dir)
            if p.endswith(".exr")
        )
        self._load_fipt_images(config, nameprefixes)

    def _load_fipt_images(self, config, nameprefixes):
        images = []
        for prefix in nameprefixes:
            image, _, _, _, _ = io_lib.get_imgs(
                self.data_dir, max(config.factor, 1), False, self._use_exrs,
                False, False, False, False, prefix,
            )
            images.append(image)
        images = np.stack(images, axis=0)
        if self._use_exrs and config.linear_to_srgb:
            # Median-exposure normalization then sRGB (datasets.py:2515-2524).
            images = np.clip(
                image_ops.linear_to_srgb(images / 0.65 * 0.65), 0.0, np.inf
            )
        self.images = images[..., :3].astype(np.float32)
        self._flattened = True
        self.images_flattened, self.indices_flattened = flatten_data(
            [z for z in self.images]
        )


class FIPTSynthetic(FIPTReal):
    """FIPT synthetic scenes: NGP-format poses under train/
    (datasets.py:2546-2618)."""

    def _load_renderings(self, config):
        _, camtoworlds, pixtocams, distortions, camtype, nameprefixes = (
            load_ngp_posedata(config, self.data_dir, "train/transforms.json")
        )
        camtoworlds = camtoworlds @ np.diag([-1, 1, -1, 1.0])
        self.camtoworlds = camtoworlds[:, :3, :4]
        self.pixtocams = pixtocams
        self.distortion_params = distortions
        self.camtype = camtype
        self._load_fipt_images(config, nameprefixes)


class TanksAndTemplesNerfPP(Dataset):
    """Tanks & Temples (NeRF++ layout): per-image pose/intrinsics txt files
    (datasets.py:3297-3337)."""

    def _load_renderings(self, config):
        split_str = "camera_path" if config.render_path else (
            "train" if self.split == "train" else "test"
        )
        basedir = os.path.join(self.data_dir, split_str)

        def load_files(dirname, load_fn, shape=None):
            d = os.path.join(basedir, dirname)
            files = [os.path.join(d, f) for f in sorted(os.listdir(d))]
            mats = np.array([load_fn(f) for f in files])
            return mats.reshape(mats.shape[:1] + shape) if shape else mats

        poses = load_files("pose", np.loadtxt, (4, 4))
        poses = np.matmul(poses, np.diag([1.0, -1, -1, 1]))
        intrinsics = load_files("intrinsics", np.loadtxt, (4, 4))
        self.images = (
            load_files("rgb", lambda f: io_lib.load_img(f)) / 255.0
        )[..., :3].astype(np.float32)
        self.camtoworlds = poses[:, :3, :4].astype(np.float32)
        self.pixtocams = np.linalg.inv(intrinsics)[..., :3, :3].astype(np.float32)


class TanksAndTemplesFVS(Dataset):
    """Tanks & Temples (Free View Synthesis layout): ibr3d image pyramids +
    Ks/Rs/ts npy cameras (datasets.py:3340-3402)."""

    def _load_renderings(self, config):
        basedir = os.path.join(self.data_dir, "dense")
        sizes = sorted(
            f for f in os.listdir(basedir) if f.startswith("ibr3d")
        )[::-1]
        if config.factor >= len(sizes):
            raise ValueError(f"Factor {config.factor} larger than {len(sizes)}")
        basedir = os.path.join(basedir, sizes[config.factor])

        files = sorted(f for f in os.listdir(basedir) if f.startswith("im_"))
        images = np.array(
            [io_lib.load_img(os.path.join(basedir, f)) for f in files]
        ) / 255.0

        intrinsics = np.load(os.path.join(basedir, "Ks.npy"))
        rot = np.load(os.path.join(basedir, "Rs.npy"))
        trans = np.load(os.path.join(basedir, "ts.npy"))
        w2c = np.concatenate([rot, trans[..., None]], axis=-1)
        c2w_colmap = np.linalg.inv(camera_utils.pad_poses(w2c))[:, :3, :4]
        c2w = c2w_colmap @ np.diag([1.0, -1, -1, 1])
        poses, _ = camera_utils.transform_poses_pca(c2w)

        all_indices = np.arange(images.shape[0])
        test = all_indices % config.llffhold == 0
        indices = all_indices[~test] if self.split == "train" else all_indices[test]
        self.images = images[indices][..., :3].astype(np.float32)
        self.camtoworlds = poses[indices].astype(np.float32)
        self.pixtocams = np.linalg.inv(intrinsics)[..., :3, :3].astype(np.float32)
        if self.pixtocams.shape[0] == images.shape[0]:
            self.pixtocams = self.pixtocams[indices]


class DTU(Dataset):
    """DTU MVS scans: projection-matrix decomposition per view
    (datasets.py:3405-3480)."""

    def _load_renderings(self, config):
        import cv2

        def load_image(i):
            if config.dtu_light_cond < 7:
                light_str = f"{config.dtu_light_cond}_r" + (
                    "5000" if i < 50 else "7000"
                )
            else:
                light_str = "max"
            image = io_lib.load_img(
                os.path.join(self.data_dir, f"rect_{i:03d}_{light_str}.png")
            ) / 255.0
            if config.factor > 1:
                image = io_lib.downsample(image, config.factor)
            projection = np.loadtxt(
                os.path.join(
                    self.data_dir, f"../../Calibration/cal18/pos_{i:03d}.txt"
                ),
                dtype=np.float32,
            )
            camera_mat, rot_mat, t = cv2.decomposeProjectionMatrix(projection)[:3]
            camera_mat = camera_mat / camera_mat[2, 2]
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = rot_mat.transpose()
            pose[:3, 3] = (t[:3] / t[3])[:, 0]
            if config.factor > 0:
                camera_mat = (
                    np.diag([1.0 / config.factor, 1.0 / config.factor, 1.0]).astype(
                        np.float32
                    )
                    @ camera_mat
                )
            return image, pose[:3], np.linalg.inv(camera_mat)

        n_images = len(os.listdir(self.data_dir)) // 8
        images, camtoworlds, pixtocams = zip(
            *[load_image(i) for i in range(1, n_images + 1)]
        )
        images = np.stack(images)
        camtoworlds = np.stack(camtoworlds) @ np.diag([1.0, -1, -1, 1]).astype(
            np.float32
        )
        camtoworlds, _ = camera_utils.transform_poses_focus(camtoworlds)
        camtoworlds[:, :3, -1] /= np.max(np.abs(camtoworlds[:, :3, -1]))

        all_indices = np.arange(images.shape[0])
        test = all_indices % config.llffhold == 0
        indices = all_indices[~test] if self.split == "train" else all_indices[test]
        self.images = images[indices][..., :3].astype(np.float32)
        self.camtoworlds = camtoworlds[indices].astype(np.float32)
        self.pixtocams = np.stack(pixtocams)[indices].astype(np.float32)


class RTMV(Dataset):
    """RTMV ray-traced multi-view scenes: per-frame EXR + camera JSON
    (datasets.py:3575-3658). No train/test split in the dataset itself."""

    def _load_renderings(self, config):
        filenames = sorted(os.listdir(self.data_dir))
        image_filenames = [
            f for f in filenames
            if f.endswith(".exr")
            and not f.endswith(".depth.exr")
            and not f.endswith(".seg.exr")
        ]
        camera_filenames = [f for f in filenames if f.endswith(".json")]
        assert len(image_filenames) == len(camera_filenames)

        images, poses = [], []
        camera_data = None
        for image_f, camera_f in zip(image_filenames, camera_filenames):
            channels = io_lib.load_exr(os.path.join(self.data_dir, image_f))
            if config.factor > 1:
                channels = io_lib.downsample(channels, config.factor)
            images.append(image_ops.linear_to_srgb(channels))
            with open(os.path.join(self.data_dir, camera_f)) as fp:
                camera_data = json.load(fp)["camera_data"]
            poses.append(np.array(camera_data["cam2world"]).T[:3, :4])

        self.images = np.stack(images, axis=0)
        rgb = self.images[..., :3]
        alpha = (
            self.images[..., -1:]
            if self.images.shape[-1] == 4
            else np.ones_like(rgb[..., :1])
        )
        self.images = (rgb * alpha).astype(np.float32)
        self.masks = alpha.astype(np.float32)
        h, w = self.images.shape[1:3]
        focal = float(camera_data["intrinsics"]["fx"]) / max(config.factor, 1)
        self.pixtocams = camera_utils.get_pixtocam(focal, w, h)[None].astype(
            np.float32
        )
        self.camtoworlds = np.stack(poses, axis=0).astype(np.float32)


def _read_sfm_camera(path):
    """Read one SfM camera from an open serialization (JSON or .npz).

    The reference's PixelRig/Aerial loaders deserialize Google-internal
    vision_sfm CameraProto files (reference datasets.py:3513, 3683) — whose
    imports don't exist even in the public reference release, so that path
    is dead upstream. We keep the loaders alive on an open encoding of the
    exact quantities those loaders consume:

      focal_length          float (pixels)            [required]
      pixel_aspect_ratio    float, fy = f * aspect    [default 1.0]
      principal_point_x/_y  floats (pixels)           [required]
      image_size_x/_y       ints                      [optional]
      camera_from_world     [4,4] row-major           [this or its inverse]
      world_from_camera     [4,4] row-major

    Binary CameraProto files still fail with a clear message.
    """
    blob = open(path, "rb").read()
    cam = None
    try:
        cam = {k: np.asarray(v) for k, v in json.loads(blob).items()}
    except (UnicodeDecodeError, json.JSONDecodeError):
        try:
            cam = dict(np.load(io.BytesIO(blob), allow_pickle=False))
        except Exception:
            pass
    if cam is None or "focal_length" not in cam:
        raise NotImplementedError(
            f"camera file {path!r} is not the open JSON/npz SfM-camera "
            "format (see _read_sfm_camera); Google-internal vision_sfm "
            "CameraProto binaries cannot be parsed without the internal "
            "schema — re-export cameras as JSON/npz."
        )
    if "camera_from_world" in cam:
        cam_from_world = np.asarray(cam["camera_from_world"], np.float64)
    else:
        cam_from_world = np.linalg.inv(
            np.asarray(cam["world_from_camera"], np.float64)
        )
    f = float(cam["focal_length"])
    aspect = float(cam.get("pixel_aspect_ratio", 1.0))
    calibration = camera_utils.intrinsic_matrix(
        f, f * aspect,
        float(cam["principal_point_x"]), float(cam["principal_point_y"]),
    )
    return {
        "camera_from_world": cam_from_world,
        "calibration": calibration,
        "focal_length": f,
        "image_size_x": int(cam.get("image_size_x", 0)),
        "image_size_y": int(cam.get("image_size_y", 0)),
    }


def _opencv_pose(cam_from_world, translation_scale):
    """world-from-camera [3,4] in OpenGL axes, positions rescaled."""
    pose = np.linalg.inv(camera_utils.pad_poses(cam_from_world[:3, :4]))[:3, :4]
    pose = pose @ np.diag([1.0, -1.0, -1.0, 1.0])  # OpenCV -> OpenGL
    pose[:3, -1] *= translation_scale
    return pose


class PixelRig(Dataset):
    """Pixel phone 5-camera cross rig: central camera at the world origin,
    forward-facing scenes rendered in NDC space (reference
    datasets.py:3482-3572). Cameras come from the open JSON/npz encoding
    (_read_sfm_camera) of the rig's SfM cameras.
    """

    def _load_renderings(self, config):
        images_dir = self.data_dir
        cameras_dir = images_dir.replace("scaled_images", "scaled_camera_pose")
        image_files = sorted(os.listdir(images_dir))
        camera_files = sorted(os.listdir(cameras_dir))
        assert len(image_files) == len(camera_files)

        images, poses, pixtocams = [], [], []
        for image_f, camera_f in zip(image_files, camera_files):
            images.append(
                io_lib.load_img(os.path.join(images_dir, image_f)) / 255.0
            )
            cam = _read_sfm_camera(os.path.join(cameras_dir, camera_f))
            # NDC space assumes world near = 1, so positions are scaled by
            # 1/near; near/far become the NDC bounds [0, 1).
            poses.append(
                _opencv_pose(cam["camera_from_world"], 1.0 / config.near)
            )
            pixtocams.append(np.linalg.inv(cam["calibration"]))
        self.near, self.far = 0.0, 1.0

        # World flip so poses face -z "forward" as the NDC warp requires.
        poses = np.diag([1.0, -1.0, -1.0]) @ np.stack(poses, axis=0)

        # Circular render path around the rig center (the central camera
        # sits at the origin by the rig's construction).
        radius = np.mean(np.linalg.norm(poses[:, :3, -1], axis=-1))
        angles = np.linspace(
            0, 2 * np.pi, config.render_path_frames, endpoint=False
        )
        self.render_poses = np.stack(
            [
                np.concatenate(
                    [
                        np.eye(3),
                        radius
                        * np.array([[np.cos(a)], [np.sin(a)], [0.0]]),
                    ],
                    axis=-1,
                )
                for a in angles
            ],
            axis=0,
        ).astype(np.float32)

        if config.render_path:
            self.camtoworlds = self.render_poses
            self.pixtocams = pixtocams[0].astype(np.float32)
        else:
            self.camtoworlds = poses.astype(np.float32)
            self.pixtocams = np.stack(pixtocams, axis=0).astype(np.float32)
        self.images = np.stack(images, axis=0)[..., :3].astype(np.float32)

        # The NDC projection uses a CENTERED principal point.
        h, w = self.images.shape[1:3]
        focal = 1.0 / self.pixtocams.reshape(-1, 3, 3)[0, 0, 0]
        self.pixtocam_ndc = np.linalg.inv(
            camera_utils.intrinsic_matrix(focal, focal, w / 2.0, h / 2.0)
        ).astype(np.float32)


class Aerial(Dataset):
    """Aerial captures: rgb/ + cameras/ directories, scene pre-scaled into
    [-2, 2]^3 by config.world_scale (reference datasets.py:3661-3768).
    Cameras come from the open JSON/npz encoding (_read_sfm_camera).
    """

    def _load_renderings(self, config):
        images_dir = os.path.join(self.data_dir, "rgb")
        cameras_dir = os.path.join(self.data_dir, "cameras")
        image_files = sorted(os.listdir(images_dir))
        camera_files = sorted(os.listdir(cameras_dir))
        assert len(image_files) == len(camera_files)

        images = np.stack(
            [
                io_lib.load_img(os.path.join(images_dir, f)) / 255.0
                for f in image_files
            ],
            axis=0,
        )

        def load_cam(path):
            cam = _read_sfm_camera(path)
            pose = _opencv_pose(
                cam["camera_from_world"], 1.0 / config.world_scale
            )
            return cam, pose, np.linalg.inv(cam["calibration"])

        cams = [
            load_cam(os.path.join(cameras_dir, f)) for f in camera_files
        ]
        poses = np.stack([c[1] for c in cams], axis=0)
        pixtocams = np.stack([c[2] for c in cams], axis=0)

        # Split by llffhold: every llffhold-th image is test.
        all_indices = np.arange(images.shape[0])
        is_test = all_indices % config.llffhold == 0
        indices = all_indices[is_test if self.split != "train" else ~is_test]

        self.images = images[indices][..., :3].astype(np.float32)
        self.camtoworlds = poses[indices].astype(np.float32)
        self.pixtocams = pixtocams[indices].astype(np.float32)

        if config.render_path:
            orbit_dir = os.path.join(self.data_dir, "orbit_cameras")
            if os.path.isdir(orbit_dir):
                # Exported orbit cameras override everything, including the
                # intrinsics/size of the render cameras.
                render_poses = []
                for f in sorted(os.listdir(orbit_dir)):
                    cam, pose, pixtocam = load_cam(os.path.join(orbit_dir, f))
                    render_poses.append(pose)
                    self.pixtocams = pixtocam.astype(np.float32)
                    if cam["image_size_x"]:
                        self.width = cam["image_size_x"]
                        self.height = cam["image_size_y"]
                self.camtoworlds = np.stack(render_poses, axis=0).astype(
                    np.float32
                )
            else:
                # Circular path over the [-1,1]^3-normalized scene.
                h, w = images.shape[1:3]
                angles = np.linspace(
                    0, 2 * np.pi, config.render_path_frames, endpoint=False
                )
                up = np.array([0.0, 0.0, 1.0])
                self.camtoworlds = np.stack(
                    [
                        camera_utils.viewmatrix(
                            np.array([np.cos(a), np.sin(a), 1.0]),
                            up,
                            np.array([np.cos(a), np.sin(a), 1.0]),
                        )
                        for a in angles
                    ],
                    axis=0,
                ).astype(np.float32)
                focal = 3.0 * w
                self.pixtocams = np.array(
                    [
                        [1.0 / focal, 0.0, -0.5 * w / focal],
                        [0.0, -1.0 / focal, 0.5 * h / focal],
                        [0.0, 0.0, -1.0],
                    ],
                    np.float32,
                )


class PreloadedData(Dataset):
    """Arrays already in memory, passed as constructor kwargs — convenient
    for notebooks/debugging (reference datasets.py:3771-3800): images
    [N,H,W,3], camtoworlds [N,3,4], pixtocams [N or 1,3,3]."""

    def __init__(self, split, data_dir, config, **kwargs):
        self._preloaded = kwargs
        super().__init__(split, data_dir, config)

    def _load_renderings(self, config):
        self.images = np.asarray(self._preloaded["images"], np.float32)
        self.camtoworlds = np.asarray(
            self._preloaded["camtoworlds"], np.float32
        )
        self.pixtocams = np.asarray(self._preloaded["pixtocams"], np.float32)


# --- procedural test scene -------------------------------------------------------------


class SyntheticSpheres(Dataset):
    """Procedural analytic scene: lambertian spheres under a point light +
    ambient. Used for tests/benchmarks; images are ray-traced in numpy at
    construction time so no data files are needed.

    Two shading models (`Config.synthetic_spheres_shading` or the `shading`
    kwarg):

    * "legacy": ``rgb = albedo * (AMBIENT + (1-AMBIENT) * lambert)`` — no
      falloff, no shadows. Kept for continuity with earlier measured
      numbers, but albedo and shading are multiplicatively entangled and
      the missing inverse-square falloff mismatches the material model's
      physics, which caps albedo recovery on this scene.
    * "physical": ``rgb = albedo/pi * (ENV_IRRADIANCE + LIGHT_POWER *
      lambert * visibility / dist^2)`` with sphere-on-sphere shadow rays —
      exactly the rendering equation the active material path implements
      (point light with inverse-square falloff + constant-environment
      ambient), so inverse rendering is well-posed: shadowed pixels see
      ambient-only (albedo up to one global scale), lit pixels add the
      distance-attenuated direct term.
    * "physical_glossy": "physical" with per-sphere microfacet materials
      (MATERIALS roughness/metalness): GGX D, Schlick F, Smith G with
      k = a/2 — term-for-term the BRDF the material shader evaluates
      (ops/render_utils.get_lobe, reference render_utils.py:566-695) — so
      specular/roughness recovery is testable against analytic GT, the
      NeRO-glossy axis of the reference's benchmark suite.
    """

    SPHERES = (
        # (center, radius, albedo)
        ((0.0, 0.0, 0.0), 0.55, (0.9, 0.3, 0.25)),
        ((0.7, 0.4, -0.25), 0.3, (0.25, 0.55, 0.9)),
        ((-0.6, -0.5, -0.15), 0.4, (0.3, 0.85, 0.4)),
    )
    # Per-sphere (roughness, metalness), physical_glossy only: one lambertian
    # anchor, one polished metal, one mid-gloss dielectric.
    MATERIALS = ((1.0, 0.0), (0.15, 0.9), (0.4, 0.3))
    F0_DIELECTRIC = 0.04
    LIGHT = np.array([1.5, -1.5, 2.5], np.float32)
    AMBIENT = 0.25
    # Physical mode: the light sits closer to the spheres so the
    # inverse-square falloff varies strongly across the scene (d^2 spans
    # ~2.3-20) and the spheres cast real shadows on each other — both are
    # the cues that make albedo/shading separation well-posed. The radiant
    # intensity and constant environment irradiance keep the brightest lit
    # pixel just under 1.0, so no LDR clipping breaks the physics. The
    # albedo/pi lambertian normalization is folded into these constants
    # (i.e. they are pre-multiplied by pi) so stored albedo maps stay
    # directly comparable across both shading modes.
    PHYSICAL_LIGHT = np.array([1.0, -1.0, 1.5], np.float32)
    LIGHT_POWER = 2.2
    ENV_IRRADIANCE = 0.12

    def __init__(self, split, data_dir, config, num_images=None, resolution=None,
                 shading=None, multi_illum=None):
        if num_images is None:
            num_images = (
                config.num_dataset_images if config.num_dataset_images > 0 else 16
            )
        if resolution is None:
            resolution = 48 // max(1, config.factor)
        self._num_images = num_images
        self._resolution = resolution
        if shading is None:
            shading = getattr(config, "synthetic_spheres_shading", "legacy")
        if shading not in ("legacy", "physical", "physical_glossy"):
            raise ValueError(f"Unknown synthetic_spheres_shading {shading!r}")
        self._shading = shading
        self._light = self.LIGHT if shading == "legacy" else self.PHYSICAL_LIGHT
        if multi_illum is None:
            multi_illum = getattr(config, "synthetic_spheres_multi_illum", False)
        self._multi_illum = bool(multi_illum)
        super().__init__(split, data_dir, config)

    def _image_lights(self):
        """Per-image light positions.

        Fixed light unless multi-illum, where each view is lit from a
        different azimuth: the base light rotated about z through N evenly
        spaced angles, with a split-dependent phase so held-out views also
        hold out their illuminants (a relighting test, not interpolation).
        """
        n = self._num_images
        if not self._multi_illum:
            return np.broadcast_to(self._light, (n, 3)).copy()
        phase = 0.0 if self.split == "train" else np.pi / max(n, 1)
        angles = 2 * np.pi * np.arange(n) / max(n, 1) + phase
        r = float(np.linalg.norm(self._light[:2]))
        base = np.arctan2(self._light[1], self._light[0])
        lights = np.stack(
            [r * np.cos(base + angles), r * np.sin(base + angles),
             np.full(n, self._light[2], np.float32)], axis=-1,
        )
        return lights.astype(np.float32)

    def _light_visibility(self, points, normals, light):
        """1.0 where the segment point->light is unoccluded by any sphere."""
        vis = np.ones((points.shape[0],), np.float32)
        to_light = light - points
        dist = np.linalg.norm(to_light, axis=-1)
        ldir = to_light / dist[:, None]
        # Offset along the normal so a sphere never shadows itself at its
        # own surface point.
        origins = points + 1e-3 * normals
        for center, radius, _ in self.SPHERES:
            center = np.array(center, np.float32)
            oc = origins - center
            b = np.sum(oc * ldir, -1)
            c = np.sum(oc * oc, -1) - radius**2
            disc = b * b - c
            t = -b - np.sqrt(np.maximum(disc, 0))
            occluded = (disc > 0) & (t > 1e-3) & (t < dist)
            vis[occluded] = 0.0
        return vis

    def _trace(self, origins, dirs, light=None):
        """Analytic ray tracing of the sphere scene.

        Returns (rgb, alpha, t_hit, light_dist): hit distance along the ray
        and surface→light distance feed the transient (time-binned) variant.
        """
        if light is None:
            light = self._light
        n = origins.shape[0]
        best_t = np.full((n,), np.inf, np.float32)
        rgb = np.ones((n, 3), np.float32)  # white background
        alpha = np.zeros((n,), np.float32)
        light_dist = np.zeros((n,), np.float32)
        albedo_out = np.ones((n, 3), np.float32)
        normal_out = np.zeros((n, 3), np.float32)
        rough_out = np.ones((n,), np.float32)
        for si, (center, radius, albedo) in enumerate(self.SPHERES):
            center = np.array(center, np.float32)
            oc = origins - center
            b = np.sum(oc * dirs, -1)
            c = np.sum(oc * oc, -1) - radius**2
            disc = b * b - c
            hit = disc > 0
            t = -b - np.sqrt(np.maximum(disc, 0))
            hit &= (t > 1e-3) & (t < best_t)
            if not hit.any():
                continue
            p = origins[hit] + t[hit, None] * dirs[hit]
            normal = (p - center) / radius
            to_light = light - p
            dist = np.linalg.norm(to_light, axis=-1, keepdims=True)
            ldir = to_light / dist
            lambert = np.maximum(0.0, np.sum(normal * ldir, -1, keepdims=True))
            alb = np.array(albedo, np.float32)
            if self._shading == "physical_glossy":
                vis = self._light_visibility(p, normal, light)[:, None]
                rough, metal = self.MATERIALS[si]
                vdir = -dirs[hit]
                spec = self._ggx_specular(normal, vdir, ldir, alb, rough, metal)
                # Stored constants are pre-multiplied by pi (see PHYSICAL_LIGHT
                # comment), so the un-normalized GGX lobe carries the pi back.
                diffuse = (1.0 - metal) * alb * lambert
                rgb[hit] = (
                    self.ENV_IRRADIANCE * (1.0 - metal) * alb
                    + self.LIGHT_POWER * vis / dist**2
                    * (diffuse + np.pi * spec)
                )
                rough_out[hit] = rough
            elif self._shading == "physical":
                vis = self._light_visibility(p, normal, light)[:, None]
                shade = (self.ENV_IRRADIANCE
                         + self.LIGHT_POWER * lambert * vis / dist**2)
                rgb[hit] = alb * shade
            else:
                shade = self.AMBIENT + (1 - self.AMBIENT) * lambert
                rgb[hit] = alb * shade
            best_t[hit] = t[hit]
            alpha[hit] = 1.0
            light_dist[hit] = dist[..., 0]
            albedo_out[hit] = alb
            normal_out[hit] = normal
        return rgb, alpha, best_t, light_dist, albedo_out, normal_out, rough_out

    def _ggx_specular(self, normal, vdir, ldir, albedo, roughness, metalness):
        """Microfacet specular lobe, term-for-term ops/render_utils.get_lobe:
        GGX D, Schlick F on F0 = albedo*metal + 0.04*(1-metal), Smith G with
        k = a/2 (n.l folded into G's numerator), over 4 n.v."""
        eps = np.finfo(np.float32).eps
        h = vdir + ldir
        h = h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), eps)
        n_v = np.maximum(0.0, np.sum(normal * vdir, -1, keepdims=True))
        n_l = np.maximum(0.0, np.sum(normal * ldir, -1, keepdims=True))
        n_h = np.maximum(0.0, np.sum(normal * h, -1, keepdims=True))
        l_h = np.maximum(0.0, np.sum(ldir * h, -1, keepdims=True))
        f0 = albedo * metalness + self.F0_DIELECTRIC * (1.0 - metalness)
        fresnel = f0 + (1.0 - f0) * np.clip(1.0 - l_h, 0.0, 1.0) ** 5
        a = roughness
        d = a**2 / np.maximum(eps, np.pi * (n_h**2 * (a**2 - 1.0) + 1.0) ** 2)
        k = a / 2
        g = (n_v / np.maximum(eps, n_v * (1.0 - k) + k)) * (
            n_l / np.maximum(eps, n_l * (1.0 - k) + k)
        )
        return d * fresnel * g / np.maximum(eps, 4.0 * n_v)

    def _bin_transient(self, rgb, alpha, t_hit, light_dist, config):
        """Scatter the direct response into time bins at the total path
        length (camera→surface→light) / exposure_time — the same convention
        as render.shift_direct, so the model's direct pulse can match it."""
        n_bins = config.n_bins
        n = rgb.shape[0]
        out = np.zeros((n, n_bins, 3), np.float32)
        hit = alpha > 0
        bin_f = (t_hit[hit] + light_dist[hit]) / config.exposure_time
        bin_f = np.clip(bin_f, 0, n_bins - 1 - 1e-4)
        b0 = np.floor(bin_f).astype(np.int32)
        frac = (bin_f - b0)[:, None]
        idx = np.nonzero(hit)[0]
        out[idx, b0] += rgb[hit] * (1 - frac)
        out[idx, b0 + 1] += rgb[hit] * frac
        if config.synthetic_spheres_impulse_sigma > 0:
            out = _convolve_bins(out, self._impulse_kernel(config))
        return out

    @staticmethod
    def _impulse_kernel(config):
        """Gaussian sensor impulse response (odd length, unit mass) shared
        by the GT transients and — via rays.impulse_response — the model's
        rendering, so both sides of the IoU carry the same pulse width."""
        sigma = float(config.synthetic_spheres_impulse_sigma)
        half = max(1, int(np.ceil(3.0 * sigma)))
        taps = np.arange(-half, half + 1, dtype=np.float64)
        k = np.exp(-(taps**2) / (2.0 * sigma**2))
        return (k / k.sum()).astype(np.float32)

    def _load_renderings(self, config):
        res = self._resolution
        focal = 1.2 * res
        if config.use_transient and config.synthetic_spheres_impulse_sigma > 0:
            # The model convolves its rendering with rays.impulse_response
            # (integrator.py filter_primary path) — hand it the same kernel
            # the GT transients are convolved with.
            self.impulse_response = self._impulse_kernel(config)
        camtoworlds = camera_utils.generate_spherical_poses(
            self._num_images, radius=4.0, seed=17 if self.split == "train" else 31
        )
        pixtocam = camera_utils.get_pixtocam(focal, res, res)

        pix_x, pix_y = np.meshgrid(np.arange(res), np.arange(res), indexing="xy")
        pix_x = pix_x.reshape(-1).astype(np.float32)
        pix_y = pix_y.reshape(-1).astype(np.float32)

        images = []
        alphas = []
        albedo_maps = []
        normal_maps = []
        rough_maps = []
        image_lights = self._image_lights()
        for c2w, light in zip(camtoworlds, image_lights):
            out = camera_utils.pixels_to_rays(pix_x, pix_y, pixtocam[None], c2w[None], xnp=np)
            origins, _, viewdirs = out[0], out[1], out[2]
            rgb, alpha, t_hit, light_dist, albedo, normal, rough = self._trace(
                origins.reshape(-1, 3), viewdirs.reshape(-1, 3), light
            )
            if config.use_transient:
                transient = self._bin_transient(rgb, alpha, t_hit, light_dist, config)
                images.append(transient.reshape(res, res, config.n_bins, 3))
            else:
                images.append(rgb.reshape(res, res, 3))
            alphas.append(alpha.reshape(res, res))
            albedo_maps.append(albedo.reshape(res, res, 3))
            normal_maps.append(normal.reshape(res, res, 3))
            rough_maps.append(rough.reshape(res, res))
        self.images = np.stack(images).astype(np.float32)
        self.alphas = np.stack(alphas).astype(np.float32)
        self.masks = self.alphas[..., None]
        if self._load_albedos:
            self.albedo_images = np.stack(albedo_maps).astype(np.float32)
            if self._shading == "physical_glossy":
                # Analytic GT roughness, for specular-recovery metrics.
                self.roughness_images = np.stack(rough_maps).astype(np.float32)
        if self._load_normals:
            self.normal_images = np.stack(normal_maps).astype(np.float32)
        self.pixtocams = pixtocam[None].astype(np.float32)
        self.camtoworlds = camtoworlds
        self.lights = image_lights
