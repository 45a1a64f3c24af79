"""Datasets and ray batching.

Behavioral parity target: reference internal/datasets.py (Dataset ABC
:591-1066, RayBatcher :1069-1150, Blender :1169-1425). This round ships the
Blender/NGP-poses loader and a procedural `SyntheticSpheres` dataset used by
tests and benchmarks when no data is on disk; the remaining 20 loaders land
with the dataset phase.

Batching is host-side numpy: `_next_train` draws random pixels across all
images, casts them to rays, and the training loop device_puts the batch with
a data-axis NamedSharding (no per-device reshape, see parallel.mesh).
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Optional

import jax
import numpy as np

from neural_radiance_caching_tpu.data import camera_utils
from neural_radiance_caching_tpu.ops import image as image_ops
from neural_radiance_caching_tpu.utils import pytrees


def load_dataset(split, data_dir, config, **kwargs):
    """Dataset dispatcher (datasets.py:182-206)."""
    loaders = {
        "blender": Blender,
        "synthetic_spheres": SyntheticSpheres,
    }
    return loaders[config.dataset_loader](split, data_dir, config, **kwargs)


class Dataset:
    """Base dataset: holds images + cameras, serves ray batches."""

    def __init__(self, split, data_dir, config):
        self.split = split
        self.data_dir = data_dir
        self.config = config
        self._patch_size = max(config.patch_size, 1)
        self._batch_size = config.batch_size
        self.near = config.near
        self.far = config.far
        self._render_spherical = False
        self._num_repeats = 1

        self.images = None  # [N, H, W, 3] float32
        self.camtoworlds = None  # [N, 3, 4]
        self.pixtocams = None  # [N or 1, 3, 3]
        self.lights = None  # [N, 3]
        self.light_idx = None
        self.alphas = None
        self.masks = None
        self.normal_images = None
        self.albedo_images = None
        self.depth_images = None

        self._np_rng = np.random.RandomState(config.np_rng_seed + (0 if split == "train" else 1))
        self._load_renderings(config)

        self.num_images = self.images.shape[0]
        self.height, self.width = self.images.shape[1:3]
        if self.pixtocams.ndim == 2:
            self.pixtocams = self.pixtocams[None]
        if self.lights is None:
            self.lights = self.camtoworlds[:, :3, -1]

    def _load_renderings(self, config):
        raise NotImplementedError

    @property
    def cameras(self):
        return (self.pixtocams, self.camtoworlds, None, None)

    # --- batching ---------------------------------------------------------

    def _make_pixels(self, cam_idx, pix_x, pix_y):
        n = pix_x.shape[0]
        light_idx = (
            self.light_idx[cam_idx, pix_y, pix_x]
            if self.light_idx is not None
            else np.zeros((n, 1), np.int32)
        )
        return pytrees.Pixels(
            pix_x_int=pix_x,
            pix_y_int=pix_y,
            lossmult=np.ones((n, 1), np.float32),
            near=np.full((n, 1), self.near, np.float32),
            far=np.full((n, 1), self.far, np.float32),
            cam_idx=cam_idx[..., None].astype(np.int32),
            light_idx=light_idx.reshape(n, 1).astype(np.int32),
        )

    def _gather_batch(self, cam_idx, pix_x, pix_y):
        pixels = self._make_pixels(cam_idx, pix_x, pix_y)
        rgb = self.images[cam_idx, pix_y, pix_x]
        masks = self.masks[cam_idx, pix_y, pix_x] if self.masks is not None else None
        normals = (
            self.normal_images[cam_idx, pix_y, pix_x] if self.normal_images is not None else None
        )
        albedos = (
            self.albedo_images[cam_idx, pix_y, pix_x] if self.albedo_images is not None else None
        )
        alphas = self.alphas[cam_idx, pix_y, pix_x] if self.alphas is not None else None
        if self.config.cast_rays_in_train_step:
            rays = pixels
        else:
            rays = camera_utils.cast_ray_batch(self.cameras, self.lights, pixels, xnp=np)
        return pytrees.Batch(
            rays=rays, rgb=rgb, masks=masks, normals=normals, albedos=albedos, alphas=alphas
        )

    def next_train(self):
        """Random pixels across all train images."""
        n = self._batch_size
        cam_idx = self._np_rng.randint(0, self.num_images, (n,))
        pix_x = self._np_rng.randint(0, self.width, (n,))
        pix_y = self._np_rng.randint(0, self.height, (n,))
        return self._gather_batch(cam_idx, pix_x, pix_y)

    def generate_ray_batch(self, cam_idx: int):
        """All pixels of one image, for eval rendering."""
        pix_x, pix_y = np.meshgrid(
            np.arange(self.width), np.arange(self.height), indexing="xy"
        )
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


# --- Loaders ------------------------------------------------------------------


def load_ngp_posedata(data_dir, json_name):
    """Parse an instant-ngp/nerf-synthetic transforms JSON."""
    with open(os.path.join(data_dir, json_name)) as f:
        meta = json.load(f)
    frames = meta["frames"]
    names = []
    camtoworlds = []
    for frame in frames:
        names.append(frame["file_path"])
        camtoworlds.append(np.array(frame["transform_matrix"], np.float32)[:3, :4])
    camtoworlds = np.stack(camtoworlds)
    return meta, names, camtoworlds


class Blender(Dataset):
    """NeRF-synthetic / TensoIR blender scenes (datasets.py:1169+)."""

    def _load_renderings(self, config):
        split_name = "train" if self.split == "train" else "test"
        meta, names, camtoworlds = load_ngp_posedata(
            self.data_dir, f"transforms_{split_name}.json"
        )

        from PIL import Image

        images = []
        for name in names:
            path = os.path.join(self.data_dir, name)
            if not os.path.splitext(path)[1]:
                path = path + ".png"
            with open(path, "rb") as f:
                img = np.array(Image.open(f), dtype=np.float32) / 255.0
            if config.factor > 1:
                img = img[:: config.factor, :: config.factor]
            images.append(img)
        images = np.stack(images)

        if images.shape[-1] == 4:
            self.alphas = images[..., -1]
            self.masks = self.alphas[..., None]
        else:
            self.alphas = np.ones_like(images[..., 0])
            self.masks = self.alphas[..., None]

        rgb = images[..., :3]
        if not config.linear_to_srgb:
            rgb = np.clip(image_ops.srgb_to_linear(rgb), 0.0, np.inf)
        # White background compositing.
        self.images = (rgb * self.masks + (1.0 - self.masks)).astype(np.float32)

        h, w = self.images.shape[1:3]
        if "camera_angle_x" in meta:
            focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
        else:
            focal = float(meta["fl_x"])
        self.pixtocams = camera_utils.get_pixtocam(focal, w, h)[None].astype(np.float32)
        self.camtoworlds = camtoworlds
        self.lights = camtoworlds[:, :3, -1]


class SyntheticSpheres(Dataset):
    """Procedural analytic scene: lambertian spheres + ground under a point
    light + ambient. Used for tests/benchmarks; images are ray-traced in
    numpy at construction time so no data files are needed.
    """

    SPHERES = (
        # (center, radius, albedo)
        ((0.0, 0.0, 0.0), 0.55, (0.9, 0.3, 0.25)),
        ((0.7, 0.4, -0.25), 0.3, (0.25, 0.55, 0.9)),
        ((-0.6, -0.5, -0.15), 0.4, (0.3, 0.85, 0.4)),
    )
    LIGHT = np.array([1.5, -1.5, 2.5], np.float32)
    AMBIENT = 0.25

    def __init__(self, split, data_dir, config, num_images=None, resolution=None):
        if num_images is None:
            num_images = (
                config.num_dataset_images if config.num_dataset_images > 0 else 16
            )
        if resolution is None:
            resolution = 48 // max(1, config.factor)
        self._num_images = num_images
        self._resolution = resolution
        super().__init__(split, data_dir, config)

    def _trace(self, origins, dirs):
        """Analytic ray tracing of the sphere scene; returns rgb + alpha."""
        n = origins.shape[0]
        best_t = np.full((n,), np.inf, np.float32)
        rgb = np.ones((n, 3), np.float32)  # white background
        alpha = np.zeros((n,), np.float32)
        for center, radius, albedo in self.SPHERES:
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
            to_light = self.LIGHT - p
            dist = np.linalg.norm(to_light, axis=-1, keepdims=True)
            ldir = to_light / dist
            lambert = np.maximum(0.0, np.sum(normal * ldir, -1, keepdims=True))
            shade = self.AMBIENT + (1 - self.AMBIENT) * lambert
            rgb[hit] = np.array(albedo, np.float32) * shade
            best_t[hit] = t[hit]
            alpha[hit] = 1.0
        return rgb, alpha

    def _load_renderings(self, config):
        res = self._resolution
        focal = 1.2 * res
        camtoworlds = camera_utils.generate_spherical_poses(
            self._num_images, radius=4.0, seed=17 if self.split == "train" else 31
        )
        pixtocam = camera_utils.get_pixtocam(focal, res, res)

        pix_x, pix_y = np.meshgrid(np.arange(res), np.arange(res), indexing="xy")
        pix_x = pix_x.reshape(-1).astype(np.float32)
        pix_y = pix_y.reshape(-1).astype(np.float32)

        images = []
        alphas = []
        for c2w in camtoworlds:
            out = camera_utils.pixels_to_rays(pix_x, pix_y, pixtocam[None], c2w[None], xnp=np)
            origins, _, viewdirs = out[0], out[1], out[2]
            rgb, alpha = self._trace(origins.reshape(-1, 3), viewdirs.reshape(-1, 3))
            images.append(rgb.reshape(res, res, 3))
            alphas.append(alpha.reshape(res, res))
        self.images = np.stack(images).astype(np.float32)
        self.alphas = np.stack(alphas).astype(np.float32)
        self.masks = self.alphas[..., None]
        self.pixtocams = pixtocam[None].astype(np.float32)
        self.camtoworlds = camtoworlds
        self.lights = np.broadcast_to(self.LIGHT, (self._num_images, 3)).copy()
