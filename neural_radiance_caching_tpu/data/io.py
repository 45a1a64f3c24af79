"""Image / volume file IO for the dataset loaders.

Behavioral parity target: reference internal/datasets.py get_img/get_imgs
(:107-171) and read_hdr (:1153), internal/image_io.py. Uses PIL + imageio +
cv2 (all baked into the image); EXR via imageio's builtin reader.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def load_img(path, is_16bit=False):
    """Load a PNG/JPG into float32 (raw range — callers divide by 255)."""
    from PIL import Image

    with open(path, "rb") as f:
        img = np.array(Image.open(f), dtype=np.float32)
    return img


def load_exr(path):
    # No EXR library ships in this environment; use the built-in scanline
    # codec (data/exr.py). imageio is tried first in case a plugin exists.
    try:
        import imageio.v2 as imageio

        return np.asarray(imageio.imread(path), dtype=np.float32)
    except Exception:
        from neural_radiance_caching_tpu.data import exr

        return exr.read_exr(path)


def read_h5(path):
    import h5py

    if not path.endswith(".h5"):
        path = path + ".h5"
    with h5py.File(path, "r") as f:
        return np.array(f["data"]).astype(np.float32)


def read_hdr(path):
    """Radiance .hdr file -> float32 RGB (datasets.py:1153)."""
    import cv2

    with open(path, "rb") as h:
        buffer_ = np.frombuffer(h.read(), np.uint8)
    bgr = cv2.imdecode(buffer_, cv2.IMREAD_UNCHANGED)
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)


def downsample(img, factor):
    """Area-average downsample by an integer factor."""
    h, w = img.shape[:2]
    h2, w2 = h // factor, w // factor
    img = img[: h2 * factor, : w2 * factor]
    shape = (h2, factor, w2, factor) + img.shape[2:]
    return img.reshape(shape).mean(axis=(1, 3))


def get_img(factor, ext, fprefix, is_16bit=False):
    """Load `fprefix + ext` dispatching on extension (datasets.py:107-126)."""
    path = fprefix + ext
    if path.endswith(".exr"):
        image = load_exr(path)
    elif path.endswith(".h5"):
        image = read_h5(fprefix)
    elif path.endswith(".npy"):
        image = np.load(fprefix if fprefix.endswith(".npy") else path)
    else:
        image = load_img(path, is_16bit)
    if factor > 1:
        image = downsample(image, factor)
    return image


def get_imgs(data_dir, factor, use_tiffs, use_exrs, load_disps, load_normals,
             load_masks, load_albedos, nameprefix, split="train"):
    """Load an image + optional aux buffers for one frame (datasets.py:129-171)."""
    from neural_radiance_caching_tpu.ops import image as image_ops

    fprefix = os.path.join(data_dir, nameprefix)

    if use_tiffs:
        channels = [get_img(factor, f"_{ch}.tiff", fprefix) for ch in "RGBA"]
        image = image_ops.linear_to_srgb(np.stack(channels, axis=-1))
    elif use_exrs:
        image = get_img(factor, ".exr", fprefix)
    elif os.path.exists(fprefix + ".h5"):
        image = get_img(factor, ".h5", fprefix) / 255.0
    elif os.path.exists(fprefix + ".png"):
        image = get_img(factor, ".png", fprefix) / 255.0
    elif os.path.exists(fprefix + ".jpg"):
        image = get_img(factor, ".jpg", fprefix) / 255.0
    else:
        image = get_img(factor, "", fprefix) / 255.0

    mask_image = None
    if load_masks:
        maskprefix = os.path.join(
            "/".join(nameprefix.split("/")[:-2]), f"{split}_mask",
            nameprefix.split("/")[-1],
        )
        mask_image = get_img(factor, ".png", os.path.join(data_dir, maskprefix))
        mask_image = mask_image[..., None] / 255.0

    disp_image = None
    if load_disps:
        disp_image = get_img(factor, "_disp.tiff", fprefix, is_16bit=True)[..., :1]
        disp_image = disp_image / 65535.0

    normal_image = None
    if load_normals:
        normal_image = (
            get_img(factor, ".png", fprefix.replace("rgba", "normal"))[..., :3]
            * 2.0 / 255.0 - 1.0
        )

    albedo_image = None
    if load_albedos:
        albedo_image = get_img(factor, ".png", fprefix.replace("rgba", "albedo")) / 255.0

    return image, disp_image, normal_image, mask_image, albedo_image


def find_file(data_dir, frame) -> Optional[str]:
    """Find the extension for a frame's file_path (any of png/jpg/exr/h5)."""
    base = os.path.join(data_dir, frame["file_path"])
    root, ext = os.path.splitext(base)
    if ext and os.path.exists(base):
        return ext
    for try_ext in (".png", ".jpg", ".jpeg", ".exr", ".h5", ""):
        if os.path.exists(root + try_ext):
            return try_ext
    return None
