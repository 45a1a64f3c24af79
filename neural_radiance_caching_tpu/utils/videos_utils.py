"""Assemble rendered frame directories into videos.

Behavioral parity target: reference internal/videos_utils.py create_videos —
walks the trainer's save_dir buffer folders (color, color_cache, depth_mean,
normals, acc, material_albedo, ...) and encodes each into an mp4 with ffmpeg
(or a gif via PIL when ffmpeg is unavailable).
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
from typing import Optional, Sequence

DEFAULT_BUFFERS = (
    "color", "color_cache", "depth_mean", "depth_median", "acc", "normals",
    "normals_pred", "material_albedo", "material_roughness",
    "material_diffuse_color", "material_specular_color",
)


def _frames(folder: str):
    return sorted(glob.glob(os.path.join(folder, "*.png")))


def create_video_from_frames(folder: str, out_path: str, fps: int = 30) -> bool:
    """Encode folder/*.png into out_path (mp4 via ffmpeg, else gif)."""
    frames = _frames(folder)
    if not frames:
        return False
    if shutil.which("ffmpeg"):
        cmd = [
            "ffmpeg", "-y", "-framerate", str(fps), "-pattern_type", "glob",
            "-i", os.path.join(folder, "*.png"),
            "-c:v", "libx264", "-pix_fmt", "yuv420p",
            "-vf", "pad=ceil(iw/2)*2:ceil(ih/2)*2",
            out_path,
        ]
        return subprocess.call(
            cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
        ) == 0
    # Fallback: animated gif via PIL.
    from PIL import Image

    imgs = [Image.open(f) for f in frames]
    gif_path = os.path.splitext(out_path)[0] + ".gif"
    imgs[0].save(
        gif_path, save_all=True, append_images=imgs[1:],
        duration=int(1000 / fps), loop=0,
    )
    return True


def transient_video_frames(transient, background=True, scale_direct=2.0,
                           scale_background=4.0, background_image=None):
    """Tone-map an [H, W, T, C>=3] transient into T uint8 video frames.

    Behavioral parity target: reference scripts/transient_utils_no_torch.py
    save_video_from_h5 (:123-158): per-bin frame = bin/scale_direct
    (+ time-integrated image/scale_background when background is on),
    gamma 1/2.2, clipped to [0, 1]. Returns [T, H, W, 3] uint8 (RGB —
    the cv2 BGR swap there is a codec detail, not content).
    """
    import numpy as np

    data = np.asarray(transient)[..., :3].astype(np.float32)
    bkg = (np.asarray(background_image, np.float32)[..., :3]
           if background_image is not None else data.sum(-2))
    frames = data / scale_direct
    if background:
        frames = frames + (bkg / scale_background)[:, :, None]
    frames = np.clip(frames, 0.0, None) ** (1.0 / 2.2)
    frames = np.clip(frames, 0.0, 1.0)
    return (np.moveaxis(frames, 2, 0) * 255).astype(np.uint8)


def create_video_from_transient(transient, out_path: str, fps: int = 30,
                                **frame_kwargs) -> bool:
    """Encode a light-in-flight video from a transient volume (mp4 via
    imageio/ffmpeg when available, else gif)."""
    frames = transient_video_frames(transient, **frame_kwargs)
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(out_path, list(frames), fps=fps)
        return True
    except Exception:
        from PIL import Image

        gif_path = os.path.splitext(out_path)[0] + ".gif"
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(gif_path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
        return True


def create_videos(save_dir: str, out_dir: Optional[str] = None, fps: int = 30,
                  buffers: Sequence[str] = DEFAULT_BUFFERS):
    """Encode every known buffer folder under save_dir (videos_utils.py:44)."""
    out_dir = out_dir or os.path.join(save_dir, "videos")
    os.makedirs(out_dir, exist_ok=True)
    made = []
    for name in buffers:
        folder = os.path.join(save_dir, name)
        if not os.path.isdir(folder):
            continue
        out_path = os.path.join(out_dir, f"{name}.mp4")
        if create_video_from_frames(folder, out_path, fps=fps):
            made.append(out_path)
    return made
