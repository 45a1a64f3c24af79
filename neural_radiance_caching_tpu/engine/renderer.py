"""Chunked whole-image eval rendering.

Behavioral parity target: reference internal/models.py render_image
(:2361-2440) + trainer render loops (engine/trainer.py:812-1100): rays are
rendered in render_chunk_size chunks, optionally averaged over
`render_repeats` independent noise draws (Welford running mean), and stitched
back to [H, W, ...] numpy images on the host.

TPU-first deltas: each chunk is one jitted sharded call over the data mesh
(no pmap host reshapes); chunks are padded to the chunk size so the renderer
compiles exactly once.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from neural_radiance_caching_tpu.utils import pytrees


def _pad_rows(x, n):
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad, mode="edge")


def render_image(
    render_fn: Callable,
    variables: Any,
    rays: pytrees.Rays,
    rng,
    config,
    height: Optional[int] = None,
    width: Optional[int] = None,
    train_frac: float = 1.0,
    render_repeats: int = 1,
    keys=None,
) -> Dict[str, np.ndarray]:
    """Render all `rays` (flat [N, ...]) and return host numpy buffers.

    Args:
      render_fn: jitted (params, rng, train_frac, rays) -> render dict.
      keys: optional list of output keys to keep (default: all arrays).
    Returns dict of [H, W, ...] arrays if height/width given, else [N, ...].
    """
    num_rays = rays.origins.shape[0]
    chunk = config.render_chunk_size
    # One compiled program: every chunk is padded to `chunk` rows.
    accum: Dict[str, np.ndarray] = {}

    starts = list(range(0, num_rays, chunk))

    def _dispatch(count):
        """Queue all repeats of one chunk on the device (async dispatch);
        drop unwanted keys BEFORE any host fetch so they are never
        transferred."""
        start = starts[count]
        stop = min(start + chunk, num_rays)
        # rays.impulse_response is a GLOBAL 1-D sensor kernel, not a per-ray
        # leaf: slicing/padding it to the chunk size would hand the
        # transient convolution a chunk-length "kernel".
        kernel = rays.impulse_response
        per_ray = (
            rays.replace(impulse_response=None) if kernel is not None else rays
        )
        chunk_rays = jax.tree_util.tree_map(
            lambda x: _pad_rows(np.asarray(x[start:stop]), chunk), per_ray
        )
        if kernel is not None:
            chunk_rays = chunk_rays.replace(impulse_response=np.asarray(kernel))
        outs = []
        for rep in range(render_repeats):
            rep_rng = jax.random.fold_in(rng, count * 131 + rep)
            out = render_fn(variables, rep_rng, train_frac, chunk_rays)
            if keys is not None:
                out = {k: v for k, v in out.items() if k in keys}
            outs.append(out)
        return stop - start, outs

    # One-ahead pipeline: while the host fetches + Welford-accumulates chunk
    # k, the device already works on chunk k+1 (JAX dispatch is async; the
    # blocking point is the device_get below).
    pending = _dispatch(0) if starts else None
    for count in range(len(starts)):
        rows, rep_outs = pending
        pending = _dispatch(count + 1) if count + 1 < len(starts) else None
        mean_out: Dict[str, np.ndarray] = {}
        m2_out: Dict[str, np.ndarray] = {}
        for rep, out in enumerate(rep_outs):
            out = jax.device_get(out)
            for k, v in out.items():
                if v is None or not hasattr(v, "shape") or v.ndim == 0:
                    continue
                if v.shape[0] != chunk:
                    continue
                v = np.nan_to_num(np.asarray(v, np.float32)[:rows])
                if k in mean_out:
                    # Welford running mean/M2 over repeats
                    # (reference models.py:2443-2521).
                    delta = v - mean_out[k]
                    mean_out[k] += delta / (rep + 1)
                    if k == "rgb":
                        m2_out[k] += delta * (v - mean_out[k])
                else:
                    mean_out[k] = v
                    if k == "rgb":
                        m2_out[k] = np.zeros_like(v)
        for k, v in mean_out.items():
            accum.setdefault(k, []).append(v)
        if getattr(config, "debug_mode", False):
            # Per-chunk device memory watermark (reference
            # utils.log_memory_usage, models.py:2415).
            stats = jax.devices()[0].memory_stats() or {}
            used = stats.get("bytes_in_use", 0) / 2**30
            print(f"render chunk {count}: {used:.2f} GiB in use", flush=True)
        if render_repeats > 1 and "rgb" in m2_out:
            accum.setdefault("rgb_variance", []).append(
                m2_out["rgb"] / max(render_repeats - 1, 1)
            )

    images = {k: np.concatenate(v, axis=0) for k, v in accum.items()}
    if height is not None and width is not None:
        images = {
            k: v.reshape((height, width) + v.shape[1:]) for k, v in images.items()
        }
    return images
