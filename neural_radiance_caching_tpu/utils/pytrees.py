"""Core pytree dataclasses shared across the framework.

Field surface mirrors the reference's public data structures so that loaders,
models, and losses compose the same way (reference internal/utils.py:126-288),
but the implementations here are fresh and TPU-oriented: every field is either
an array with a static leading batch shape or None, so the whole structure can
be donated to a jitted step and sharded along the batch axis with a
NamedSharding.
"""

from __future__ import annotations

from typing import Optional, Union

import flax
import jax
import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jnp.ndarray]


@flax.struct.dataclass
class Pixels:
    """Integer pixel coordinates plus per-ray metadata (pre ray-casting)."""

    pix_x_int: Array
    pix_y_int: Array
    lossmult: Array
    near: Array
    far: Array
    cam_idx: Array
    light_idx: Array
    exposure_idx: Optional[Array] = None
    exposure_values: Optional[Array] = None
    device_idx: Optional[Array] = None


@flax.struct.dataclass
class Rays:
    """A batch of rays; all arrays share leading batch dims.

    Matches the reference's ray fields (internal/utils.py:142-169): `origins/
    directions/viewdirs/radii` drive sampling, `lights` is the active light
    position, `look/up/cam_origins` define the camera frame (used by secondary
    ray filters), `vcam_*` a virtual camera frame, `near/far` the sampling
    interval, `cam_idx/light_idx` integer indices, `lossmult` a per-ray loss
    weight, and `impulse_response` the per-ray temporal PSF for transients.
    """

    origins: Array
    directions: Array
    viewdirs: Array
    radii: Array
    lights: Array
    imageplane: Array
    look: Array
    up: Array
    cam_origins: Array
    vcam_look: Array
    vcam_up: Array
    vcam_origins: Array
    lossmult: Array
    near: Array
    far: Array
    cam_idx: Array
    light_idx: Array
    normals: Optional[Array] = None
    pix_x_int: Optional[Array] = None
    pix_y_int: Optional[Array] = None
    exposure_idx: Optional[Array] = None
    exposure_values: Optional[Array] = None
    device_idx: Optional[Array] = None
    impulse_response: Optional[Array] = None


@flax.struct.dataclass
class Batch:
    """One training/eval batch: rays plus supervision targets."""

    rays: Union[Pixels, Rays]
    rgb: Optional[Array] = None
    semantic: Optional[Array] = None
    disps: Optional[Array] = None
    normals: Optional[Array] = None
    albedos: Optional[Array] = None
    depth: Optional[Array] = None
    alphas: Optional[Array] = None
    masks: Optional[Array] = None
    impulse_response: Optional[Array] = None


def random_rays(
    key: jax.Array,
    n: int,
    origin_range=(-1.5, 1.5),
    radius_range=(1e-5, 1e-3),
    near_range=(0.0, 1.0),
    far_range=(10.0, 10000.0),
) -> Rays:
    """Random rays for model init / shape checks (cf. utils.py:172-249)."""
    ks = jax.random.split(key, 5)
    origins = jax.random.uniform(ks[0], (n, 3), minval=origin_range[0], maxval=origin_range[1])
    d = jax.random.normal(ks[1], (n, 3))
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    radii = jax.random.uniform(ks[2], (n, 1), minval=radius_range[0], maxval=radius_range[1])
    near = jax.random.uniform(ks[3], (n, 1), minval=near_range[0], maxval=near_range[1])
    far = jax.random.uniform(ks[4], (n, 1), minval=far_range[0], maxval=far_range[1])
    z3 = jnp.zeros((n, 3))
    return Rays(
        origins=origins,
        directions=d,
        viewdirs=d,
        radii=radii,
        lights=origins,
        imageplane=jnp.zeros((n, 2)),
        look=z3,
        up=z3,
        cam_origins=origins,
        vcam_look=z3,
        vcam_up=z3,
        vcam_origins=origins,
        lossmult=jnp.ones((n, 1)),
        near=near,
        far=far,
        cam_idx=jnp.zeros((n, 1), jnp.int32),
        light_idx=jnp.zeros((n, 1), jnp.int32),
        pix_x_int=jnp.zeros((n,), jnp.int32),
        pix_y_int=jnp.zeros((n,), jnp.int32),
    )


def dummy_rays(n: int = 10) -> Rays:
    """Tiny ray batch used to initialize model parameters."""
    return random_rays(jax.random.PRNGKey(0), n)
