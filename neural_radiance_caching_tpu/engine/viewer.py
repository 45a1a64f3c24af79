"""Interactive viewer (reference engine/viewer.py parity).

The reference viewer streams renders to a browser via `viser`. viser is not
installed in this environment (zero egress), so the Viewer degrades
gracefully: construction works, `setup` raises a clear error when viser is
absent, and the jitted ray-cast + render helpers it is built from
(`cast_view_rays`, `make_render_fn`) are importable and tested without it —
they are the same functions a viser session drives.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.data import camera_utils
from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.utils import pytrees


def cast_view_rays(pose, h, w, focal, near, far, rng=None, xnp=jnp):
    """Rays for a free camera pose (viewer.py cast_fn parity)."""
    pix_x, pix_y = camera_utils.pixel_coordinates(w, h, xnp=np)
    pixels = pytrees.Pixels(
        pix_x_int=pix_x.reshape(-1),
        pix_y_int=pix_y.reshape(-1),
        lossmult=np.ones((h * w, 1), np.float32),
        near=np.full((h * w, 1), near, np.float32),
        far=np.full((h * w, 1), far, np.float32),
        cam_idx=np.zeros((h * w, 1), np.int32),
        light_idx=np.zeros((h * w, 1), np.int32),
    )
    pixtocam = camera_utils.get_pixtocam(focal, w, h)[None]
    cams = (pixtocam, np.asarray(pose, np.float32)[None, :3, :4], None, None)
    lights = np.asarray(pose, np.float32)[None, :3, -1]
    return camera_utils.cast_ray_batch(cams, lights, pixels, xnp=np)


def make_render_fn(model, variables, config, train_frac=1.0):
    """Jitted free-view render over all passes (viewer.py render_rays)."""

    def render_rays(rng, rays):
        out = model.apply(
            variables,
            rng,
            rays,
            train_frac=train_frac,
            train=False,
            compute_extras=True,
            passes=("cache", "light", "material"),
        )
        return out["render"]

    return jax.jit(render_rays)


@gin.configurable
@dataclasses.dataclass
class Viewer:
    """Browser viewer over a live Trainer (requires viser)."""

    render_every: int = 10
    port: int = 8082
    scene_scale_ratio: float = 10.0

    def setup(self, trainer):
        try:
            import viser  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "The interactive viewer requires the `viser` package, which "
                "is not installed in this environment. Headless rendering is "
                "available via engine.viewer.make_render_fn / the trainer's "
                "vis-only mode."
            ) from e
        self.trainer = trainer
        self.server = viser.ViserServer(port=self.port)
        self.render_fn = make_render_fn(
            trainer.model, trainer.state.params, trainer.config
        )
        self.server.on_client_connect(self._handle_new_client)

    def _handle_new_client(self, client):
        @client.camera.on_update
        def _(_):
            pose = np.array(client.camera.wxyz_position_matrix)
            h = w = 128
            rays = cast_view_rays(
                pose, h, w, focal=1.2 * w, near=self.trainer.config.near,
                far=self.trainer.config.far,
            )
            out = self.render_fn(jax.random.PRNGKey(0), rays)
            rgb = np.asarray(out["rgb"]).reshape(h, w, 3)
            client.set_background_image(np.clip(rgb, 0, 1))
