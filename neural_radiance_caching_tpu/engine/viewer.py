"""Interactive viewer (reference engine/viewer.py parity).

The reference viewer streams renders to a browser via `viser`. When viser
is installed, `Viewer.setup` drives it the same way the reference does.
When it is not (this environment has zero egress), setup falls back to a
dependency-free stdlib HTTP viewer (`HttpViewer`): an orbit-controls page
served from `http.server`, rendering frames through the same jitted
ray-cast + render helpers (`cast_view_rays`, `make_render_fn`) a viser
session would use.
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


def make_render_fn(model, variables, config, train_frac=1.0, fast=False):
    """Jitted free-view render over all passes (viewer.py render_rays).

    fast=True compiles the interactive-preview program: cache pass only,
    no extras AOVs — the viewer only reads `rgb`, so the material secondary
    fan-out and the extras buffers are pure latency for orbiting."""
    passes = ("cache",) if fast else ("cache", "light", "material")

    def render_rays(rng, rays):
        out = model.apply(
            variables,
            rng,
            rays,
            train_frac=train_frac,
            train=False,
            compute_extras=not fast,
            passes=passes,
        )
        return out["render"]

    return jax.jit(render_rays)


def orbit_pose(azimuth_deg, elevation_deg, radius, up=(0.0, 0.0, 1.0)):
    """Camera-to-world for a camera orbiting the origin, looking at it."""
    az = np.radians(azimuth_deg)
    el = np.radians(elevation_deg)
    eye = radius * np.array(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)],
        np.float32,
    )
    forward = -eye / np.linalg.norm(eye)
    up = np.asarray(up, np.float32)
    right = np.cross(forward, up)
    right = right / max(np.linalg.norm(right), 1e-8)
    down = np.cross(forward, right)
    pose = np.eye(4, dtype=np.float32)
    # OpenCV-style camera frame: +x right, +y down, +z forward.
    pose[:3, 0] = right
    pose[:3, 1] = down
    pose[:3, 2] = forward
    pose[:3, 3] = eye
    return pose


_VIEWER_PAGE = """<!doctype html><html><head><title>radiance-cache viewer</title>
<style>body{margin:0;background:#111;color:#ddd;font:13px sans-serif}
#c{display:block;margin:12px auto;cursor:grab;image-rendering:pixelated}
#hud{position:fixed;top:8px;left:10px}</style></head><body>
<div id="hud">drag = orbit &middot; wheel = zoom</div>
<img id="c" width=512 height=512>
<script>
let az=30, el=20, r=4.0, busy=false, dirty=true;
const img=document.getElementById('c');
function tick(){
  if(dirty && !busy){
    busy=true; dirty=false;
    const u=`/render?az=${az.toFixed(1)}&el=${el.toFixed(1)}&r=${r.toFixed(2)}`;
    const probe=new Image();
    probe.onload=()=>{img.src=probe.src; busy=false;};
    probe.onerror=()=>{busy=false;};
    probe.src=u;
  }
  requestAnimationFrame(tick);
}
let drag=null;
img.onmousedown=e=>{drag=[e.clientX,e.clientY];};
window.onmouseup=()=>{drag=null;};
window.onmousemove=e=>{
  if(!drag) return;
  az-=(e.clientX-drag[0])*0.5; el+=(e.clientY-drag[1])*0.5;
  el=Math.max(-85,Math.min(85,el)); drag=[e.clientX,e.clientY]; dirty=true;
};
img.onwheel=e=>{e.preventDefault(); r*=Math.exp(e.deltaY*0.001); dirty=true;};
tick();
</script></body></html>"""


class HttpViewer:
    """Zero-dependency browser viewer: stdlib HTTP server + orbit controls.

    Serves an interactive page at `/` and renders PNG frames at `/render`
    through the same jitted helpers the viser path uses. Runs in a daemon
    thread so training continues; renders interleave with train steps on
    the device (same contention model as the reference's viser viewer).
    """

    def __init__(self, trainer, port=8082, resolution=128, fast=True):
        self.trainer = trainer
        self.port = port
        self.resolution = resolution
        # Interactive default: the cache-only, no-extras program (the page
        # only shows rgb). fast=False restores the full material render.
        self.render_fn = make_render_fn(
            trainer.model, trainer.state.params, trainer.config, fast=fast
        )

    def _render_png(self, az, el, radius):
        import io

        import imageio.v2 as imageio

        h = w = self.resolution
        trainer = self.trainer
        pose = orbit_pose(az, el, radius)
        rays = cast_view_rays(
            pose, h, w, focal=1.2 * w,
            near=trainer.config.near, far=trainer.config.far,
        )
        out = self.render_fn(jax.random.PRNGKey(0), rays)
        rgb = np.clip(np.asarray(out["rgb"], np.float32).reshape(h, w, 3), 0, 1)
        buf = io.BytesIO()
        imageio.imwrite(buf, (rgb * 255).astype(np.uint8), format="png")
        return buf.getvalue()

    def serve_forever(self, background=True):
        import http.server
        import threading
        import urllib.parse

        viewer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                if parsed.path == "/render":
                    q = urllib.parse.parse_qs(parsed.query)
                    get = lambda k, d: float(q.get(k, [d])[0])
                    png = viewer._render_png(
                        get("az", 30.0), get("el", 20.0), get("r", 4.0)
                    )
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(png)))
                    self.end_headers()
                    self.wfile.write(png)
                    return
                body = _VIEWER_PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.server = http.server.ThreadingHTTPServer(("", self.port), Handler)
        if background:
            threading.Thread(
                target=self.server.serve_forever, daemon=True
            ).start()
            print(f"HttpViewer serving on http://localhost:{self.port}")
        else:
            self.server.serve_forever()


@gin.configurable
@dataclasses.dataclass
class Viewer:
    """Browser viewer over a live Trainer (viser when available, stdlib
    HTTP fallback otherwise)."""

    render_every: int = 10
    port: int = 8082
    scene_scale_ratio: float = 10.0

    def setup(self, trainer):
        try:
            import viser  # noqa: F401
        except ImportError:
            self.trainer = trainer
            self.http_viewer = HttpViewer(trainer, port=self.port)
            self.http_viewer.serve_forever(background=True)
            return
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
