"""Learnable light samplers: vMF mixture fields and pulsed light sources.

Behavioral parity targets: reference internal/light_sampler.py (LightMLP) and
internal/material.py:99-630 (LightSourceMap). LightMLP predicts a von
Mises-Fisher mixture over incoming-light directions at each surface point
(used to importance-sample secondary rays); LightSourceMap is InvProp's
calibrated pulsed light: optimizable position offset/direction, angular
falloff MLP, learnable transient shift and dark level.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.models import shading
from neural_radiance_caching_tpu.ops import coord, math, render_utils
from neural_radiance_caching_tpu.utils import jaxutil


@gin.configurable
class LightMLP(shading.BaseShader):
    """vMF mixture light sampler over an NGP grid (light_sampler.py:63-235)."""

    config: Any = None

    num_components: int = 64
    vmf_scale: float = 20.0
    random_seed: int = 1

    vmf_bias: Any = None
    vmf_activation: Any = None
    normals_target: str = "normals_to_use"

    num_light_features: int = 64
    use_illumination_feature: bool = False
    multiple_illumination_outputs: bool = True

    def setup(self):
        dense = self._make_dense_layer_factory()
        if self.config.multi_illumination:
            self.light_vecs = nn.Embed(
                self.config.num_illuminations, self.num_light_features, name="light_vecs"
            )
            self.num_illumination_outputs = (
                self.config.num_illuminations
                if self.config.multiple_illumination_outputs
                else 1
            )
        else:
            self.num_illumination_outputs = 1

        self.layers = [dense(self.net_width) for _ in range(self.net_depth)]
        self.output_layer = dense(self.num_components * self.num_illumination_outputs * 5)
        self.grid = self._make_grid(name="light_grid")

    def get_light_vec(self, rays, feature):
        light_vec = jnp.zeros_like(feature[..., 0:0])
        if self.config.multi_illumination:
            light_idx = rays.light_idx[..., 0]
            light_vec = self.light_vecs(light_idx)
            light_vec = light_vec[..., None, :] * jnp.ones_like(feature[..., 0:1])
        return light_vec

    def get_vmfs(self, vmf_params):
        """Activations + random mean jitter (light_sampler.py:135-160)."""
        bias = self.vmf_bias or {"vmf_means": 0.0, "vmf_kappas": 1.0, "vmf_logits": 1.0}
        act = self.vmf_activation or {
            "vmf_means": lambda x: x,
            "vmf_kappas": lambda x: jnp.minimum(jax.nn.softplus(x), 50.0),
            "vmf_logits": lambda x: jnp.maximum(x, -50.0),
        }
        means_key, _ = jax.random.split(jax.random.PRNGKey(self.random_seed))
        means_random = (
            jax.random.normal(means_key, shape=vmf_params.shape[:-1] + (3,))
            * self.vmf_scale
            / 2.0
        )
        return {
            "vmf_means": act["vmf_means"](
                vmf_params[..., 0:3] * self.vmf_scale + bias["vmf_means"] + means_random
            ),
            "vmf_kappas": act["vmf_kappas"](vmf_params[..., 3:4] + bias["vmf_kappas"]),
            "vmf_logits": act["vmf_logits"](vmf_params[..., 4:5] + bias["vmf_logits"]),
        }

    @nn.compact
    def __call__(self, rng, rays, sampler_results, train_frac=1.0, train=True,
                 is_secondary=None, **kwargs):
        means = sampler_results["means"]
        key, rng = jaxutil.random_split(rng)
        pa_kwargs = self.get_predict_appearance_kwargs(key, rays, sampler_results)
        feature = self.predict_appearance_feature(sampler_results, train=train, **pa_kwargs)

        if self.config.multi_illumination and self.use_illumination_feature:
            feature = jnp.concatenate([feature, self.get_light_vec(rays, feature)], axis=-1)

        vmf_params = self.output_layer(feature)
        vmf_params = vmf_params.reshape(
            means.shape[:-1] + (self.num_illumination_outputs * self.num_components * 5,)
        )

        if self.config.multi_illumination and self.multiple_illumination_outputs:
            light_idx = rays.light_idx[..., None, :] * jnp.ones_like(
                feature[..., 0:1]
            ).astype(rays.light_idx.dtype)
            vmf_params = vmf_params.reshape(
                vmf_params.shape[:-1] + (self.num_illumination_outputs, -1)
            )
            vmf_params = jnp.take_along_axis(vmf_params, light_idx[..., None], axis=-2)[
                ..., 0, :
            ]

        vmf_params = vmf_params.reshape(vmf_params.shape[:-1] + (self.num_components, 5))
        vmfs = self.get_vmfs(vmf_params)

        # Means are stored relative to the query point (light_sampler.py:209-212).
        sg = jax.lax.stop_gradient
        vmfs["vmf_means"] = vmfs["vmf_means"] - sg(means[..., None, :])
        vmfs["vmf_origins"] = sg(means[..., None, :])
        vmfs["vmf_normals"] = sg(sampler_results[self.normals_target][..., None, :])
        vmfs["weights"] = sg(sampler_results["weights"][..., None, None])
        return vmfs


def _quaternion_to_matrix(quaternions):
    r, i, j, k = quaternions
    two_s = 2.0 / (quaternions * quaternions).sum(-1)
    o = jnp.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        -1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def eval_gaussian(quaternion, scale, mean, points):
    """Angular Gaussian light model (material.py:99-152)."""
    rot = _quaternion_to_matrix(quaternion)
    s = jnp.diag(scale[:3])
    diff = points - mean
    dist = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    diff = diff / (dist + 1e-5)
    exponent = ((rot @ s @ s.T @ rot.T @ diff.T) * diff.T).sum(0)
    return jnp.exp(-exponent)


@gin.configurable
class LightSourceMap(nn.Module):
    """InvProp learnable pulsed light source (material.py:154-630)."""

    config: Any = None

    global_light_source: bool = True
    relative_to_camera: bool = True
    use_gaussian: bool = False
    gaussian_scale: float = 1.0

    use_light_source_dir: bool = True
    use_light_source_norm: bool = False
    use_network: bool = True

    optimize_light_position: bool = False
    optimize_transient_shift: bool = False
    optimize_dark_level: bool = False
    optimize_gaussian: bool = False

    deg_points: int = 2
    net_depth: int = 2
    net_width: int = 64
    skip_layer: int = 4
    net_activation: Callable[..., Any] = nn.relu

    orthogonal_scale: float = 0.01
    right_scale: float = 0.01
    look_scale: float = 1.0

    light_power_bias: float = 1.0
    light_power_activation: Callable[..., Any] = math.safe_exp
    light_max_angle: float = 0.0

    def setup(self):
        self.pos_enc_fn = lambda d: coord.pos_enc(d, 0, self.deg_points, True)
        dense = functools.partial(nn.Dense, kernel_init=jax.nn.initializers.he_uniform())
        self.layers = [dense(self.net_width, name=f"layer_mult_{i}") for i in range(self.net_depth)]
        self.output_layer = dense(1, name="output_layer_mult")

        self.light_source_position = jnp.array(self.config.light_source_position or (0.0,) * 3)
        zeros_init = lambda key, shape: jnp.zeros(shape)
        self.light_source_offset = self.param("light_source_offset", zeros_init, (3,))
        self.transient_shift_offset = self.param("transient_shift_offset", zeros_init, (1,))
        self.dark_level_offset = self.param("dark_level_offset", zeros_init, (1,))
        self.light_power = self.param(
            "light_power", lambda key, shape: jnp.full(shape, self.light_power_bias), (1,)
        )
        self.light_source_direction = self.param("light_source_direction", zeros_init, (3,))

        default_quat = jnp.array([51.7835, -49.8733, 6.9429, 5.4460])
        default_scale = jnp.array([4.5999e00, 2.5764e-05, -4.2560e00])
        if self.optimize_gaussian:
            self.quaternion = self.param("quaternion", lambda *_: default_quat, (4,))
            self.scale = self.param("scale", lambda *_: default_scale, (3,))
        else:
            self.quaternion = default_quat
            self.scale = default_scale

    # --- calibration getters (material.py:261-288) ---

    def get_dark_level(self):
        if self.optimize_dark_level:
            return jnp.abs(self.dark_level_offset[0] * self.config.dark_level_multiplier)
        return 0.0

    def get_transient_shift(self):
        if self.optimize_transient_shift:
            return (
                self.transient_shift_offset[0] * self.config.transient_shift_multiplier
                + self.config.transient_shift
            )
        return self.config.transient_shift

    def get_light_source_offset(self):
        if self.optimize_light_position:
            return self.light_source_offset[None] * self.config.light_pos_multiplier
        return jnp.zeros_like(self.light_source_offset[None])

    def get_lights(self, lights, look, up):
        sh = lights.shape
        lights = lights.reshape(-1, 3)
        look = jax.lax.stop_gradient(look.reshape(-1, 3))
        up = jax.lax.stop_gradient(up.reshape(-1, 3))
        right = jnp.cross(up, look)
        if self.global_light_source:
            lights = self.get_light_source_offset() + lights
        else:
            o = self.get_light_source_offset()
            lights = o[..., 0:1] * right + o[..., 1:2] * up + o[..., 2:3] * look + lights
        return lights.reshape(sh)

    def get_lights_opencv(self, lights, look, up, origins):
        right = jnp.cross(up, look)
        return jnp.concatenate(
            [
                -math.dot(lights - origins, right),
                -math.dot(lights - origins, up),
                math.dot(lights - origins, look),
            ],
            axis=-1,
        )

    def get_light_source_look(self, lights, look, up):
        sh = lights.shape
        lights = lights.reshape(-1, 3)
        look = jax.lax.stop_gradient(look.reshape(-1, 3))
        up = jax.lax.stop_gradient(up.reshape(-1, 3))
        right = jnp.cross(up, look)
        if self.global_light_source:
            light_source_look = (
                self.light_source_direction[None] * self.orthogonal_scale
                - self.light_source_position[None] * self.look_scale
            ) * jnp.ones_like(up)
        else:
            v = jnp.concatenate(
                [
                    self.light_source_direction[None][..., :2] * self.orthogonal_scale,
                    jnp.ones_like(self.light_source_direction[None][..., :1])
                    * self.look_scale,
                ],
                axis=-1,
            )
            light_source_look = right * v[..., 0:1] + up * v[..., 1:2] + look * v[..., 2:3]
        return light_source_look.reshape(sh)

    def run_network(self, x):
        inputs = x
        for i in range(self.net_depth):
            x = self.net_activation(self.layers[i](x))
        if i % self.skip_layer == 0 and i > 0:
            x = jnp.concatenate([x, inputs], axis=-1)
        return x

    def _angular_mult(self, points, lights, look, up):
        """Angular falloff multiplier in (0, 2) (material.py:387-437)."""
        if self.use_light_source_dir:
            ls_look = self.get_light_source_look(lights, look, up)
            ls_right = jnp.cross(up, ls_look)
            p = points / (jnp.linalg.norm(points, axis=-1, keepdims=True) + 1e-5)
            net_input = jnp.concatenate(
                [
                    jnp.abs(math.dot(p, ls_look)),
                    jnp.abs(math.dot(p, ls_right)) * self.right_scale,
                ],
                axis=-1,
            )
        elif self.use_light_source_norm:
            net_input = points / (jnp.linalg.norm(points, axis=-1, keepdims=True) + 1e-5)
        else:
            net_input = points
        if self.use_network:
            x = self.run_network(self.pos_enc_fn(net_input))
            return nn.sigmoid(self.output_layer(x)) * 2.0
        return jnp.ones_like(net_input[..., :1])

    @nn.compact
    def __call__(self, points, viewdirs, lights, look, up, origins, **kwargs):
        sh = points.shape
        sg = jax.lax.stop_gradient
        points = sg(points.reshape(-1, 3))
        viewdirs = sg(viewdirs.reshape(-1, 3))
        lights = sg(lights.reshape(-1, 3))
        look = sg(look.reshape(-1, 3))
        up = sg(up.reshape(-1, 3))
        origins = sg(origins.reshape(-1, 3))

        lights = self.get_lights(lights, look, up)

        if self.config.sl_relight:
            light_radiance_mult = jnp.ones_like(up[..., :1])
        elif self.use_gaussian:
            local_points = jnp.concatenate(
                [
                    -math.dot(points - origins, jnp.cross(up, look)),
                    -math.dot(points - origins, up),
                    math.dot(points - origins, look),
                ],
                axis=-1,
            )
            local_lights = self.get_lights_opencv(lights, look, up, origins)
            light_radiance_mult = (
                eval_gaussian(self.quaternion, self.scale, local_lights, local_points)[
                    ..., None
                ]
                * self.gaussian_scale
            )
        elif self.relative_to_camera:
            light_radiance_mult = self._angular_mult(points - origins, lights, look, up)
        else:
            light_radiance_mult = self._angular_mult(points - lights, lights, look, up)

        light_radiance_mult = light_radiance_mult.reshape(sh[:-1] + (1,))
        light_radiance = light_radiance_mult * self.light_power_activation(self.light_power)

        light_offset = lights - points
        light_dists = jnp.linalg.norm(light_offset, axis=-1, keepdims=True)
        light_dirs = light_offset / jnp.maximum(light_dists, 1e-5)

        if self.config.use_falloff:
            falloff = 1.0 / jnp.maximum(light_dists.reshape(sh[:-1] + (1,)) ** 2, 1e-5)
            light_radiance = falloff * light_radiance

        if self.light_max_angle > 0.0:
            angle_dot = math.dot(-light_dirs, look, keepdims=True)
            angle = jnp.arccos(angle_dot)
            cutoff = (
                ((angle * 180.0 / jnp.pi) > (self.light_max_angle / 2.0)) | (angle_dot < 0)
            ).reshape(sh[:-1] + (1,))
            light_radiance = jnp.where(cutoff, 0.0, light_radiance)

        return light_radiance, light_radiance_mult
