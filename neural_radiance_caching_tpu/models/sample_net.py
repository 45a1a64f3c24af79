"""Learned sample-offset network.

Behavioral parity target: reference internal/sample_net_utils.py
(SampleNetwork :61-229, pluecker :232, intersect_sphere :243-270): a small
MLP that, given proposal sample points along a ray, predicts an eased
per-sample distance offset and 3D point offset (both gated by learned
sigmas) used by the ProposalVolumeSampler's `use_sample_network` path to
refine sample placement.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.ops import coord
from neural_radiance_caching_tpu.ops import math as math_utils


def ease_activation(window_frac, act, val=1.0):
    """Linearly ease the activation's output toward `val` over window_frac."""

    def new_act(train_frac, x):
        if not window_frac:
            return act(x)
        w = jnp.clip(train_frac / window_frac, 0.0, 1.0)
        return act(x) * w + val * (1.0 - w)

    return new_act


def pluecker(origins, directions):
    """Pluecker ray coordinates [direction, moment]."""
    directions = math_utils.normalize(directions)
    moment = jnp.cross(origins, directions, axis=-1)
    return jnp.concatenate([directions, moment], axis=-1)


def intersect_sphere(origins, directions, radius):
    """Both parametric intersections of rays with a centered sphere."""
    o, d = origins, directions
    a = (d * d).sum(-1)
    b = 2 * (o * d).sum(-1)
    c = (o * o).sum(-1) - radius * radius
    disc = jnp.maximum(b * b - 4 * a * c, 0.0)
    sq = jnp.sqrt(disc + 1e-8)
    t1 = jnp.where(disc <= 0, 0.0, (-b + sq) / (2 * a))
    t2 = jnp.where(disc <= 0, 0.0, (-b - sq) / (2 * a))
    return t1, t2


@gin.configurable
class SampleNetwork(nn.Module):
    """Predicts eased distance/point offsets for proposal samples
    (sample_net_utils.py:61-229)."""

    config: Any = None
    aabb: Tuple[float, float, float, float, float, float] = (
        -1.0, -1.0, -1.0, 1.0, 1.0, 1.0,
    )
    window_frac: float = 0
    num_views: int = 1
    use_viewdirs: bool = True
    use_time: bool = False
    mlp_width: int = 256
    mlp_depth: int = 4
    contract_fn: Callable[..., Any] = lambda x: x
    inv_contract_fn: Callable[..., Any] = lambda x: x

    def _aabb(self):
        bounds = jnp.array(self.aabb)
        return bounds[:3], bounds[3:]

    def normalize_inputs(self, points, origins, viewdirs):
        aabb_min, aabb_max = self._aabb()
        points = (points - aabb_min) / (aabb_max - aabb_min) * 4.0 - 2.0
        origins = (origins - aabb_min) / (aabb_max - aabb_min) * 4.0 - 2.0
        rays_norm = jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
        viewdirs = math_utils.normalize(viewdirs / (aabb_max - aabb_min)) * rays_norm
        return points, origins, viewdirs

    def unnormalize_points(self, points):
        aabb_min, aabb_max = self._aabb()
        return (points / 4.0 + 0.5) * (aabb_max - aabb_min) + aabb_min

    def get_network_input(self, points, viewdirs, times):
        net_input = coord.pos_enc(points, 0, 4, True)
        if self.use_viewdirs:
            net_input = jnp.concatenate(
                [net_input, coord.pos_enc(viewdirs, 0, 2, True)], axis=-1
            )
        if self.use_time:
            net_input = jnp.concatenate(
                [net_input, coord.pos_enc(times, 0, 6, True)], axis=-1
            )
        return jax.lax.stop_gradient(net_input)

    @nn.compact
    def __call__(self, train_frac, points_uncontract, origins_uncontract,
                 viewdirs, t_idx):
        outputs = {"z_vals": 1, "point_offset": 3, "sigma": 1, "point_sigma": 1}
        activations = [
            lambda tf, x: jax.nn.tanh(x * 0.25) * 0.125,
            lambda tf, x: jax.nn.tanh(x * 1.0) * 0.25,
            ease_activation(self.window_frac, lambda x: jax.nn.sigmoid(x + 3.0), 1.0),
            ease_activation(self.window_frac, lambda x: jax.nn.sigmoid(x + 3.0), 1.0),
        ]
        names = list(outputs)
        shapes = [outputs[k] for k in names]
        slices = [sum(shapes[:k]) for k in range(len(shapes))][1:]

        dense = functools.partial(
            nn.Dense, kernel_init=jax.nn.initializers.he_uniform()
        )
        times = (t_idx / self.num_views) * 2 - 1

        points_original = points_uncontract
        points_n, origins_n, viewdirs_n = self.normalize_inputs(
            points_uncontract, origins_uncontract, viewdirs
        )
        shape = points_n.shape
        points_n = points_n.reshape(-1, 3)
        origins_n = origins_n.reshape(-1, 3)
        viewdirs_n = viewdirs_n.reshape(-1, 3)
        times = jnp.broadcast_to(
            jnp.asarray(times, jnp.float32).reshape(-1)[..., None],
            points_n.shape[:1] + (1,),
        ) if self.use_time else jnp.zeros_like(points_n[..., :1])

        rays_norm = jnp.linalg.norm(viewdirs_n, axis=-1, keepdims=True)
        dists_uncontract = (
            jnp.linalg.norm(points_n - origins_n, axis=-1, keepdims=True)
            / jnp.maximum(rays_norm, 1e-12)
        )
        dists_contract = self.contract_fn(dists_uncontract)
        points_contract = self.contract_fn(points_n)
        points_contract_original = points_contract

        x = self.get_network_input(points_contract, viewdirs_n, times)
        for i in range(self.mlp_depth):
            x = nn.relu(dense(self.mlp_width, name=f"layer_{i}")(x))
        x = dense(sum(shapes), name="output_layer")(x)

        out = {}
        for name, act, part in zip(names, activations, jnp.split(x, slices, -1)):
            out[name] = act(train_frac, part)

        # Eased distance offset along the ray, then an eased 3D point offset.
        dist_offset = out["z_vals"] * (1.0 - out["sigma"])
        new_dists = self.inv_contract_fn(dists_contract + dist_offset)
        new_points = origins_n + viewdirs_n * new_dists
        new_points_contract = self.contract_fn(new_points) + out["point_offset"] * (
            1.0 - out["point_sigma"]
        )
        new_points = self.unnormalize_points(
            self.inv_contract_fn(new_points_contract)
        ).reshape(shape)

        return dict(
            point_offset=points_original - new_points,
            point_offset_contract=(
                points_contract_original - new_points_contract
            ).reshape(shape),
        )
