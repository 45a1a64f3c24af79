"""Surface light field / environment map MLPs.

Behavioral parity target: the reference's surface-light-field module
(internal/surface_light_field.py) — same gin field surface, same flax
parameter names, same outputs. A SurfaceLightFieldMLP answers "what radiance
arrives at point o from direction d" without marching the full volume: a
zeros-initialized head proposes a few distances along the query ray, an NGP
"reflectance grid" is tapped at those 3D points, and a view-conditioned MLP
(IDE-encoded for roughness-aware prefiltering) decodes RGB + alpha. Used as
the cache's indirect/ambient specular source, the env map, and the material
stage's control variate.

Internally the computation is organized TPU-first around three phases —
head decode (`_decode_head_channels`), sample placement (`_place_samples` /
`_axis_plane_crossings`), and radiance decode (`_radiance_features` +
trunks) — all static-shape, fusion-friendly elementwise pipelines.
Numerics are pinned by tests/test_surface_light_field.py's golden fixture.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.models import grids, shading
from neural_radiance_caching_tpu.ops import coord, math, ref_utils, render
from neural_radiance_caching_tpu.utils import jaxutil

# The distance head packs, per proposed sample, a block of 8 channels; only
# the ones named here are live (the rest are reserved padding, kept for
# checkpoint-shape parity with the reference head). Trailing 4 channels of
# the head are the env-map RGBA escape hatch.
_HEAD_BLOCK = 8
_HEAD_TAIL = 4
_CH_LADDER_SHIFT = 0   # signed shift of this sample along the s-ladder
_CH_SHIFT_GATE = 1     # sigmoid gate on the shift magnitude
_CH_NUDGE_GATE = 2     # sigmoid gate on the 3D point nudge
_CH_LOGIT = 4          # per-sample blend logit
_CH_NUDGE = slice(5, 8)  # xyz point nudge


def _unit_fold(s):
    """Reflect an unbounded s-coordinate back into [0, 1] (triangle wave).

    Equivalent to: even floor keeps the fractional part, odd floor mirrors
    it — written here as a single mod/abs chain so XLA fuses it into the
    surrounding elementwise graph without an int cast.
    """
    return 1.0 - jnp.abs(jnp.mod(s, 2.0) - 1.0)


def _take_along_sample_axis(fields, order):
    """Reorder every field in `fields` by `order` along its last axis.

    For trailing-xyz fields ([..., K, 3]) the ordering indexes the LAST axis
    with the repeated sample order — reproducing the reference's indexing
    (which relies on XLA's index clipping when K > 3) bit-for-bit rather
    than "fixing" it to a per-sample permutation.
    """
    out = {}
    for name, value in fields.items():
        idx = order
        if value.ndim == order.ndim + 1:
            idx = jnp.repeat(order[..., None], value.shape[-1], axis=-1)
        out[name] = jnp.take_along_axis(value, idx, axis=-1)
    return out


@gin.configurable
class BaseSurfaceLightFieldMLP(shading.BaseShader):
    config: Any = None

    # Conditioning inputs: which encodings of (origin, direction, lights,
    # 3D points) feed the view branch.
    use_bottleneck: bool = True
    use_shader_bottleneck: bool = False
    use_directional_enc: bool = False
    use_ide: bool = False
    use_origins: bool = False
    deg_origins: int = 4
    use_lights: bool = True
    deg_lights: int = 2
    use_points: bool = False
    use_points_ide: bool = False
    deg_points: int = 4
    use_sphere_points: bool = False
    deg_sphere_points: int = 4
    sphere_radius: float = 5.0
    use_far_field_points: bool = False
    use_env_alpha: bool = False

    # View-conditioned decoder trunk.
    net_depth_viewdirs: int = 1
    net_width_viewdirs: int = 128
    bottleneck_viewdirs: int = 128
    skip_layer_dir: int = 4
    deg_view: int = 4

    # Distance head (where along the query ray the radiance originates).
    use_distance_prediction: bool = False
    net_depth_distance: int = 1
    net_width_distance: int = 128
    skip_layer_distance: int = 4
    deg_view_distance: int = 2
    use_distance_ide: bool = False
    use_sorted_distances: bool = False

    # Optional per-point density head + alpha decode.
    use_density_prediction: bool = False
    net_depth_density: int = 2
    net_width_density: int = 64
    skip_layer_density: int = 2
    density_activation: Callable[..., Any] = math.safe_exp
    density_bias: float = -1.0
    density_noise: float = 0.0
    alpha_bias: float = 2.0
    alpha_activation: Callable[..., Any] = nn.sigmoid

    # Distance-sample placement along the query ray.
    num_distance_samples: int = 1
    num_far_samples: int = 0
    distance_near: float = 1e-3
    distance_far: float = 1e6
    distance_far_field: float = float("inf")
    distance_scale: float = 1.0
    distance_bias: float = -2.0
    use_uniform_distance: bool = False
    use_uniform_loss: bool = False
    use_indirect: bool = False
    use_uniform_grid: bool = True
    use_voxel_grid: bool = False
    voxel_start: float = 0.0
    voxel_end: float = 10.0

    raydist_fn: Union[Tuple[Callable, ...], Callable, None] = None

    use_point_offsets: bool = False
    point_offset_scale: float = 0.25
    point_offset_bias: float = -3.0
    window_points_frac: float = 0.0

    use_reflectance_grid: bool = False
    reflectance_grid_representation: str = "ngp"
    reflectance_grid_params: Any = None
    ref_warp_fn: Callable[..., Any] = None
    use_roughness: bool = False
    roughness_scale: float = 0.001
    per_ref_feature_output: bool = False

    num_light_features: int = 64
    use_illumination_feature: bool = False
    multiple_illumination_outputs: bool = True
    rotate_illumination: bool = False

    rgb_max: float = float("inf")
    ambient_rgb_max: float = float("inf")
    ambient_rgb_activation: Callable[..., Any] = nn.softplus
    ambient_rgb_bias: float = -1.0

    def setup(self):
        dense = self._make_dense_layer_factory()
        zeros = functools.partial(nn.Dense, kernel_init=jax.nn.initializers.zeros)

        # Encoders.
        if self.use_ide:
            self.dir_enc_fn = ref_utils.generate_ide_fn(self.deg_view)
        else:
            self.dir_enc_fn = lambda d, _: coord.pos_enc(d, 0, self.deg_view, True)
        self.origins_enc_fn = lambda o: coord.pos_enc(o, 0, self.deg_origins, True)
        self.lights_enc_fn = lambda l: coord.pos_enc(l, 0, self.deg_lights, True)
        self.sphere_points_enc_fn = lambda p: coord.pos_enc(p, 0, self.deg_sphere_points, True)
        if self.use_points_ide:
            self.points_enc_fn = ref_utils.generate_ide_fn(self.deg_points)
        else:
            self.points_enc_fn = lambda p, _: coord.pos_enc(p, 0, self.deg_points, True)
        if self.use_distance_prediction:
            if self.use_distance_ide:
                self.dir_enc_fn_distance = ref_utils.generate_ide_fn(self.deg_view_distance)
            else:
                self.dir_enc_fn_distance = lambda d, _: coord.pos_enc(
                    d, 0, self.deg_view_distance, True
                )

        # Multi-illumination.
        if self.config.multi_illumination:
            self.light_vecs = nn.Embed(
                self.config.num_illuminations, self.num_light_features, name="light_vecs"
            )
            self.num_illumination_outputs = (
                self.config.num_illuminations if self.config.multiple_illumination_outputs else 1
            )
        else:
            self.num_illumination_outputs = 1
        if self.rotate_illumination and self.config.rotate_illumination:
            self.light_rotation_matrix = jnp.stack(
                [
                    _z_rotation(self.config.light_rotations[i])
                    for i in range(self.config.num_illuminations)
                ],
                axis=0,
            )

        # Grids.
        self.grid = self._make_grid(name="distance_grid")
        if self.use_reflectance_grid:
            grid_cls = grids.GRID_REPRESENTATION_BY_NAME[
                self.reflectance_grid_representation.lower()
            ]
            self.reflectance_grid = grid_cls(
                name="reflectance_grid", **dict(self.reflectance_grid_params or {})
            )
        else:
            self.reflectance_grid = None

        # Layers (names are checkpoint surface — keep in sync with the
        # reference's parameter tree).
        self.layers = [dense(self.net_width) for _ in range(self.net_depth)]
        self.bottleneck_layer = dense(self.bottleneck_width)
        self.view_dependent_layers = [
            dense(self.net_width_viewdirs, name=f"layer_{i}")
            for i in range(self.net_depth_viewdirs - 1)
        ] + [dense(self.bottleneck_viewdirs, name="layer_bottleneck")]
        self.ambient_view_dependent_layers = [
            dense(self.net_width_viewdirs, name=f"ambient_layer_{i}")
            for i in range(self.net_depth_viewdirs - 1)
        ] + [dense(self.bottleneck_viewdirs, name="ambient_layer_bottleneck")]

        output_channels = self.config.num_rgb_channels
        if self.use_indirect:
            output_channels *= self.config.n_bins
        self.output_rgba_layer = dense(
            output_channels * self.num_illumination_outputs + 1, name="output_rgba_layer"
        )
        self.output_ambient_rgb_layer = dense(
            self.config.num_rgb_channels * self.num_illumination_outputs,
            name="output_ambient_rgb_layer",
        )
        if self.use_distance_prediction:
            self.distance_layers = [
                dense(self.net_width_distance, name=f"distance_layer_{i}")
                for i in range(self.net_depth_distance)
            ]
            self.output_distance_layer = zeros(
                _HEAD_BLOCK * self.num_distance_samples + _HEAD_TAIL,
                name="distance_output_layer",
            )
        if self.use_density_prediction:
            self.density_layers = [
                dense(self.net_width_density, name=f"density_layer_{i}")
                for i in range(self.net_depth_density)
            ]
        self.output_density_layer = dense(1, name="output_density_layer")

    # --- s <-> metric-distance warps ---------------------------------------

    def _ray_warp(self, anchor, lo, hi, uniform_both, uniform_forward=False):
        """(t_to_s, s_to_t) between metric distance and normalized [0,1].

        `anchor` only supplies the broadcast shape. `uniform_both` swaps in
        affine maps in both directions; `uniform_forward` only linearizes
        t_to_s (the loss-side normalization) while sampling keeps the warp.
        """
        if self.raydist_fn is not None:
            warp, warp_inv, warp_kwargs = self.raydist_fn
        else:
            warp = warp_inv = lambda x: x
            warp_kwargs = {}
        t_to_s, s_to_t = coord.construct_ray_warps(
            functools.partial(warp, **warp_kwargs),
            jnp.ones_like(anchor) * lo,
            jnp.ones_like(anchor) * hi,
            fn_inv=functools.partial(warp_inv, **warp_kwargs),
        )
        span = hi - lo
        if uniform_both:
            s_to_t = lambda s: s * span + lo
            t_to_s = lambda t: (t - lo) / span
        elif uniform_forward:
            t_to_s = lambda t: (t - lo) / span
        return t_to_s, s_to_t

    def _sample_space_warp(self, anchor):
        """Warp pair over the distance-head's [distance_near, distance_far]."""
        return self._ray_warp(
            anchor, self.distance_near, self.distance_far,
            uniform_both=self.use_uniform_distance,
            uniform_forward=self.use_uniform_loss,
        )

    def _plane_space_warp(self, anchor):
        """Warp pair over the voxel-plane stack's [voxel_start, voxel_end]."""
        return self._ray_warp(
            anchor, self.voxel_start, self.voxel_end,
            uniform_both=self.use_uniform_grid,
        )

    def _tdist_to_s(self, rays, tdist):
        t_to_s, _ = self._sample_space_warp(rays.near)
        return t_to_s(tdist)

    # --- distance head ------------------------------------------------------

    def _distance_head_raw(self, bottleneck, origins, refdirs, roughness):
        """Run the distance MLP; returns the packed [..., 8K+4] head output."""
        feats = jnp.concatenate(
            [
                bottleneck,
                self.origins_enc_fn(self.warp_fn(origins)),
                self.dir_enc_fn_distance(refdirs, roughness),
            ],
            axis=-1,
        )
        h = self._run_skip_mlp(
            feats, self.distance_layers, self.net_depth_distance, self.skip_layer_distance
        )
        return self.output_distance_layer(h)

    def _decode_head_channels(self, raw):
        """Split the packed head into named per-sample channels + env RGBA.

        Returns (channels, env_rgb, env_alpha) where channels holds
        'shift' (gated ladder shift), 'logit', 'nudge_gate', 'nudge'.
        """
        env_rgb = self.rgb_activation(
            self.rgb_premultiplier * raw[..., -_HEAD_TAIL:-1] + self.rgb_bias
        )
        if self.use_env_alpha:
            env_alpha = self.alpha_activation(raw[..., -1:] + self.alpha_bias)
        else:
            env_alpha = jnp.ones_like(raw[..., -1:])

        k = self.num_distance_samples
        block = raw[..., : -_HEAD_TAIL].reshape(raw.shape[:-1] + (k, _HEAD_BLOCK))
        shift = (
            block[..., _CH_LADDER_SHIFT]
            * (self.distance_scale / k)
            * nn.sigmoid(block[..., _CH_SHIFT_GATE] + self.distance_bias)
        )
        channels = {
            "shift": shift,
            "logit": block[..., _CH_LOGIT],
            "nudge_gate": block[..., _CH_NUDGE_GATE],
            "nudge": block[..., _CH_NUDGE],
        }
        return channels, env_rgb, env_alpha

    # --- sample placement ---------------------------------------------------

    def _s_ladder(self, lead_shape):
        """Static per-sample base positions in s-space.

        Uniform over (0,1) open interval; with far samples, the last
        `num_far_samples` rungs are packed into [0.9, 1) (the far field).
        """
        k, k_far = self.num_distance_samples, self.num_far_samples
        if k_far > 0:
            rungs = jnp.concatenate(
                [jnp.linspace(1e-8, 0.9, k - k_far), jnp.linspace(0.9, 1.0 - 1e-8, k_far)],
                axis=-1,
            )
        else:
            rungs = jnp.linspace(1e-8, 1.0 - 1e-8, k)
        return rungs.reshape(tuple(1 for _ in lead_shape) + (-1,))

    def _axis_plane_crossings(self, rays, origins, refdirs, shift):
        """Voxel-mode placement: samples live on axis-aligned planes.

        The head's shifts perturb a fixed stack of K/3 plane triplets; each
        plane position is warped to metric space, then intersected with the
        query ray per axis.
        """
        _, plane_s_to_t = self._plane_space_warp(rays.near[..., None, None])
        k3 = self.num_distance_samples // 3
        planes = shift.reshape(shift.shape[:-1] + (k3, 3))
        stack = jnp.linspace(-1.0, 1.0, k3).reshape(
            tuple(1 for _ in planes.shape[:-2]) + (k3, 1)
        )
        planes = 2.0 * planes + stack
        planes = plane_s_to_t(jnp.abs(planes)) * jnp.sign(planes)
        # Per-axis ray/plane intersection; degenerate directions pushed to
        # +inf-ish so their crossings fall outside the valid range.
        safe_dirs = jnp.where(jnp.abs(refdirs) < 1e-5, 1e12, refdirs)
        t = (planes - origins[..., None, :]) / safe_dirs[..., None, :]
        return t.reshape(planes.shape[:-2] + (self.num_distance_samples,))

    def propose_samples(self, rng, rays, origins, refdirs, bottleneck, roughness, near=0.0,
                        far=float("inf"), **kwargs):
        """Propose per-ray sample points + the env-map escape color.

        Parity: the reference's distance-prediction path in
        internal/surface_light_field.py (predict_points). Pipeline: head
        decode -> ladder (or voxel-plane) placement -> optional sort ->
        range mask -> world-space points (+ gated nudge).

        Returns (points, logits, valid_mask, s, t, env_rgb, env_alpha).
        """
        del rng, kwargs
        t_to_s, s_to_t = self._sample_space_warp(rays.near[..., None])
        ch, env_rgb, env_alpha = self._decode_head_channels(
            self._distance_head_raw(bottleneck, origins, refdirs, roughness)
        )

        if self.use_voxel_grid:
            t = self._axis_plane_crossings(rays, origins, refdirs, ch["shift"])
            s = t_to_s(t)
        else:
            s = _unit_fold(ch["shift"] + self._s_ladder(ch["shift"].shape[:-1]))
            t = s_to_t(s)

        if self.use_sorted_distances:
            order = jnp.argsort(t, axis=-1)
            sorted_fields = _take_along_sample_axis(
                {"t": t, "s": s, "logit": ch["logit"],
                 "nudge_gate": ch["nudge_gate"], "nudge": ch["nudge"]},
                order,
            )
            t, s = sorted_fields["t"], sorted_fields["s"]
            ch.update(
                logit=sorted_fields["logit"],
                nudge_gate=sorted_fields["nudge_gate"],
                nudge=sorted_fields["nudge"],
            )

        valid = (
            (t > self.distance_near) & (t < self.distance_far) & (t > near) & (t < far)
        ).astype(jnp.float32)
        t = jnp.clip(t, self.distance_near, self.distance_far)

        points = origins[..., None, :] + t[..., None] * refdirs[..., None, :]
        if self.use_point_offsets:
            points = points + (
                nn.tanh(ch["nudge"])
                * self.point_offset_scale
                * nn.sigmoid(ch["nudge_gate"] + self.point_offset_bias)[..., None]
            )

        return points, ch["logit"], valid, s, t, env_rgb, env_alpha

    # --- per-point density decode ------------------------------------------

    def _alpha_feature_density(self, feat):
        h = self._run_skip_mlp(
            feat, self.density_layers, self.net_depth_density, self.skip_layer_density
        )
        return self.density_activation(
            self.output_density_layer(h)[..., 0] + self.density_bias
        )

    # --- misc helpers -------------------------------------------------------

    def _illum_feature(self, rays, feature):
        if not self.config.multi_illumination:
            return jnp.zeros_like(feature[..., 0:0])
        per_ray = self.light_vecs(rays.light_idx[..., 0])
        return per_ray[..., None, :] * jnp.ones_like(feature[..., 0:1])

    def _run_skip_mlp(self, x, layers, depth, skip):
        inputs = x
        for i in range(depth):
            x = self.net_activation(layers[i](x))
            if i % skip == 0 and i > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        return x

    def _rotated_refdirs(self, rays, refdirs):
        """Apply the per-illumination z-rotation to the query directions."""
        light_idx = rays.light_idx
        sh = light_idx.shape
        table = self.light_rotation_matrix.reshape(
            tuple(1 for _ in sh[:-1]) + (self.config.num_illuminations, 9)
        )
        rot = jnp.take_along_axis(table, light_idx[..., None], axis=-2)[..., 0, :]
        rot = rot.reshape(sh[:-1] + (1, 3, 3))
        return (
            rot[..., :3, 0] * refdirs[..., 0:1]
            + rot[..., :3, 1] * refdirs[..., 1:2]
            + rot[..., :3, 2] * refdirs[..., 2:3]
        )

    def _select_illumination(self, rays, rgb, like):
        """Pick this ray's illumination slice from the multi-output head."""
        light_idx = rays.light_idx[..., None, :] * jnp.ones_like(like[..., 0:1]).astype(
            rays.light_idx.dtype
        )
        rgb = rgb.reshape(rgb.shape[:-1] + (self.num_illumination_outputs, -1))
        return jnp.take_along_axis(rgb, light_idx[..., None], axis=-2)[..., 0, :]

    # --- radiance decode ----------------------------------------------------

    @nn.compact
    def __call__(
        self,
        rng,
        rays,
        sampler_results,
        origins,
        refdirs,
        roughness: Any = None,
        shader_bottleneck: Any = None,
        train: bool = True,
        train_frac: float = 1.0,
        dist_only: bool = False,
        **kwargs,
    ):
        outputs = {}
        origins = origins.reshape(refdirs.shape[:-2] + (-1, 3)) * jnp.ones_like(refdirs)

        if "cache_tdist" in kwargs:
            outputs["cache_sdist"] = self._tdist_to_s(rays, kwargs["cache_tdist"])
            if dist_only:
                return outputs

        if self.rotate_illumination and self.config.rotate_illumination:
            refdirs = self._rotated_refdirs(rays, refdirs)

        # Bottleneck source: appearance grid > shader handoff > zeros.
        if self.use_grid:
            key, rng = jaxutil.random_split(rng)
            pa_kwargs = self.get_predict_appearance_kwargs(key, rays, sampler_results)
            bottleneck = self.predict_appearance_feature(
                sampler_results, train=train, **pa_kwargs
            ) * jnp.ones_like(refdirs[..., :1])
        elif self.use_shader_bottleneck:
            bottleneck = shader_bottleneck
        else:
            bottleneck = jnp.zeros_like(refdirs)

        feats = []
        if self.use_origins:
            feats.append(self.origins_enc_fn(origins))
        if self.use_bottleneck:
            feats.append(bottleneck)
        if self.config.multi_illumination and self.use_illumination_feature:
            feats.append(self._illum_feature(rays, bottleneck))
        if self.use_shader_bottleneck:
            feats.append(shader_bottleneck)

        # Degenerate single-sample defaults (no distance head): one sample
        # at s = t = 0 with unit weight and a transparent env escape.
        unit = jnp.ones_like(bottleneck[..., 0:1])
        s_distances = distances = env_alpha = jnp.zeros_like(unit)
        env_rgb = jnp.zeros_like(bottleneck[..., 0:3])
        raw_weights = ref_weights = ref_mask = unit
        points = None

        if self.use_distance_prediction:
            key, rng = jaxutil.random_split(rng)
            (points, raw_weights, ref_mask, s_distances, distances, env_rgb, env_alpha) = (
                self.propose_samples(key, rays, origins, refdirs, bottleneck, roughness, **kwargs)
            )
            points = self.ref_warp_fn(points) if self.ref_warp_fn is not None else points
            blend = jax.nn.softmax(raw_weights, axis=-1)
            s_distances = (s_distances * blend).sum(axis=-1, keepdims=True)
            ref_weights = blend * ref_mask * env_alpha

        if self.use_far_field_points:
            points = ref_utils.l2_normalize(refdirs)[..., None, :]

        if self.use_reflectance_grid:
            ref_roughness = (
                roughness[..., None, :] * distances[..., None] * self.roughness_scale
                if self.use_roughness
                else None
            )
            ref_grid_feat = self.reflectance_grid(
                points,
                x_scale=ref_roughness,
                per_level_fn=lambda f: f,
                train=train,
                train_frac=train_frac,
            )
            if self.use_density_prediction:
                ref_density = self._alpha_feature_density(ref_grid_feat)
                ref_weights, _, _ = render.compute_alpha_weights(
                    ref_density * self.density_activation(raw_weights + self.density_bias),
                    None,
                    refdirs,
                    opaque_background=False,
                    delta=jnp.ones_like(distances) / self.num_distance_samples,
                )
                ref_weights = ref_weights * ref_mask
                s_distances = (s_distances * ref_weights).sum(axis=-1, keepdims=True)

            if self.per_ref_feature_output:
                # Decode each proposed point separately and composite RGB.
                h = self._run_skip_mlp(
                    ref_grid_feat,
                    self.view_dependent_layers,
                    self.net_depth_viewdirs,
                    self.skip_layer_dir,
                )
                raw_rgba = self.output_rgba_layer(h)
                per_point_rgb = self.rgb_activation(
                    self.rgb_premultiplier * raw_rgba[..., :3] + self.rgb_bias
                )
                outputs["incoming_rgb"] = (
                    per_point_rgb[..., :3] * ref_weights[..., None]
                ).sum(axis=-2)
                outputs["incoming_alpha"] = nn.sigmoid(raw_rgba[..., -1:] - 1.0)
                outputs["incoming_env_rgba"] = jnp.concatenate([env_rgb, env_alpha], axis=-1)
                outputs["incoming_weights"] = ref_weights
                outputs["incoming_s_dist"] = s_distances
                outputs["incoming_dist"] = distances
                outputs["incoming_acc"] = ref_weights.sum(axis=-1)
                return outputs

            feats.append((ref_grid_feat * ref_weights[..., None]).sum(axis=-2))
        else:
            s_distances = s_distances.mean(axis=-1, keepdims=True)

        if self.use_points:
            unit_points = ref_utils.l2_normalize(points)
            scale_arg = roughness[..., None, :] if self.use_points_ide else train_frac
            feats.append(
                self.points_enc_fn(unit_points, scale_arg).reshape(origins.shape[:-1] + (-1,))
            )
        if self.use_sphere_points:
            feats.append(
                self.sphere_points_enc_fn(
                    ref_utils.l2_normalize(origins + self.sphere_radius * refdirs)
                )
            )
        if self.use_directional_enc:
            feats.append(self.dir_enc_fn(refdirs, roughness))

        x = jnp.concatenate(feats, axis=-1)

        # Two trunks: the lit (light-conditioned) branch and the ambient
        # branch. Without lights the single trunk serves both heads.
        if self.use_lights:
            ambient_x = self._run_skip_mlp(
                x, self.ambient_view_dependent_layers, self.net_depth_viewdirs, self.skip_layer_dir
            )
            light_pos = rays.lights[..., None, :] * jnp.ones_like(origins)
            if self.warp_fn is not None:
                light_pos = self.warp_fn(light_pos)
            x = self._run_skip_mlp(
                jnp.concatenate([x, self.lights_enc_fn(light_pos)], axis=-1),
                self.view_dependent_layers,
                self.net_depth_viewdirs,
                self.skip_layer_dir,
            )
        else:
            x = self._run_skip_mlp(
                x, self.view_dependent_layers, self.net_depth_viewdirs, self.skip_layer_dir
            )
            ambient_x = x

        raw_rgba = self.output_rgba_layer(x)
        rgb = self.rgb_activation(self.rgb_premultiplier * raw_rgba[..., :-1] + self.rgb_bias)
        alpha = jnp.clip(self.alpha_activation(raw_rgba[..., -1:] + self.alpha_bias), 0.0, 1.0)
        if self.config.multi_illumination and self.multiple_illumination_outputs:
            rgb = self._select_illumination(rays, rgb, bottleneck)
        ambient_rgb = self.ambient_rgb_activation(
            self.output_ambient_rgb_layer(ambient_x) + self.ambient_rgb_bias
        )

        outputs["incoming_rgb"] = jnp.clip(rgb, 0.0, self.rgb_max)
        outputs["incoming_ambient_rgb"] = jnp.clip(ambient_rgb, 0.0, self.ambient_rgb_max)
        outputs["incoming_alpha"] = alpha
        outputs["incoming_weights"] = ref_weights
        outputs["incoming_s_dist"] = s_distances
        outputs["incoming_dist"] = distances
        outputs["incoming_env_rgba"] = jnp.concatenate([env_rgb, env_alpha], axis=-1)
        outputs["incoming_acc"] = ref_weights.sum(axis=-1)
        return outputs


def _z_rotation(degrees):
    """3x3 rotation about +z by `degrees` (illumination rig turntable)."""
    a = jnp.float32(degrees / 180 * jnp.pi)
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], dtype=jnp.float32)


@gin.configurable
class SurfaceLightFieldMLP(BaseSurfaceLightFieldMLP):
    pass


@gin.configurable
class TransientSurfaceLightFieldMLP(BaseSurfaceLightFieldMLP):
    use_indirect: bool = True
