"""Grid-backed spatial feature encoders (NGP hash, TensoRF, triplane).

Behavioral parity target: reference internal/grid_utils.py:738-1067. The
HashEncoding public surface (gin name, hyperparameters, bbox semantics,
precondition scaling, init range) matches the reference; the implementation
routes through the fused TPU encoder in ops.hashgrid:

  * one stacked [L_hash, T, F] parameter for all hash levels → one gather
  * one flat [sum(S^3), F] parameter for all dense levels → one gather

instead of the reference's per-level parameters and per-level gather loops.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.ops import hashgrid, math

BboxType = Tuple[Tuple[float, float, float], Tuple[float, float, float]]


@gin.configurable
class HashEncoding(nn.Module):
    """Multiresolution grid/hash encoding (Instant NGP), TPU-fused."""

    hash_map_size: int = 2**19  # T
    num_features: int = 2  # F
    scale_supersample: float = 2.0  # 1/log2(ratio between adjacent scales)
    min_grid_size: int = 16  # N_min
    max_grid_size: int = 2048  # N_max
    hash_init_range: float = 1e-4
    precondition_scaling: float = 10.0
    bbox_scaling: Union[float, BboxType] = 2.0
    append_scale: bool = False
    # Accepted for reference-config compatibility.
    resample_op_mode: Any = None
    # 'trilinear' (8 taps, the reference scheme) or 'simplex' (tetrahedral,
    # 4 taps): halves gather rows and backward scatter updates on TPU with C0
    # continuity preserved.
    interpolation: str = "trilinear"
    feature_aggregator: str = "concatenate"

    @property
    def grid_sizes(self):
        return hashgrid.compute_grid_sizes(
            self.min_grid_size, self.max_grid_size, self.scale_supersample
        )

    @property
    def bbox(self):
        bbox = self.bbox_scaling
        if isinstance(bbox, (int, float)):
            bbox = ((-bbox,) * 3, (bbox,) * 3)
        return np.array(bbox)

    @property
    def num_dense_levels(self):
        sizes = self.grid_sizes.astype(np.int64)
        return int((sizes**3 <= self.hash_map_size).sum())

    @property
    def dense_offsets(self):
        if self.num_dense_levels == 0:
            return ()
        sizes = self.grid_sizes.astype(np.int64)[: self.num_dense_levels]
        return tuple(np.concatenate([[0], np.cumsum(sizes**3)[:-1]]).astype(int).tolist())

    @nn.compact
    def __call__(
        self,
        x,
        *,
        x_scale=None,
        per_level_fn: Optional[Callable] = None,
        train=True,
        train_frac=1.0,
        feature_filter=None,
        feature_filter_size=None,
        max_levels=None,
    ):
        """Encode [..., M, 3] world points into [..., L*F] features.

        `per_level_fn` only supports the reference's multisample reductions
        (math.average_across_multisamples / concat / identity); the fused
        kernel applies the reduction internally.

        max_levels: statically clamp the pyramid to its coarsest K levels —
        only those are gathered (and receive scatter updates in the
        backward); the finer levels' output features are zeros, so the
        consuming MLP's input width (and its weights) are unchanged. This is
        the secondary-ray LOD knob: wide secondary footprints already erf-
        suppress fine-level features, and hash gathers+scatters are the
        material stage's dominant cost (BASELINE.md round-3 traces). No
        reference counterpart (its grids have no level clamp).
        """
        del train, train_frac
        grid_sizes = self.grid_sizes
        full_num_levels = len(grid_sizes)
        if max_levels is not None and max_levels < full_num_levels:
            grid_sizes = grid_sizes[:max_levels]
        bbox = self.bbox
        # Map to [0, 1]^3 (grid_utils.py:820).
        x = (x - bbox[0]) / (bbox[1] - bbox[0])

        if x_scale is not None:
            sizes = np.diff(bbox, axis=0)[0]
            if np.any(np.abs(sizes[0] - sizes[1:]) > np.finfo(np.float32).eps):
                raise ValueError("x_scale must be None when bbox is not square.")
            # ops.hashgrid expects [..., M, 1] (broadcasts against level sizes).
            x_scale = x_scale / sizes[0]

        if self.feature_aggregator not in ("concatenate", "sum"):
            raise ValueError(
                f"feature_aggregator={self.feature_aggregator!r}: the "
                "reference defines 'concatenate' and 'sum' (grid_utils.py:"
                "896-901)."
            )
        if self.append_scale and x_scale is None:
            raise ValueError("append_scale=True requires an x_scale input.")

        if per_level_fn is None:
            reduce = None
        elif per_level_fn is math.average_across_multisamples:
            reduce = "mean"
        elif per_level_fn is math.concat_across_multisamples:
            reduce = "concat"
        else:
            # Identity lambdas (e.g. reflectance grids use per_level_fn=lambda
            # x: x): detect by probing a tiny array.
            probe = np.ones((2, 3), np.float32)
            if np.asarray(per_level_fn(probe)).shape == probe.shape:
                reduce = None
            else:
                raise NotImplementedError(f"Unsupported per_level_fn {per_level_fn}")

        # Parameters are ALWAYS the full pyramid (call args must not change
        # flax param shapes); a level clamp slices them for this call, and
        # the slice VJP zero-pads the clamped levels' gradients.
        num_dense_full = self.num_dense_levels
        num_hash_full = full_num_levels - num_dense_full
        full_sizes = self.grid_sizes.astype(np.int64)
        maxval = self.hash_init_range / self.precondition_scaling
        init = lambda key, shape: jax.random.uniform(key, shape, minval=-maxval, maxval=maxval)

        num_dense = min(num_dense_full, len(grid_sizes))
        num_hash = len(grid_sizes) - num_dense
        dense_offsets = self.dense_offsets[:num_dense]
        dense_pool = None
        if num_dense_full:
            total_full = int((full_sizes[:num_dense_full] ** 3).sum())
            dense_pool = self.param(
                "dense_levels", init, (total_full, self.num_features)
            )
            total = int((full_sizes[:num_dense] ** 3).sum())
            if total != total_full:
                dense_pool = dense_pool[:total]
            dense_pool = dense_pool if num_dense else None
        hash_tables = None
        if num_hash_full:
            hash_tables = self.param(
                "hash_levels", init,
                (num_hash_full, self.hash_map_size, self.num_features),
            )
            if num_hash != num_hash_full:
                hash_tables = hash_tables[:num_hash] if num_hash else None

        if reduce is None:
            # No reduction: every input point keeps its own feature. Insert a
            # singleton multisample axis; the mean over it is the identity.
            features = hashgrid.multires_grid_encode(
                x[..., None, :],
                hash_tables,
                dense_pool,
                grid_sizes=tuple(int(s) for s in grid_sizes),
                table_size=self.hash_map_size,
                dense_offsets=dense_offsets,
                x_scale=None if x_scale is None else x_scale[..., None, :],
                multisample_reduce="mean",
                interpolation=self.interpolation,
            )
        else:
            features = hashgrid.multires_grid_encode(
                x,
                hash_tables,
                dense_pool,
                grid_sizes=tuple(int(s) for s in grid_sizes),
                table_size=self.hash_map_size,
                dense_offsets=dense_offsets,
                x_scale=x_scale,
                multisample_reduce=reduce,
                interpolation=self.interpolation,
            )
            if reduce == "concat":
                # The fused encoder's concat output is rank-increased
                # [..., L, M*F]; the public contract (reference
                # math.concat_across_multisamples + level concatenation,
                # grid_utils.py:896-901) is one flat [..., L*M*F] vector.
                features = features.reshape(features.shape[:-2] + (-1,))

        if self.append_scale or feature_filter is not None:
            # Post-hoc per-level transforms (grid_utils.py:872-892). The fused
            # encoder returns level-major features, so both the scale feature
            # and the radius filter can be applied by reshaping to
            # [..., L, F'] — no kernel change needed.
            lead = features.shape[:-1]
            num_levels = len(grid_sizes)
            f_lvl = features.reshape(lead + (num_levels, -1))

            if self.append_scale:
                # Scale feature 2w-1, rescaled by the running feature RMS so
                # the two stay magnitude-matched (grid_utils.py:872-885).
                sizes_arr = jnp.asarray(grid_sizes, f_lvl.dtype)
                weighting = math.approx_erf(
                    1.0 / (jnp.sqrt(8.0) * (x_scale * sizes_arr))
                )
                if reduce == "mean":
                    weighting = weighting.mean(axis=-2)  # average multisamples
                level_rms = []
                for li in range(num_levels):
                    if li < num_dense:
                        start = self.dense_offsets[li]
                        count = int(grid_sizes.astype(np.int64)[li] ** 3)
                        vals = dense_pool[start : start + count]
                    else:
                        vals = hash_tables[li - num_dense]
                    level_rms.append(
                        jnp.sqrt(
                            maxval**2
                            + jnp.mean(jax.lax.stop_gradient(vals) ** 2)
                        )
                    )
                rms = jnp.stack(level_rms)
                if reduce == "concat":
                    # Reference ordering appends the scale feature per
                    # multisample BEFORE the concat reduce (grid_utils.py:
                    # 872-888), so each level block becomes M*(F+1) with
                    # (multisample, feature) minor.
                    m = x.shape[-2]
                    f_lvl = f_lvl.reshape(f_lvl.shape[:-1] + (m, -1))
                    w_lm = jnp.moveaxis(weighting, -2, -1)  # [..., L, M]
                    f_scale = (2.0 * w_lm - 1.0) * rms[:, None]
                    f_lvl = jnp.concatenate(
                        [f_lvl, f_scale[..., None]], axis=-1
                    ).reshape(f_lvl.shape[:-2] + (-1,))
                else:
                    f_scale = (2.0 * weighting - 1.0) * rms
                    f_lvl = jnp.concatenate(
                        [f_lvl, f_scale[..., None]], axis=-1
                    )

            if feature_filter is not None:
                # Zero out fine levels outside the filter radius
                # (grid_utils.py:890-892): only levels with grid_size >
                # feature_filter_size are masked.
                gate = jnp.asarray(
                    grid_sizes > (feature_filter_size or 0)
                ).reshape(num_levels, 1)
                filt = jnp.asarray(feature_filter, f_lvl.dtype)
                # Collapse any multisample axis to per-point.
                filt = filt.reshape(lead + (-1,)).mean(axis=-1)
                filt = filt[..., None, None]  # [..., 1, 1]
                f_lvl = f_lvl * jnp.where(gate, filt, jnp.ones_like(filt))

            features = f_lvl.reshape(lead + (-1,))

        if self.feature_aggregator == "sum":
            # Per-level blocks summed instead of concatenated
            # (grid_utils.py:898-899); the fused encoder's flat output is
            # level-major, so one reshape exposes the level axis.
            features = features.reshape(
                features.shape[:-1] + (len(grid_sizes), -1)
            ).sum(axis=-2)
        elif len(grid_sizes) < full_num_levels:
            # Level clamp: zero features for the skipped fine levels so the
            # output width stays L*F' and the consuming MLP is unchanged.
            per_level_width = features.shape[-1] // len(grid_sizes)
            pad = (full_num_levels - len(grid_sizes)) * per_level_width
            features = jnp.pad(
                features,
                [(0, 0)] * (features.ndim - 1) + [(0, pad)],
            )

        return features * self.precondition_scaling


@gin.configurable
class FactoredGrid(nn.Module):
    """Low-rank factored 3D grid (TensoRF), cf. grid_utils.py:908-990."""

    grid_size: int = 300
    num_features: int = 28
    num_components: int = 64
    feature_init_scale: float = 0.1
    bbox_scaling: float = 2.0
    reduction: str = "sum"

    @property
    def bbox(self):
        b = self.bbox_scaling
        return np.array(((-b,) * 3, (b,) * 3))

    @nn.compact
    def __call__(self, x, *, x_scale=None, per_level_fn=None, train=True, train_frac=1.0):
        if x_scale is not None:
            raise ValueError("x_scale should be None for FactoredGrid.")
        frames = np.stack([np.roll(np.eye(3), i, axis=0) for i in range(3)], axis=0)
        frames = frames / self.bbox_scaling
        x = math.matmul(frames, x[..., None, :, None])[..., 0]
        x = (x + 1.0) / 2.0 * self.grid_size
        x = jnp.moveaxis(x, (-2, -1), (0, 1))
        coords_1d = x[:, :1]
        coords_2d = x[:, 1:3]

        feat_init = lambda key, shape: jax.random.normal(key, shape) * self.feature_init_scale
        shape_prefix = (self.num_components, 3)
        f1 = self.param("grid_features_1d", feat_init, shape_prefix + (self.grid_size,))
        f2 = self.param("grid_features_2d", feat_init, shape_prefix + (self.grid_size,) * 2)
        fa = self.param(
            "grid_features_appearance", feat_init, (self.num_components * 3, self.num_features)
        )

        lerp = functools.partial(jax.scipy.ndimage.map_coordinates, order=1)
        interp = jax.vmap(jax.vmap(lerp), (0, None))
        g3 = interp(f1, coords_1d) * interp(f2, coords_2d)
        g3 = jnp.moveaxis(g3.reshape((-1,) + g3.shape[2:]), 0, -1)
        features = math.matmul(g3, fa)
        if per_level_fn is not None:
            features = per_level_fn(features)
        return features


@gin.configurable
class Triplane(nn.Module):
    """Triplane feature grid (EG3D), cf. grid_utils.py:993-1059."""

    grid_size: int = 512
    num_features: int = 48
    feature_init_scale: float = 0.1
    bbox_scaling: float = 2.0
    reduction: str = "sum"

    @nn.compact
    def __call__(self, x, *, x_scale=None, per_level_fn=None, train=True, train_frac=1.0):
        if x_scale is not None:
            raise ValueError("x_scale should be None for Triplane.")
        frames = np.stack([np.roll(np.eye(3), i, axis=0) for i in range(3)], axis=0)
        frames = (frames / self.bbox_scaling)[..., 1:3, :]
        x = math.matmul(frames, x[..., None, :, None])[..., 0]
        x = (x + 1.0) / 2.0 * self.grid_size
        coords = jnp.moveaxis(x, -2, 0)  # [3, ..., 2]

        feat_init = lambda key, shape: jax.random.normal(key, shape) * self.feature_init_scale
        planes = self.param(
            "triplane_grid_features_2d",
            feat_init,
            (3, self.grid_size, self.grid_size, self.num_features),
        )

        # Bilinear resample each plane (clamped edges).
        def bilerp(plane, c):
            c = jnp.clip(c, 0, self.grid_size - 1)
            c0 = jnp.floor(c)
            frac = c - c0
            c0 = c0.astype(jnp.int32)
            c1 = jnp.minimum(c0 + 1, self.grid_size - 1)
            g = lambda cx, cy: plane[cy, cx]
            f00 = g(c0[..., 0], c0[..., 1])
            f01 = g(c0[..., 0], c1[..., 1])
            f10 = g(c1[..., 0], c0[..., 1])
            f11 = g(c1[..., 0], c1[..., 1])
            wx, wy = frac[..., 0:1], frac[..., 1:2]
            return (
                f00 * (1 - wx) * (1 - wy)
                + f10 * wx * (1 - wy)
                + f01 * (1 - wx) * wy
                + f11 * wx * wy
            )

        gathered = jax.vmap(bilerp)(planes, coords)
        features = jnp.sum(gathered, axis=0) if self.reduction == "sum" else jnp.mean(gathered, axis=0)
        if per_level_fn is not None:
            features = per_level_fn(features)
        return features


GRID_REPRESENTATION_BY_NAME = {
    "ngp": HashEncoding,
    "hash": HashEncoding,
    "triplane": Triplane,
    "tensorf": FactoredGrid,
}
