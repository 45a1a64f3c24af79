"""TPU-native multiresolution hash-grid encoding (Instant NGP).

This is the op the reference explicitly refuses to run on TPU
(internal/geometry.py:255-257: "Gathering/scattering from a grid is
impossibly slow on TPU"). That claim predates modern XLA:TPU — measured on a
v5e chip, `jnp.take` sustains ~62G gathered rows/s (~1 TB/s effective, i.e.
HBM-bound) and scatter-add gradients are similarly fast. The design here is
therefore built around a *small number of large fused gathers* rather than
the reference's per-level Python loop of tiny gathers
(internal/grid_utils.py:41-121):

  * All hash levels of one encoder share a single stacked parameter
    [L_hash, T, F]; the level offset is folded into the hash index so the
    whole encoder does ONE gather of [..., L_hash * 8] rows (and its backward
    is ONE scatter-add into the stacked table).
  * All dense levels are stored in a single flat pool [sum(S_l^3), F] with
    static per-level offsets - again one gather for all dense levels.
  * Trilinear corner weights for every level are computed in one vectorized
    [..., L, 8] block on the VPU; features are corner-reduced and level-
    concatenated with pure reshapes.

The spatial hash matches the reference/Instant-NGP formula exactly
(grid_utils.py:99-111): int32→uint32 wraparound then
x ⊕ (y·19349663) ⊕ (z·83492791) mod T. Dense levels replicate the
reference's CONSTANT_OUTSIDE boundary (grid_utils.py:352-445) by zeroing the
contribution of out-of-range corners.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_PI2 = np.uint32(19349663)
_PI3 = np.uint32(83492791)

# The eight corner offsets of a voxel, ordered to match the reference's
# (floor/ceil) enumeration (grid_utils.py:68-77).
_CORNERS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int32
)  # [8, 3]


def compute_grid_sizes(min_grid_size, max_grid_size, scale_supersample):
    """Geometric level sizes N_min..N_max (grid_utils.py:772-794)."""
    desired = 1 + scale_supersample * np.log2(max_grid_size / min_grid_size)
    num_scales = int(np.round(desired))
    if np.abs(desired - num_scales) > 1e-4:
        raise ValueError(
            f"(min={min_grid_size}, max={max_grid_size}, "
            f"supersample={scale_supersample}) yields non-integer scale count {desired}."
        )
    return np.round(np.geomspace(min_grid_size, max_grid_size, num_scales)).astype(np.int32)


def _corner_coords_and_weights(x, grid_sizes, interpolation="trilinear"):
    """Voxel corners and interpolation weights for all levels at once.

    Args:
      x: [..., 3] coordinates in [0, 1]^3 (values outside are legal; hash
        levels wrap, dense levels zero out).
      grid_sizes: static [L] level resolutions.
      interpolation: 'trilinear' (8 corners) or 'simplex' (tetrahedral, 4
        corners). Simplex is the TPU-first default for hot paths: the
        encoder's cost is per-gathered-row (and per-scattered-row in the
        backward), so 4 taps instead of 8 halves both, with C0 continuity
        preserved (standard tetrahedral LUT interpolation).

    Returns:
      corners: [..., L, U, 3] int32 lattice coordinates (U = 8 or 4).
      weights: [..., L, U] interpolation weights (sum to 1 in-range).
    """
    sizes = jnp.asarray(grid_sizes, x.dtype)  # [L]
    # Voxel centers at integer coords with half-pixel centering: shift by 0.5.
    pos = x[..., None, :] * sizes[:, None] - 0.5  # [..., L, 3]
    floor = jnp.floor(pos)
    frac = pos - floor  # [..., L, 3]

    if interpolation == "trilinear":
        corners = floor[..., None, :].astype(jnp.int32) + _CORNERS  # [..., L, 8, 3]
        # weight = prod over axes of (1-frac) for floor, frac for ceil taps.
        corner_sel = _CORNERS.astype(x.dtype)  # [8, 3]
        w = corner_sel * frac[..., None, :] + (1 - corner_sel) * (
            1 - frac[..., None, :]
        )
        weights = w[..., 0] * w[..., 1] * w[..., 2]  # [..., L, 8]
        return corners, weights

    if interpolation != "simplex":
        raise ValueError(f"Unknown interpolation {interpolation!r}")

    # Tetrahedral: walk from the base corner along axes in decreasing-frac
    # order. Corner k includes axis i iff rank(frac_i) < k, with index
    # tie-breaking so the ranks are always a permutation of (0, 1, 2).
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    i32 = jnp.int32
    r_x = (fy > fx).astype(i32) + (fz > fx).astype(i32)
    r_y = (fx >= fy).astype(i32) + (fz > fy).astype(i32)
    r_z = (fx >= fz).astype(i32) + (fy >= fz).astype(i32)
    ranks = jnp.stack([r_x, r_y, r_z], axis=-1)  # [..., L, 3]
    k = jnp.arange(4, dtype=i32)  # [4]
    offsets = (ranks[..., None, :] < k[:, None]).astype(i32)  # [..., L, 4, 3]
    corners = floor[..., None, :].astype(i32) + offsets

    # Sorted fracs g1 >= g2 >= g3; weights are the consecutive differences.
    g1 = jnp.maximum(jnp.maximum(fx, fy), fz)
    g3 = jnp.minimum(jnp.minimum(fx, fy), fz)
    g2 = fx + fy + fz - g1 - g3
    weights = jnp.stack([1.0 - g1, g1 - g2, g2 - g3, g3], axis=-1)  # [..., L, 4]
    return corners, weights


def _hash_indices(corners, table_size):
    """Instant-NGP spatial hash, matching grid_utils.py:99-111 bit-for-bit."""
    c = corners.astype(jnp.uint32)
    h = c[..., 0] ^ (c[..., 1] * _PI2) ^ (c[..., 2] * _PI3)
    return (h % np.uint32(table_size)).astype(jnp.int32)


def _tap_corners_and_weights(xT, grid_sizes, interpolation):
    """Per-tap corners/weights in TPU-layout-safe rows-last planes.

    Every tensor here keeps the (large) point axis minor-most and the tiny
    structural axes (level, xyz component, tap) major, so any buffer XLA
    materializes tiles as [small..., 8k+, 128k+] with negligible padding.
    The logically equivalent [..., L, U(, 3)] layout of
    _corner_coords_and_weights pads its (U<=8, 3or F=4) minor dims to
    (8, 128) under TPU tiling - up to 51x memory - which is what made the
    material-stage gather chain OOM (round-3 finding; see also the round-2
    trace's 29% layout-copy fraction).

    Args:
      xT: [3, P] coordinates, component-major.
      grid_sizes: static [L] level resolutions.
      interpolation: 'trilinear' (8 taps) or 'simplex' (4 taps).

    Returns:
      List over taps of (corners [L, 3, P] int32, weights [L, P]).
    """
    sizes = jnp.asarray(np.asarray(grid_sizes), xT.dtype)  # [L]
    pos = xT[None, :, :] * sizes[:, None, None] - 0.5  # [L, 3, P]
    floor = jnp.floor(pos)
    frac = pos - floor  # [L, 3, P]
    floor = floor.astype(jnp.int32)

    if interpolation == "trilinear":
        taps = []
        for corner in _CORNERS:  # 8 static taps
            sel = jnp.asarray(corner, xT.dtype)[None, :, None]  # [1, 3, 1]
            w3 = sel * frac + (1 - sel) * (1 - frac)  # [L, 3, P]
            taps.append((
                floor + corner[None, :, None],
                w3[:, 0, :] * w3[:, 1, :] * w3[:, 2, :],
            ))
        return taps

    if interpolation != "simplex":
        raise ValueError(f"Unknown interpolation {interpolation!r}")

    # Tetrahedral taps: same rank construction as _corner_coords_and_weights,
    # on [L, P] planes.
    fx, fy, fz = frac[:, 0, :], frac[:, 1, :], frac[:, 2, :]
    i32 = jnp.int32
    r_x = (fy > fx).astype(i32) + (fz > fx).astype(i32)
    r_y = (fx >= fy).astype(i32) + (fz > fy).astype(i32)
    r_z = (fx >= fz).astype(i32) + (fy >= fz).astype(i32)
    ranks = jnp.stack([r_x, r_y, r_z], axis=1)  # [L, 3, P]
    g1 = jnp.maximum(jnp.maximum(fx, fy), fz)
    g3 = jnp.minimum(jnp.minimum(fx, fy), fz)
    g2 = fx + fy + fz - g1 - g3
    tap_weights = (1.0 - g1, g1 - g2, g2 - g3, g3)  # each [L, P]
    taps = []
    for k in range(4):
        offsets = (ranks < k).astype(i32)  # [L, 3, P]
        taps.append((floor + offsets, tap_weights[k]))
    return taps


def _dense_indices(corners, grid_size):
    """Flat [x*S*S + y*S + z] index plus an in-range validity mask."""
    valid = jnp.all((corners >= 0) & (corners < grid_size), axis=-1)
    c = jnp.clip(corners, 0, grid_size - 1)
    idx = (c[..., 0] * grid_size + c[..., 1]) * grid_size + c[..., 2]
    return idx, valid


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_sizes", "table_size", "dense_offsets", "multisample_reduce",
        "interpolation", "gather_layout", "hash_gather_dtype",
    ),
)
def _multires_grid_encode_xla(
    x,
    hash_tables,
    dense_pool,
    *,
    grid_sizes: Sequence[int],
    table_size: int,
    dense_offsets: Sequence[int],
    x_scale=None,
    multisample_reduce: Optional[str] = "mean",
    interpolation: str = "trilinear",
    gather_layout: str = "features",
    hash_gather_dtype: Optional[str] = None,
):
    """Encode points against a multiresolution grid/hash pyramid.

    Args:
      x: [..., M, 3] coordinates in [0, 1]^3, with a multisample axis M.
      hash_tables: [L_hash, T, F] stacked hash-level tables (or None).
      dense_pool: [sum(S^3), F] flat dense-level pool (or None).
      grid_sizes: static per-level resolutions, dense levels first.
      table_size: T, entries per hash level.
      dense_offsets: static flat offsets of each dense level in dense_pool;
        its length is the number of dense levels.
      x_scale: optional [..., M, 1] isotropic footprint (std dev) in the
        same normalized units as x; features are down-weighted by the erf
        mip weight (grid_utils.py:865-871).
      multisample_reduce: 'mean' | 'concat' | None reduction over M.

    Returns:
      [..., L * F] features ('mean' reduce) - the caller applies any
      precondition scaling.
    """
    grid_sizes = np.asarray(grid_sizes)
    num_levels = len(grid_sizes)
    num_dense = len(dense_offsets)
    num_hash = num_levels - num_dense

    # All internal tensors keep the point axis minor-most (see
    # _tap_corners_and_weights). gather_layout picks the table orientation:
    #   'features': gathers pull COLUMNS from feature-leading [F, rows]
    #     tables so their outputs are [F, L, P] directly - never a tensor
    #     whose two minor dims are both tiny.
    #   'rows': gathers pull ROWS from the natural [rows, F] tables (each
    #     read is one contiguous F*4-byte line in HBM instead of F words a
    #     table-length apart) and a transpose restores the [F, L, P] planes.
    #     The round-3 material trace showed the column gathers dominating
    #     (12 instances at 143 ms: f32[4, 2621440] operands), motivating
    #     this A/B'able orientation.
    if gather_layout not in ("features", "rows"):
        raise ValueError(f"Unknown gather_layout {gather_layout!r}")
    by_rows = gather_layout == "rows"
    batch_shape = x.shape[:-2]
    m = x.shape[-2]
    p = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    xf = x.reshape(p, m, 3)
    xsf = None if x_scale is None else x_scale.reshape(p, m)

    flat_tables_t = None
    if num_hash:
        flat_tables_t = hash_tables.reshape(-1, hash_tables.shape[-1])  # [Lh*T, F]
        if hash_gather_dtype is not None:
            # Gate measured in gather_microbench (see _BF16_GATHER_MIN_Q):
            # the cast wins only at the largest merged-table gathers. The f32
            # weight multiply below promotes the features back to f32.
            flat_tables_t = flat_tables_t.astype(hash_gather_dtype)
        if not by_rows:
            flat_tables_t = flat_tables_t.T  # [F, Lh*T]
        level_offset = jnp.asarray(
            (np.arange(num_hash, dtype=np.int32) * table_size)[:, None]
        )  # [Lh, 1]
    dense_pool_t = None
    if num_dense:
        dense_pool_t = dense_pool if by_rows else dense_pool.T  # rows / [F, rows]

    if x_scale is not None:
        from neural_radiance_caching_tpu.ops import math as nrc_math

        sizes_col = jnp.asarray(grid_sizes, x.dtype)[:, None]  # [L, 1]

    per_m = []
    for mi in range(m):
        xT = xf[:, mi, :].T  # [3, P]
        taps = _tap_corners_and_weights(xT, grid_sizes, interpolation)
        mip_w = None
        if x_scale is not None:
            # Gaussian-in-voxel mip weight, reference's fast-erf form
            # (grid_utils.py:865-871), as an [L, P] plane.
            mip_w = nrc_math.approx_erf(
                1 / (jnp.sqrt(8.0) * (xsf[:, mi][None, :] * sizes_col))
            )
        acc = None
        for corners, w in taps:
            if mip_w is not None:
                w = w * mip_w
            parts = []
            if num_dense:
                idx_parts, valid_parts = [], []
                for li in range(num_dense):
                    c = corners[li]  # [3, P]
                    size = int(grid_sizes[li])
                    valid = jnp.all((c >= 0) & (c < size), axis=0)
                    cc = jnp.clip(c, 0, size - 1)
                    idx = (cc[0] * size + cc[1]) * size + cc[2]
                    idx_parts.append(idx + dense_offsets[li])
                    valid_parts.append(valid)
                d_idx = jnp.stack(idx_parts, axis=0)  # [Ld, P]
                d_valid = jnp.stack(valid_parts, axis=0)
                if by_rows:
                    d_feat = jnp.moveaxis(
                        jnp.take(dense_pool_t, d_idx, axis=0), -1, 0
                    )  # [Ld, P, F] rows -> [F, Ld, P]
                else:
                    d_feat = jnp.take(dense_pool_t, d_idx, axis=1)  # [F, Ld, P]
                parts.append(d_feat * (w[:num_dense] * d_valid)[None])
            if num_hash:
                hc = corners[num_dense:].astype(jnp.uint32)  # [Lh, 3, P]
                h = hc[:, 0] ^ (hc[:, 1] * _PI2) ^ (hc[:, 2] * _PI3)
                h_idx = (h % np.uint32(table_size)).astype(jnp.int32)  # [Lh, P]
                if by_rows:
                    h_feat = jnp.moveaxis(
                        jnp.take(flat_tables_t, h_idx + level_offset, axis=0),
                        -1, 0,
                    )  # [Lh, P, F] rows -> [F, Lh, P]
                else:
                    h_feat = jnp.take(
                        flat_tables_t, h_idx + level_offset, axis=1
                    )  # [F, Lh, P]
                parts.append(h_feat * w[num_dense:][None])
            contrib = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            acc = contrib if acc is None else acc + contrib
        per_m.append(acc)  # [F, L, P]

    def to_rows(flp):
        # [F, L, P] -> [..., L*F]; the one layout change, on the compact
        # reduced features at the encoder boundary.
        return jnp.transpose(flp, (2, 1, 0)).reshape(batch_shape + (num_levels * flp.shape[0],))

    if multisample_reduce == "mean":
        f = per_m[0]
        for extra in per_m[1:]:
            f = f + extra
        return to_rows(f / m)
    if multisample_reduce == "concat":
        # [..., L, M*F], matching the historical layout (L major, then M, F).
        stacked = jnp.stack(per_m, axis=0)  # [M, F, L, P]
        f = jnp.transpose(stacked, (3, 2, 0, 1))  # [P, L, M, F]
        nf = stacked.shape[1]
        return f.reshape(batch_shape + (num_levels, m * nf))
    if multisample_reduce is None:
        rows = [to_rows(flp) for flp in per_m]
        return jnp.stack(rows, axis=len(batch_shape))  # [..., M, L*F]
    raise ValueError(f"Unknown multisample_reduce {multisample_reduce}")


def _corner_indices_and_weights(x, x_scale, grid_sizes, table_size, dense_offsets,
                                interpolation="trilinear"):
    """Shared index/weight computation for the custom backward pass.

    Returns (dense_idx [..., Ld, 8], dense_weights, hash_idx [..., Lh, 8],
    hash_weights) where weights already include validity masks and mip
    weighting.
    """
    grid_sizes = np.asarray(grid_sizes)
    num_dense = len(dense_offsets)
    num_hash = len(grid_sizes) - num_dense
    corners, weights = _corner_coords_and_weights(x, grid_sizes, interpolation)

    if x_scale is not None:
        from neural_radiance_caching_tpu.ops import math as nrc_math

        sizes = jnp.asarray(grid_sizes, x.dtype)
        mip_w = nrc_math.approx_erf(1 / (jnp.sqrt(8.0) * (x_scale * sizes)))
        weights = weights * mip_w[..., None]

    d_idx = d_w = h_idx = h_w = None
    if num_dense:
        idx_parts, valid_parts = [], []
        for li in range(num_dense):
            idx, valid = _dense_indices(corners[..., li, :, :], int(grid_sizes[li]))
            idx_parts.append(idx + dense_offsets[li])
            valid_parts.append(valid)
        d_idx = jnp.stack(idx_parts, axis=-2)
        d_w = weights[..., :num_dense, :] * jnp.stack(valid_parts, axis=-2)
    if num_hash:
        h_idx = _hash_indices(corners[..., num_dense:, :, :], table_size)
        h_w = weights[..., num_dense:, :]
    return d_idx, d_w, h_idx, h_w


def _tap_index_weight_planes(x, x_scale, grid_sizes, table_size, dense_offsets,
                             interpolation):
    """Backward-pass index/weight planes: [L, U, P_total] (layout-safe).

    The point axis stays minor-most so the only tiling pad is U->8 (2x max),
    versus the 32-51x the [..., L, U] form suffers. P_total flattens
    (batch..., M): the scatter treats every multisample as its own point.
    """
    grid_sizes = np.asarray(grid_sizes)
    num_dense = len(dense_offsets)
    num_hash = len(grid_sizes) - num_dense
    xT = x.reshape(-1, 3).T  # [3, P_total]
    taps = _tap_corners_and_weights(xT, grid_sizes, interpolation)
    mip_w = None
    if x_scale is not None:
        from neural_radiance_caching_tpu.ops import math as nrc_math

        sizes_col = jnp.asarray(grid_sizes, x.dtype)[:, None]
        mip_w = nrc_math.approx_erf(
            1 / (jnp.sqrt(8.0) * (x_scale.reshape(1, -1) * sizes_col))
        )  # [L, P]

    d_idx_t, d_w_t, h_idx_t, h_w_t = [], [], [], []
    for corners, w in taps:
        if mip_w is not None:
            w = w * mip_w
        if num_dense:
            idx_parts, w_parts = [], []
            for li in range(num_dense):
                c = corners[li]
                size = int(grid_sizes[li])
                valid = jnp.all((c >= 0) & (c < size), axis=0)
                cc = jnp.clip(c, 0, size - 1)
                idx = (cc[0] * size + cc[1]) * size + cc[2]
                idx_parts.append(idx + dense_offsets[li])
                w_parts.append(w[li] * valid)
            d_idx_t.append(jnp.stack(idx_parts, axis=0))
            d_w_t.append(jnp.stack(w_parts, axis=0))
        if num_hash:
            hc = corners[num_dense:].astype(jnp.uint32)
            h = hc[:, 0] ^ (hc[:, 1] * _PI2) ^ (hc[:, 2] * _PI3)
            h_idx_t.append((h % np.uint32(table_size)).astype(jnp.int32))
            h_w_t.append(w[num_dense:])

    stack_taps = lambda ts: jnp.stack(ts, axis=1) if ts else None  # [L, U, P]
    return (stack_taps(d_idx_t), stack_taps(d_w_t),
            stack_taps(h_idx_t), stack_taps(h_w_t))


def _pack_ct_planes(ct_lfp):
    """[L, F, P] cotangent planes -> [L, P*F/LANES, LANES] packed rows.

    The packed row layout interleaves SLOTS=LANES/F points per 128-lane row
    (the scatter kernels' convention). Building it with a transpose would
    materialize a [.., slots, F]-minor buffer (32x tiling pad); instead each
    feature plane is matmul'd with a static [slots, LANES] selection matrix
    on the MXU - layout-exact and effectively free.
    """
    from neural_radiance_caching_tpu.ops import scatter_tpu

    l, f, p = ct_lfp.shape
    lanes = scatter_tpu.LANES
    slots = lanes // f
    q = p // slots
    sel = np.zeros((f, slots, lanes), np.float32)
    for fi in range(f):
        for sp in range(slots):
            sel[fi, sp, sp * f + fi] = 1.0
    out = None
    for fi in range(f):
        xq = ct_lfp[:, fi, :].reshape(l, q, slots)
        contrib = jax.lax.dot_general(
            xq, jnp.asarray(sel[fi]),
            dimension_numbers=(((2,), (0,)), ((), ())),
            # HIGHEST: the default TPU matmul precision casts operands to
            # bf16, which would round every cotangent to 8 mantissa bits.
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        out = contrib if out is None else out + contrib
    return out  # [L, q, LANES]


def _dense_level_heights(dense_offsets, total):
    """Static per-level row counts of the flat dense pool."""
    return [
        (dense_offsets[li + 1] if li + 1 < len(dense_offsets) else total)
        - dense_offsets[li]
        for li in range(len(dense_offsets))
    ]


def _make_encode_vjp(statics):
    """custom_vjp wrapper: XLA gathers forward, Pallas scatter backward."""
    from neural_radiance_caching_tpu.ops import scatter_tpu

    (grid_sizes, table_size, dense_offsets, multisample_reduce, interpolation,
     gather_layout, hash_gather_dtype) = statics

    def fwd_fn(x, hash_tables, dense_pool, x_scale):
        return _multires_grid_encode_xla(
            x,
            hash_tables,
            dense_pool,
            grid_sizes=grid_sizes,
            table_size=table_size,
            dense_offsets=dense_offsets,
            x_scale=x_scale,
            multisample_reduce=multisample_reduce,
            interpolation=interpolation,
            gather_layout=gather_layout,
            hash_gather_dtype=hash_gather_dtype,
        )

    @jax.custom_vjp
    def encode(x, hash_tables, dense_pool, x_scale):
        return fwd_fn(x, hash_tables, dense_pool, x_scale)

    def encode_fwd(x, hash_tables, dense_pool, x_scale):
        out = fwd_fn(x, hash_tables, dense_pool, x_scale)
        return out, (x, hash_tables, dense_pool, x_scale)

    def encode_bwd(residuals, ct):
        x, hash_tables, dense_pool, x_scale = residuals
        num_levels = len(grid_sizes)
        num_dense = len(dense_offsets)
        num_hash = num_levels - num_dense
        m = x.shape[-2]
        p_total = int(np.prod(x.shape[:-1], dtype=np.int64))

        if multisample_reduce == "mean" and p_total >= _PLANES_MIN_POINTS:
            # Layout-safe path: tap planes [L, U, P] + matmul-packed ct rows,
            # no [..., L, U(, F)]-minor buffer anywhere (those tile-pad up to
            # 51x in HBM and were the material stage's backward memory wall).
            # Selected only at large fan-outs (secondary-ray batches): at
            # primary-ray point counts the leveled kernel is ~2x faster per
            # update and its corner-fastest prep buffers are small, while in
            # full train-step programs (model + optimizer) the planes kernel
            # currently faults the TPU runtime at primary-ray scale (r3
            # bisect: standalone/gradonly pass, any optimizer-bearing program
            # crashes; threshold documented in BASELINE.md).
            f = ct.shape[-1] // num_levels
            ct_flat = ct.reshape(-1, num_levels * f)  # [Pb, L*F]
            ct_planes = ct_flat.T.reshape(num_levels, f, -1) / m  # [L, F, Pb]
            if m > 1:
                # One column per (point, multisample), m-minor - matching the
                # x.reshape(-1, 3) flattening in the plane builder.
                ct_planes = jnp.repeat(ct_planes, m, axis=-1)
            d_tables, h_tables = _scatter_tables_from_planes(
                x, x_scale, ct_planes, hash_tables, dense_pool,
                grid_sizes, table_size, dense_offsets, interpolation,
            )
            dx, dxs = _encode_input_grads(
                fwd_fn, x, hash_tables, dense_pool, x_scale, ct
            )
            return dx, h_tables, d_tables, dxs

        # 'mean' (small fan-out) and 'concat' run the leveled kernel with
        # per-(point, multisample) cotangents through corner-fastest packing.
        if multisample_reduce == "mean":
            f = ct.shape[-1] // num_levels
            ct_lf = ct.reshape(ct.shape[:-1] + (num_levels, f))
            ct_pm = jnp.broadcast_to(
                ct_lf[..., None, :, :] / m, x.shape[:-1] + (num_levels, f)
            )
        elif multisample_reduce == "concat":
            # The 'concat' forward output is rank-increased — [..., L, M*F]
            # (level axis kept, multisample/feature packed on the last axis)
            # — so the incoming cotangent carries L on axis -2 already.
            f = ct.shape[-1] // m
            ct_lm = ct.reshape(ct.shape[:-1] + (m, f))  # [..., L, m, f]
            ct_pm = jnp.moveaxis(ct_lm, -2, -3)  # [..., m, L, f]
        else:
            raise NotImplementedError(multisample_reduce)

        d_idx, d_w, h_idx, h_w = _corner_indices_and_weights(
            x, x_scale, grid_sizes, table_size, dense_offsets, interpolation
        )

        # Both scatters stream ONE packed cotangent row per (point, level) and
        # fold the per-corner weight multiply into the kernel
        # (scatter_add_weighted_leveled) — no per-update row materialization,
        # no broadcast/transpose/copy chain on the XLA side.
        tile = 8192
        corners = d_w.shape[-1] if d_w is not None else h_w.shape[-1]

        def weighted_scatter(idx_l, w_l, ct_l, num_rows, f):
            # idx_l/w_l: [L, P*U] (corners fastest); ct_l: [L, P, F].
            if _SCATTER_DEDUP and corners > 1:
                return _dedup_weighted_scatter(
                    idx_l, w_l, ct_l, num_rows=num_rows, f=f,
                    corners=corners, tile=tile,
                )
            p = ct_l.shape[1]
            pad_p = (-p) % (tile // corners)
            if pad_p:
                # Padded updates have zero weight and scatter into row 0.
                idx_l = jnp.pad(idx_l, ((0, 0), (0, pad_p * corners)))
                w_l = jnp.pad(w_l, ((0, 0), (0, pad_p * corners)))
                ct_l = jnp.pad(ct_l, ((0, 0), (0, pad_p), (0, 0)))
            cp = ct_l.reshape(
                ct_l.shape[0], (p + pad_p) * f // scatter_tpu.LANES,
                scatter_tpu.LANES,
            )
            return scatter_tpu.scatter_add_weighted_leveled(
                idx_l, w_l, cp, num_rows=num_rows, features=f,
                corners=corners, tile=tile,
            )

        d_tables = None
        h_tables = None
        merged = (
            num_dense and num_hash
            and dense_pool.shape[-1] == hash_tables.shape[-1]
        )
        if merged:
            # ONE kernel instance over dense + hash levels: dense levels use
            # LOCAL row indices (pool offsets subtracted) and scatter into
            # full-height per-level accumulators (the dense rule size^3 <=
            # table_size guarantees every dense level fits), sliced back to
            # their true heights afterwards. Halves the Pallas instance count
            # per encoder (the grids-on-all-levels layout compiled 8 scatter
            # instances into one backward, which crashed the TPU compile
            # service at batch >= 4096 — BASELINE.md round-2).
            f_all = hash_tables.shape[-1]
            heights = _dense_level_heights(dense_offsets, dense_pool.shape[0])
            slots = scatter_tpu.LANES // f_all
            num_rows = max(table_size, max(heights))
            num_rows += (-num_rows) % slots
            offs = jnp.asarray(dense_offsets, d_idx.dtype)
            idx_all = jnp.concatenate([
                jnp.moveaxis(d_idx - offs[:, None], -2, 0).reshape(
                    num_dense, -1
                ),
                jnp.moveaxis(h_idx, -2, 0).reshape(num_hash, -1),
            ])
            w_all = jnp.concatenate([
                jnp.moveaxis(d_w, -2, 0).reshape(num_dense, -1),
                jnp.moveaxis(h_w, -2, 0).reshape(num_hash, -1),
            ])
            out = weighted_scatter(
                idx_all,
                w_all,
                jnp.moveaxis(ct_pm, -2, 0).reshape(num_levels, -1, f_all),
                num_rows=num_rows,
                f=f_all,
            )
            d_tables = jnp.concatenate(
                [out[li, : heights[li]] for li in range(num_dense)], axis=0
            )
            h_tables = out[num_dense:, :table_size]
        if num_dense and not merged:
            f_d = dense_pool.shape[-1]
            total = dense_pool.shape[0]
            slots = scatter_tpu.LANES // f_d
            pad_rows = (-total) % slots
            # Treat each (point, dense level) pair as one weighted point; the
            # flat-pool offsets are already folded into d_idx.
            d_tables = weighted_scatter(
                d_idx.reshape(1, -1),
                d_w.reshape(1, -1),
                ct_pm[..., :num_dense, :].reshape(1, -1, f_d),
                num_rows=total + pad_rows,
                f=f_d,
            )[0][:total]
        if num_hash and not merged:
            f_h = hash_tables.shape[-1]
            h_tables = weighted_scatter(
                jnp.moveaxis(h_idx, -2, 0).reshape(num_hash, -1),
                jnp.moveaxis(h_w, -2, 0).reshape(num_hash, -1),
                jnp.moveaxis(ct_pm[..., num_dense:, :], -2, 0).reshape(
                    num_hash, -1, f_h
                ),
                num_rows=table_size,
                f=f_h,
            )

        dx, dxs = _encode_input_grads(
            fwd_fn, x, hash_tables, dense_pool, x_scale, ct
        )
        return dx, h_tables, d_tables, dxs

    encode.defvjp(encode_fwd, encode_bwd)
    return encode


def _encode_input_grads(fwd_fn, x, hash_tables, dense_pool, x_scale, ct):
    """Gradients w.r.t. x and x_scale: recompute the forward with the tables
    held constant - its XLA backward is scatter-free. Dead-code elimination
    removes this entirely when dx/dx_scale are unused."""
    sg = jax.lax.stop_gradient
    if x_scale is None:
        _, pull = jax.vjp(
            lambda xx: fwd_fn(xx, sg(hash_tables), sg(dense_pool), None), x
        )
        (dx,) = pull(ct)
        return dx, None
    _, pull = jax.vjp(
        lambda xx, xs: fwd_fn(xx, sg(hash_tables), sg(dense_pool), xs),
        x,
        x_scale,
    )
    dx, dxs = pull(ct)
    return dx, dxs


def _scatter_tables_from_planes(x, x_scale, ct_planes, hash_tables, dense_pool,
                                grid_sizes, table_size, dense_offsets,
                                interpolation):
    """Table gradients via the plane-layout Pallas scatter.

    ct_planes: [L, F, P_total] per-point cotangent feature planes.
    Returns (d_tables [total_dense, F] | None, h_tables [Lh, T, F] | None).
    """
    from neural_radiance_caching_tpu.ops import scatter_tpu

    grid_sizes_np = np.asarray(grid_sizes)
    num_dense = len(dense_offsets)
    num_hash = len(grid_sizes_np) - num_dense
    corners_n = 8 if interpolation == "trilinear" else 4
    tile_points = 2048

    d_idx, d_w, h_idx, h_w = _tap_index_weight_planes(
        x, x_scale, grid_sizes_np, table_size, dense_offsets, interpolation
    )

    p_total = (d_idx if d_idx is not None else h_idx).shape[-1]
    pad_p = (-p_total) % tile_points

    def padded(t):
        # Padded updates carry zero weight and scatter into row 0.
        return jnp.pad(t, ((0, 0), (0, 0), (0, pad_p))) if pad_p else t

    def pack(planes):
        if pad_p:
            planes = jnp.pad(planes, ((0, 0), (0, 0), (0, pad_p)))
        return _pack_ct_planes(planes)

    d_tables = None
    h_tables = None
    merged = (
        num_dense and num_hash
        and dense_pool.shape[-1] == hash_tables.shape[-1]
    )
    if merged:
        # ONE kernel instance over all levels (see encode_bwd): dense levels
        # use local indices into full-height accumulators, sliced back after.
        f_all = hash_tables.shape[-1]
        heights = _dense_level_heights(dense_offsets, dense_pool.shape[0])
        slots = scatter_tpu.LANES // f_all
        num_rows = max(table_size, max(heights))
        num_rows += (-num_rows) % slots
        offs = jnp.asarray(dense_offsets, d_idx.dtype)
        out = scatter_tpu.scatter_add_weighted_planes(
            jnp.concatenate([padded(d_idx - offs[:, None, None]),
                             padded(h_idx)]),
            jnp.concatenate([padded(d_w), padded(h_w)]),
            pack(ct_planes),
            num_rows=num_rows, features=f_all, corners=corners_n,
            tile_points=tile_points,
        )
        d_tables = jnp.concatenate(
            [out[li, : heights[li]] for li in range(num_dense)], axis=0
        )
        h_tables = out[num_dense:, :table_size]
        return d_tables, h_tables

    if num_dense:
        f_d = dense_pool.shape[-1]
        total = dense_pool.shape[0]
        slots = scatter_tpu.LANES // f_d
        pad_rows = (-total) % slots
        per_level = scatter_tpu.scatter_add_weighted_planes(
            padded(d_idx), padded(d_w), pack(ct_planes[:num_dense]),
            num_rows=total + pad_rows, features=f_d, corners=corners_n,
            tile_points=tile_points,
        )
        # Dense levels occupy disjoint row ranges of the flat pool (offsets
        # folded into the indices), so the per-level results merge by sum.
        d_tables = per_level.sum(axis=0)[:total]

    if num_hash:
        f_h = hash_tables.shape[-1]
        h_tables = scatter_tpu.scatter_add_weighted_planes(
            padded(h_idx), padded(h_w), pack(ct_planes[num_dense:]),
            num_rows=table_size, features=f_h, corners=corners_n,
            tile_points=tile_points,
        )
    return d_tables, h_tables


_ENCODE_VJP_CACHE = {}

# Point-count threshold above which the 'mean' backward takes the plane-layout
# scatter (memory-safe at secondary-ray fan-outs) instead of the leveled
# kernel (faster per update at primary-ray scale; see encode_bwd).
_PLANES_MIN_POINTS = 1 << 20


def set_planes_min_points(value: int) -> None:
    """Override the planes-vs-leveled backward switchover point count."""
    global _PLANES_MIN_POINTS
    _PLANES_MIN_POINTS = int(value)


# Run-dedup for the leveled scatter backward: consecutive samples along a ray
# land in the SAME grid cell for most (level, tap) pairs (65% of all updates
# at flagship sample spacing — BASELINE.md round 3), and the serial kernel
# pays its full ~9-cycle issue cost for each. When enabled, encode_bwd
# pre-accumulates each run of equal-index updates with a capped segmented
# scan (XLA-side, exact) and the kernel statically skips the zero-weight
# remainder. Same sums, different association order (f32-tolerance exact).
_SCATTER_DEDUP = False
# Runs are force-broken every 2**_DEDUP_SCAN_STEPS elements so the capped
# Hillis-Steele scan stays exact regardless of true run lengths.
_DEDUP_SCAN_STEPS = 6


def set_scatter_dedup(value: bool) -> None:
    """Enable/disable run-dedup in the leveled scatter backward."""
    global _SCATTER_DEDUP
    _SCATTER_DEDUP = bool(value)


def _dedup_weighted_scatter(idx_l, w_l, ct_l, *, num_rows, f, corners, tile):
    """Run-deduplicated leveled scatter.

    idx_l/w_l: [L, P*U] (corners fastest); ct_l: [L, P, F]. Consecutive
    points sharing a tap index (same cell, same tap slot) have their
    w*ct contributions pre-accumulated onto the run's last element with a
    capped segmented scan; all other updates get weight 0 and the kernel
    skips them (skip_zero_w). The sums are identical to the direct scatter
    up to f32 association order. Streams one row per UPDATE (corners=1
    packing, `corners`x the row traffic) — a fraction of a millisecond of
    HBM time traded against ~9 serial kernel cycles per dead update.
    """
    from neural_radiance_caching_tpu.ops import scatter_tpu

    levels, p, _ = ct_l.shape
    idx3 = idx_l.reshape(levels, p, corners)
    w3 = w_l.reshape(levels, p, corners)
    v = w3[..., None] * ct_l[:, :, None, :]  # [L, P, U, F]

    same = jnp.concatenate(
        [
            jnp.zeros((levels, 1, corners), bool),
            idx3[:, 1:] == idx3[:, :-1],
        ],
        axis=1,
    )
    # Force a run break every 2**steps points so the capped scan is exact
    # for arbitrarily long runs (the broken tail just scatters separately).
    window = 1 << _DEDUP_SCAN_STEPS
    pos_break = (jnp.arange(p) % window) != 0
    same = same & pos_break[None, :, None]

    acc = v
    connected = same[..., None].astype(v.dtype)  # [L, P, U, 1]
    for k in range(_DEDUP_SCAN_STEPS):
        shift = 1 << k
        acc_prev = jnp.pad(acc, ((0, 0), (shift, 0), (0, 0), (0, 0)))[:, :p]
        conn_prev = jnp.pad(
            connected, ((0, 0), (shift, 0), (0, 0), (0, 0))
        )[:, :p]
        acc = acc + connected * acc_prev
        connected = connected * conn_prev
    # Run ENDS carry the full run sum; everything else is skipped.
    is_end = jnp.concatenate(
        [~same[:, 1:], jnp.ones((levels, 1, corners), bool)], axis=1
    )
    w_keep = is_end.reshape(levels, p * corners).astype(jnp.float32)
    rows = acc.reshape(levels, p * corners, f)

    n = p * corners
    pad_n = (-n) % tile
    idx_flat = idx_l
    if pad_n:
        idx_flat = jnp.pad(idx_flat, ((0, 0), (0, pad_n)))
        w_keep = jnp.pad(w_keep, ((0, 0), (0, pad_n)))
        rows = jnp.pad(rows, ((0, 0), (0, pad_n), (0, 0)))
    cp = rows.reshape(levels, -1, scatter_tpu.LANES)
    return scatter_tpu.scatter_add_weighted_leveled(
        idx_flat, w_keep, cp, num_rows=num_rows, features=f,
        corners=1, tile=tile, skip_zero_w=True,
    )

# Table orientation for the XLA-encoder gathers: 'features' (column gathers
# from feature-leading [F, rows] tables, plane outputs with the point axis
# minor) or 'rows' (contiguous row gathers from [rows, F] tables plus a
# boundary transpose). Static per-trace; see _multires_grid_encode_xla.
_GATHER_LAYOUT = "features"


def set_gather_layout(value: str) -> None:
    """Override the encoder gather orientation ('features' | 'rows')."""
    if value not in ("features", "rows"):
        raise ValueError(f"Unknown gather_layout {value!r}")
    global _GATHER_LAYOUT
    _GATHER_LAYOUT = value


# Hash-table gathers are HBM-latency-bound, not byte-bound (round-3
# gather_microbench: ~150-200M rows/s regardless of row width), EXCEPT at the
# largest merged-table instances where bf16 tables gather 1.34x faster (208 vs
# 156 M rows/s at [4, 2.6M] tables with Q=7.9M — the material-stage secondary
# fan-out). At small tables the bf16 emitter collapses (69 M rows/s on a
# 524k-row table), so the cast is gated on BOTH the per-take query count and
# the merged table row count. f32 master tables are unchanged: the cast is
# per-trace on the gather operand only, the Pallas scatter backward still
# accumulates f32 (the table grad is weights-only, so it is the exact
# gradient of the rounded forward), and the rounding itself is at the level
# the bf16 trunks consuming these features already apply.
_BF16_GATHER_MIN_Q = 4 * 1024 * 1024
_BF16_GATHER_MIN_ROWS = 2 * 1024 * 1024


def set_bf16_gather_min_q(value) -> None:
    """Override the bf16-gather query-count threshold (None disables)."""
    global _BF16_GATHER_MIN_Q
    _BF16_GATHER_MIN_Q = None if value is None else int(value)


# When True, multires_grid_encode always takes the pure-XLA path even on a
# process whose default backend is TPU. Needed when a computation is staged
# onto non-TPU devices (e.g. the forced-host CPU mesh used by multi-chip dry
# runs) while the TPU plugin is still the default platform.
_FORCE_XLA_ENCODER = False


def force_xla_encoder(value: bool = True) -> None:
    global _FORCE_XLA_ENCODER
    _FORCE_XLA_ENCODER = bool(value)


# Known-faulting MATERIAL-stage fan-outs on the v5e remote TPU runtime
# (BASELINE.md round-5 bisect): at batch 1024 (secondary fan-out 1024 x 32
# x 32 = 2^20 points) the train step crashes the worker regardless of
# which Pallas scatter kernel is selected, AND regardless of rerouting
# just the 2^20-point call to XLA (shape census showed it is the only
# large call, yet the mixed program still faults) — while the PURE-XLA
# program at the identical config trains cleanly. The guard is therefore
# program-level: launch sites call `guard_material_fanout(batch)` before
# building the material train step, which flips the whole encoder to the
# XLA path for the known-faulting batches. Neighboring batches (768,
# 1536 -> 3*2^k shapes everywhere) are validated on the kernel path.
_FAULTING_MATERIAL_FAN_OUTS = frozenset({1 << 20})


def pallas_backward_allowed(p_total: int) -> bool:
    """False for fan-out point counts in the known-faulting family.

    Kept as a diagnostic predicate (and for the shape census); the
    effective mitigation is `guard_material_fanout` below — per-call
    rerouting was measured insufficient.
    """
    return int(p_total) not in _FAULTING_MATERIAL_FAN_OUTS


def guard_material_fanout(batch_size: int, secondary: int = 32,
                          samples: int = 32) -> bool:
    """Force the pure-XLA encoder if this material fan-out is fault-listed.

    Returns True when the guard engaged. Call before building/compiling a
    material-stage train step; the XLA program at these configs is
    validated on-chip where the Pallas one crashes the worker.
    """
    fan_out = int(batch_size) * int(secondary) * int(samples)
    if fan_out in _FAULTING_MATERIAL_FAN_OUTS:
        print(
            f"[hashgrid] material fan-out {fan_out} (batch {batch_size}) is "
            "in the known v5e runtime-fault family -> forcing the pure-XLA "
            "encoder for this process (slower, but trains; BASELINE.md r5 "
            "bisect)",
            flush=True,
        )
        force_xla_encoder(True)
        return True
    return False


import contextlib


@contextlib.contextmanager
def xla_encoder_scope():
    """Force the pure-XLA encoder for calls traced inside this block.

    The Pallas scatter custom-VJP is first-order only: taking gradients
    THROUGH the backward (e.g. the analytic density-normals inner
    jax.vjp, whose outer loss then differentiates the normals) hits the
    pallas_call JVP rule and fails. XLA autodiff composes to any order.
    """
    global _FORCE_XLA_ENCODER
    prev = _FORCE_XLA_ENCODER
    _FORCE_XLA_ENCODER = True
    try:
        yield
    finally:
        _FORCE_XLA_ENCODER = prev


def multires_grid_encode(
    x,
    hash_tables,
    dense_pool,
    *,
    grid_sizes: Sequence[int],
    table_size: int,
    dense_offsets: Sequence[int],
    x_scale=None,
    multisample_reduce: Optional[str] = "mean",
    interpolation: str = "trilinear",
):
    """Public encoder: XLA forward; Pallas scatter backward on TPU.

    See _multires_grid_encode_xla for argument semantics. On non-TPU backends
    (and for reductions the kernel does not cover) the pure-XLA path with
    XLA's own autodiff is used.
    """
    grid_sizes = tuple(int(s) for s in np.asarray(grid_sizes).tolist())
    dense_offsets = tuple(int(o) for o in dense_offsets)
    on_tpu = jax.default_backend() == "tpu"
    p_total = int(np.prod(x.shape[:-1], dtype=np.int64))
    import os as _os

    if _os.environ.get("NRC_LOG_ENCODER_SHAPES"):
        # Trace-time shape census (host print, once per compile): which
        # encoder calls exist at a given config and which take the Pallas
        # backward. Used to localize batch-shape-specific runtime faults
        # without burning chip time (BASELINE.md round-5 bisect).
        print(
            f"[encoder] x={tuple(x.shape)} p_total={p_total} "
            f"reduce={multisample_reduce} levels={len(grid_sizes)} "
            f"pallas_ok={pallas_backward_allowed(p_total)}",
            flush=True,
        )
    use_kernel = (
        not _FORCE_XLA_ENCODER
        and on_tpu
        and multisample_reduce in ("mean", "concat")
        and (hash_tables is None or LANES_OK(hash_tables.shape[-1]))
        and (dense_pool is None or LANES_OK(dense_pool.shape[-1]))
    )
    # Shape-gated bf16 gather operand (see _BF16_GATHER_MIN_Q): the per-take
    # query count is num_hash_levels * points (one take per tap, all levels
    # batched), and the merged table must be large enough that the bf16
    # emitter's big-shape advantage applies.
    hash_gather_dtype = None
    if (
        on_tpu
        and _BF16_GATHER_MIN_Q is not None
        and hash_tables is not None
    ):
        num_hash = len(grid_sizes) - len(dense_offsets)
        points = int(np.prod(x.shape[:-2], dtype=np.int64)) if x.shape[:-2] else 1
        merged_rows = num_hash * int(table_size)
        if (
            num_hash * points >= _BF16_GATHER_MIN_Q
            and merged_rows >= _BF16_GATHER_MIN_ROWS
            and hash_tables.dtype == jnp.float32
        ):
            hash_gather_dtype = "bfloat16"
    if not use_kernel:
        out = _multires_grid_encode_xla(
            x,
            hash_tables,
            dense_pool,
            grid_sizes=grid_sizes,
            table_size=table_size,
            dense_offsets=dense_offsets,
            x_scale=x_scale,
            multisample_reduce=multisample_reduce,
            interpolation=interpolation,
            gather_layout=_GATHER_LAYOUT,
            hash_gather_dtype=hash_gather_dtype,
        )
    else:
        statics = (grid_sizes, table_size, dense_offsets, multisample_reduce,
                   interpolation, _GATHER_LAYOUT, hash_gather_dtype)
        if statics not in _ENCODE_VJP_CACHE:
            _ENCODE_VJP_CACHE[statics] = _make_encode_vjp(statics)
        out = _ENCODE_VJP_CACHE[statics](x, hash_tables, dense_pool, x_scale)
    # Remat tag: under `jax.checkpoint(..., policy=remat_policy())` (see
    # parallel/train.py) encoder outputs are saved residuals, so the gather
    # forward is never re-executed in the backward pass and the Pallas
    # scatter VJP runs exactly once.
    from jax import ad_checkpoint

    return ad_checkpoint.checkpoint_name(out, "grid_encode")


def LANES_OK(f):
    from neural_radiance_caching_tpu.ops import scatter_tpu

    return scatter_tpu.LANES % int(f) == 0


def reference_hash_encode_level(table, locations):
    """Single-level trilinear hash lookup exactly as the reference computes it.

    Used only by parity tests: a direct transcription of the semantics of
    grid_utils.jax_hash_resample_3d (grid_utils.py:41-121) against which the
    fused encoder is verified.
    """
    locations = locations - 0.5
    floored = jnp.floor(locations)
    frac = locations - floored
    out = 0.0
    for corner in _CORNERS:
        pos = (floored + corner).astype(jnp.int32).astype(jnp.uint32)
        idx = (pos[..., 0] ^ (pos[..., 1] * _PI2) ^ (pos[..., 2] * _PI3)) % np.uint32(
            table.shape[0]
        )
        w = 1.0
        for a in range(3):
            w = w * (frac[..., a] if corner[a] else (1 - frac[..., a]))
        out = out + table[idx.astype(jnp.int32)] * w[..., None]
    return out
