"""Ray casting, alpha compositing, and (transient) volumetric rendering.

Behavioral parity targets: reference internal/render.py (Gaussian lifting
:26-131, compute_alpha_weights :134-169, volumetric_rendering :172-247,
volumetric_transient_rendering :250-449).

TPU-first deltas from the reference:
  * Direct-pulse time binning (reference `shift_direct`, render.py:452-490,
    a flat `.at[idx].add` scatter over rays*samples) is implemented as a
    dense one-hot matmul over the bin axis: each (ray, sample) contributes
    linear-interpolation weights to two adjacent bins, expressed as
    sample-x-bin weight matrices contracted on the MXU. No scatters.
  * Indirect time shifting (reference `shift_map_coordinates`,
    render.py:493-507, a map_coordinates gather) fused with the weighted
    sample integration (:379-393) in the Fourier domain: per-sample
    fractional shifts become phase ramps, so the whole shift+reduce is
    FFTs and elementwise math instead of a rays*samples*bins gather
    (forward) and scatter-add (backward). `shift_transient` keeps the
    two-tap gather form for the standalone/vis path and as the A/B
    reference for the spectral path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.ops import stepfun


# --- Ray → Gaussian lifting -------------------------------------------------


def lift_gaussian(d, t_mean, t_var, r_var, diag):
    """Lift a 1D Gaussian along ray direction d into 3D mean/cov."""
    mean = d[..., None, :] * t_mean[..., None]
    d_mag_sq = jnp.maximum(1e-10, jnp.sum(d**2, axis=-1, keepdims=True))
    if diag:
        d_outer_diag = d**2
        null_outer_diag = 1 - d_outer_diag / d_mag_sq
        cov_diag = (
            t_var[..., None] * d_outer_diag[..., None, :]
            + r_var[..., None] * null_outer_diag[..., None, :]
        )
        return mean, cov_diag
    d_outer = d[..., :, None] * d[..., None, :]
    eye = jnp.eye(d.shape[-1])
    null_outer = eye - d[..., :, None] * (d / d_mag_sq)[..., None, :]
    cov = (
        t_var[..., None, None] * d_outer[..., None, :, :]
        + r_var[..., None, None] * null_outer[..., None, :, :]
    )
    return mean, cov


def gaussianize_frustum(t0, t1):
    """Stable mean/variance of a conical frustum (arxiv/2103.13415 Eq. 7)."""
    s = t0 + t1
    d = t1 - t0
    eps = np.finfo(np.float32).eps ** 2
    ratio = d**2 / jnp.maximum(eps, 3 * s**2 + d**2)
    t_mean = s * (1 / 2 + ratio)
    t_var = (1 / 12) * d**2 - (1 / 15) * ratio**2 * (12 * s**2 - d**2)
    r_var = (1 / 16) * s**2 + d**2 * (5 / 48 - (1 / 15) * ratio)
    return t_mean, t_var, r_var


def conical_frustum_to_gaussian(d, t0, t1, base_radius, diag):
    t_mean, t_var, r_var = gaussianize_frustum(t0, t1)
    r_var = r_var * base_radius**2
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cylinder_to_gaussian(d, t0, t1, radius, diag):
    t_mean = (t0 + t1) / 2
    r_var = radius**2 / 4
    t_var = (t1 - t0) ** 2 / 12
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cast_rays(tdist, origins, directions, radii, ray_shape, diag=True):
    """Turn ray intervals into per-sample Gaussians (means, covs)."""
    t0, t1 = tdist[..., :-1], tdist[..., 1:]
    if ray_shape == "cone":
        gaussian_fn = conical_frustum_to_gaussian
    elif ray_shape == "cylinder":
        gaussian_fn = cylinder_to_gaussian
    else:
        raise ValueError("ray_shape must be 'cone' or 'cylinder'")
    means, covs = gaussian_fn(directions, t0, t1, radii, diag)
    return means + origins[..., None, :], covs


# --- Alpha compositing ------------------------------------------------------


def compute_alpha_weights(density, tdist, dirs, opaque_background=False, delta=None):
    """Per-sample compositing weights w = alpha * transmittance."""
    if delta is None:
        t_delta = tdist[..., 1:] - tdist[..., :-1]
        delta = t_delta * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    density_delta = density * jnp.abs(delta)

    if opaque_background:
        density_delta = jnp.concatenate(
            [density_delta[..., :-1], jnp.full_like(density_delta[..., -1:], jnp.inf)],
            axis=-1,
        )

    alpha = 1 - jnp.exp(-density_delta)
    trans = jnp.exp(
        -jnp.concatenate(
            [jnp.zeros_like(density_delta[..., :1]), jnp.cumsum(density_delta[..., :-1], axis=-1)],
            axis=-1,
        )
    )
    weights = alpha * trans
    return weights, alpha, trans


# --- Steady-state rendering -------------------------------------------------


def volumetric_rendering(
    rgbs,
    weights,
    weights_no_filter,
    tdist,
    bg_rgbs,
    compute_extras,
    extras=None,
    normalize_weights_for_extras=False,
    percentiles=(5, 50, 95),
    compute_distance=True,
):
    """Composite per-sample values into per-ray buffers (render.py:172-247).

    `weights` may be the resampled-estimator weights while `weights_no_filter`
    carries the full unfiltered weights used for acc/depth statistics.
    """
    eps = np.finfo(np.float32).eps
    rendering = {}

    acc = weights_no_filter.sum(axis=-1)
    bg_w = jnp.maximum(0, 1 - acc[..., None])

    rendering["rgb"] = (
        (weights[..., None] * rgbs).sum(axis=-2) + bg_w * bg_rgbs if rgbs is not None else None
    )
    rendering["acc"] = acc

    weights_norm = weights / jnp.maximum(eps, acc[..., None])
    weights_norm_no_filter = weights_no_filter / jnp.maximum(eps, acc[..., None])

    if extras is not None:
        w_ex = weights_norm if normalize_weights_for_extras else weights
        for k, v in extras.items():
            if v is not None:
                rendering[k] = (w_ex[..., None] * v).sum(axis=-2)

    if compute_distance:
        expectation = lambda x: (weights_no_filter * x).sum(axis=-1) / jnp.maximum(eps, acc)
        t_mids = 0.5 * (tdist[..., :-1] + tdist[..., 1:])
        # Log-space distance mean for numerical stability.
        rendering["distance_mean"] = jnp.clip(
            jnp.nan_to_num(jnp.exp(expectation(jnp.log(t_mids))), jnp.inf),
            tdist[..., 0],
            tdist[..., -1],
        )
        distance_percentiles = stepfun.weighted_percentile(
            tdist, weights_norm_no_filter, percentiles
        )
        for i, p in enumerate(percentiles):
            s = "median" if p == 50 else "percentile_" + str(p)
            rendering["distance_" + s] = distance_percentiles[..., i]

    return rendering


# --- Transient (time-resolved) rendering ------------------------------------


def bin_direct_pulses(dists_in_bins, direct_rgbs, weights, n_bins):
    """Scatter direct-pulse energy into time bins, MXU-style.

    For each (ray, sample) with fractional arrival bin d, adds
    w * rgb * (1 - frac) to bin floor(d) and w * rgb * frac to bin ceil(d).
    Implemented as a dense [S, n_bins] two-tap weight matrix per ray
    contracted against the [S, C] colors: a batched matmul instead of the
    reference's flat scatter-add (render.py:452-490).

    Args:
      dists_in_bins: [R, S] arrival times in units of bins (already includes
        any shift), may be fractional.
      direct_rgbs: [R, S, C] per-sample colors.
      weights: [R, S] compositing weights.
      n_bins: static number of time bins.

    Returns:
      [R, n_bins, C] binned transients.
    """
    lo = jnp.maximum(jnp.floor(dists_in_bins), 0)
    hi = jnp.ceil(dists_in_bins)
    w_hi = dists_in_bins - lo
    w_lo = 1.0 - w_hi

    bins = jnp.arange(n_bins, dtype=dists_in_bins.dtype)
    # [R, S, n_bins] two-tap interpolation matrix. Out-of-range taps vanish
    # because no bin index matches.
    taps = w_lo[..., None] * (bins == lo[..., None]) + w_hi[..., None] * (bins == hi[..., None])
    weighted_rgb = weights[..., None] * direct_rgbs  # [R, S, C]
    # [R, n_bins, S] @ [R, S, C] -> [R, n_bins, C]; dense contraction on MXU.
    return jnp.einsum(
        "rsb,rsc->rbc", taps, weighted_rgb, precision=jax.lax.Precision.HIGHEST
    )


def shift_transient(transient, bins_move, n_bins):
    """Shift each transient later in time by a fractional number of bins.

    Equivalent to the reference's map_coordinates resample at coordinates
    (bin − bins_move) with linear interpolation and zero padding
    (render.py:493-507), expressed as a two-tap combination of two integer
    rolls so XLA lowers it to dynamic slices instead of gathers.

    Args:
      transient: [N, n_bins, C].
      bins_move: [N] fractional shift (in bins) to apply.
      n_bins: static number of bins.

    Returns:
      [N, n_bins, C] shifted transients.
    """
    lo = jnp.floor(bins_move)
    frac = (bins_move - lo)[..., None, None]
    bins = jnp.arange(n_bins)
    # Source index for tap k is bin - (lo + k); mask handles zero padding.
    src0 = bins[None, :] - lo[..., None].astype(jnp.int32)
    src1 = src0 - 1
    valid0 = (src0 >= 0) & (src0 < n_bins)
    valid1 = (src1 >= 0) & (src1 < n_bins)
    g0 = jnp.take_along_axis(transient, jnp.clip(src0, 0, n_bins - 1)[..., None], axis=-2)
    g1 = jnp.take_along_axis(transient, jnp.clip(src1, 0, n_bins - 1)[..., None], axis=-2)
    return (1 - frac) * jnp.where(valid0[..., None], g0, 0) + frac * jnp.where(
        valid1[..., None], g1, 0
    )


_FFT_TRANSIENT_SHIFT = None  # None = auto: spectral on TPU, two-tap gather elsewhere
# "matmul" (DFT as dense matmuls on the MXU) | "fft" (native XLA Fft HLO).
# Matmul is the measured default: at 700 bins it runs the minimal alias-free
# DFT length (1402 vs the Fft's pow-2 2048) with no layout-constrained custom
# call — 122.7 vs 215.7 ms/step on v5e (BASELINE.md round-3 A/B).
_SPECTRAL_BACKEND = "matmul"


def set_fft_transient_shift(enabled):
    """Toggle the FFT formulation of the indirect transient shift (A/B knob).

    Pass None to restore the automatic platform default: the spectral path
    on TPU (where the 45M-row gather/scatter is 42.7x slower, BASELINE.md),
    the two-tap gather path elsewhere (measured ~2x faster than the FFT on
    this host's CPU — XLA:CPU handles the gather fine and its Fft doesn't
    amortize).
    """
    global _FFT_TRANSIENT_SHIFT
    _FFT_TRANSIENT_SHIFT = None if enabled is None else bool(enabled)


def _use_fft_shift():
    if _FFT_TRANSIENT_SHIFT is None:
        return jax.default_backend() == "tpu"
    return _FFT_TRANSIENT_SHIFT


def set_spectral_backend(name):
    """Select how the transient shift's forward/inverse DFT is computed.

    "fft" lowers to the native XLA Fft HLO; "matmul" evaluates the real DFT
    as two dense [bins, freqs] matmuls (and the inverse as their transposes),
    which rides the MXU — the faster choice if the backend's Fft lowering is
    slow for these shapes (an on-chip A/B knob, exact to f32 matmul rounding).
    """
    global _SPECTRAL_BACKEND
    if name not in ("fft", "matmul"):
        raise ValueError(f"unknown spectral backend {name!r}")
    _SPECTRAL_BACKEND = name


def _rdft_matrices(n_in, length, dtype=jnp.float32):
    """Real-DFT basis: [n_in, F] cos/sin matrices for zero-padded inputs."""
    b = np.arange(n_in)[:, None]
    f = np.arange(length // 2 + 1)[None, :]
    ang = 2.0 * np.pi * b * f / length
    return jnp.asarray(np.cos(ang), dtype), jnp.asarray(-np.sin(ang), dtype)


def _irdft_matrices(length, n_out, dtype=jnp.float32):
    """Inverse real-DFT basis: [F, n_out] matrices st. x = Xr@Cr + Xi@Ci.

    Standard irfft with hermitian symmetry folded in: interior frequencies
    count twice, DC and (even-length) Nyquist once.
    """
    n_freqs = length // 2 + 1
    f = np.arange(n_freqs)[:, None]
    b = np.arange(n_out)[None, :]
    ang = 2.0 * np.pi * f * b / length
    scale = np.full((n_freqs, 1), 2.0 / length)
    scale[0] = 1.0 / length
    if length % 2 == 0:
        scale[-1] = 1.0 / length
    return (
        jnp.asarray(scale * np.cos(ang), dtype),
        jnp.asarray(-scale * np.sin(ang), dtype),
    )


def shift_and_integrate_transient(transient, bins_move, weights, n_bins):
    """Fused shift_transient + weighted sum over samples, without gathers.

    Computes sum_s weights[r, s] * shift_transient(transient[r, s], bins_move[r, s])
    for the per-sample indirect transients (reference render.py:493-507 followed
    by the weighted reduction at :379-393), but expressed in the Fourier domain:
    a per-row shift by a constant offset is a circular convolution with a
    two-tap kernel, whose DFT is a phase ramp. So

        out[r] = irfft( sum_s w[r,s] * rfft(T_pad)[r,s] * phase(delta[r,s]) )

    with zero-padding to L >= 2*n_bins + 2 making the circular convolution
    exact for the [0, n_bins) output window over the full physically-possible
    shift range (shifts beyond +-n_bins already produce all-zero windows, and
    the clamp below keeps them in the alias-free band). This replaces the
    take_along_axis pair whose forward is a 45M-row gather and whose backward
    is a 45M-row scatter-add -- 94% of the transient train step on TPU. The
    backward here is FFTs and elementwise math: the d/d(bins_move) gradient
    flows through the fractional tap exactly as in the two-tap interpolation
    (d phase/d delta = base * (e^{-i w} - 1), the Fourier transform of
    T[b-lo-1] - T[b-lo]).

    Args:
      transient: [R, S, n_bins, C] per-sample stored transients.
      bins_move: [R, S] (or [R*S]) fractional shift in bins per sample.
      weights: [R, S] compositing weights.
      n_bins: static number of bins.

    Returns:
      [R, n_bins, C] integrated shifted transients.
    """
    r, s, b, c = transient.shape
    assert b == n_bins
    if _SPECTRAL_BACKEND == "fft":
        # Next pow2 >= 2*n_bins + 2: XLA's Fft custom call wants pow2 lengths.
        length = 1 << int(2 * n_bins + 1).bit_length()
    else:
        # The dense-DFT matmuls have no length preference, so use the minimal
        # alias-free padding (700 bins: 1402 vs 2048 -> 1.46x fewer freqs).
        length = 2 * n_bins + 2
    half = length - n_bins  # alias-free shift magnitude bound (> n_bins)
    delta = jnp.clip(bins_move.reshape(r, s), -(half - 1.0), half - 2.0)
    lo = jnp.floor(delta)
    frac = delta - lo

    # Weighted per-sample phase ramp, as real/imag parts [R, S, F]:
    # wphase = w * exp(-i w_f lo) * ((1 - frac) + frac * exp(-i w_f)).
    freqs = jnp.arange(length // 2 + 1, dtype=jnp.float32) * (2.0 * jnp.pi / length)
    ang = -freqs[None, None, :] * lo[..., None]  # [R, S, F]
    br, bi = jnp.cos(ang), jnp.sin(ang)
    fr = frac[..., None]
    tr = (1.0 - fr) + fr * jnp.cos(freqs)[None, None, :]
    ti = -fr * jnp.sin(freqs)[None, None, :]
    wt = weights[..., None]
    pr = (br * tr - bi * ti) * wt
    pi = (br * ti + bi * tr) * wt

    t = jnp.moveaxis(transient.astype(jnp.float32), -2, -1)  # [R, S, C, B]
    if _SPECTRAL_BACKEND == "fft":
        ft = jnp.fft.rfft(t, n=length, axis=-1)  # [R, S, C, F]
        wphase = jax.lax.complex(pr, pi)
        acc = (ft * wphase[:, :, None, :]).sum(axis=1)  # [R, C, F]
        out = jnp.fft.irfft(acc, n=length, axis=-1)[..., :n_bins]
    else:
        # Real DFT as dense matmuls on the MXU (exact up to f32 rounding).
        hp = jax.lax.Precision.HIGHEST
        dc, ds = _rdft_matrices(n_bins, length)
        ftr = jnp.einsum("rscb,bf->rscf", t, dc, precision=hp)
        fti = jnp.einsum("rscb,bf->rscf", t, ds, precision=hp)
        accr = (ftr * pr[:, :, None, :] - fti * pi[:, :, None, :]).sum(axis=1)
        acci = (ftr * pi[:, :, None, :] + fti * pr[:, :, None, :]).sum(axis=1)
        icr, ici = _irdft_matrices(length, n_bins)
        out = jnp.einsum("rcf,fb->rcb", accr, icr, precision=hp) + jnp.einsum(
            "rcf,fb->rcb", acci, ici, precision=hp
        )
    return jnp.moveaxis(out, -1, -2).astype(transient.dtype)  # [R, n_bins, C]


def _gaussian_filter(tfilter_sigma, dtype=jnp.float32):
    taps = jnp.arange(round(-4 * tfilter_sigma), round(4 * tfilter_sigma) + 1, dtype=dtype)
    f = jnp.exp(-(taps**2) / (2 * tfilter_sigma**2)) - np.exp(-8)
    return f / f.sum()


def volumetric_transient_rendering(
    direct_rgbs,
    transient_indirect,
    weights,
    weights_no_filter,
    tdist,
    bg_rgbs,
    compute_extras,
    extras=None,
    normalize_weights_for_extras=False,
    percentiles=(5, 50, 95),
    compute_distance=True,
    n_bins=700,
    shift=0.0,
    dark_level=0.0,
    impulse_response=None,
    tfilter_sigma=0.0,
    exposure_time=0.01,
    filter_indirect=False,
    filter_median=False,
    filter_median_thresh=0.0,
    no_shift_direct=False,
    itof=False,
):
    """Time-resolved volume rendering (reference render.py:250-449).

    Direct light arrives after (light→point) + (point→camera) travel and is
    splatted as a pulse; indirect light is a per-sample stored transient
    shifted by the point→camera distance. Both are composited with the
    sample weights and optionally convolved with an impulse response.
    """
    eps = np.finfo(np.float32).eps
    rendering = {}
    acc = weights_no_filter.sum(axis=-1)

    weights_norm = weights / jnp.maximum(eps, acc[..., None])
    weights_norm_no_filter = weights_no_filter / jnp.maximum(eps, acc[..., None])

    if extras is not None:
        for k, v in extras.items():
            if v is None:
                continue
            if len(v.shape) == len(weights.shape) + 2:
                w_ex = weights_norm if normalize_weights_for_extras else weights
                rendering[k] = (w_ex[..., None, None] * v).sum(axis=-3)
            else:
                w_ex = weights_norm if normalize_weights_for_extras else weights
                rendering[k] = (w_ex[..., None] * v).sum(axis=-2)

    # Distance statistics (same as steady-state path).
    expectation = lambda x: (weights_no_filter * x).sum(axis=-1) / jnp.maximum(eps, acc)
    t_mids = 0.5 * (tdist[..., :-1] + tdist[..., 1:])
    rendering["distance_mean"] = jnp.clip(
        jnp.nan_to_num(jnp.exp(expectation(jnp.log(t_mids))), jnp.inf),
        tdist[..., 0],
        tdist[..., -1],
    )
    distance_percentiles = stepfun.weighted_percentile(tdist, weights_norm_no_filter, percentiles)
    for i, p in enumerate(percentiles):
        s = "median" if p == 50 else "percentile_" + str(p)
        rendering["distance_" + s] = distance_percentiles[..., i]

    num_rgb_channels = direct_rgbs.shape[-1]
    n_samples = weights.shape[-1]

    flat_shape = (-1, n_samples)
    weights_sq = weights.reshape(flat_shape)
    n_rays = weights_sq.shape[0]
    dists_ray = extras["ray_dists"].reshape(n_rays, n_samples)
    dists_light = extras["light_dists"].reshape(n_rays, n_samples)
    dists_direct = dists_light + dists_ray
    dists_indirect = dists_ray.reshape(-1)

    # Median-depth filtering: drop samples in front of the median surface.
    if filter_median and transient_indirect is not None:
        distance_median = rendering["distance_median"].reshape(n_rays, 1)
        effective_depth = dists_ray + filter_median_thresh * exposure_time
        weights_sq = jnp.where(effective_depth < distance_median, 0.0, weights_sq)
        weights_sq = weights_sq / (weights_sq.sum(axis=-1, keepdims=True) + 1e-5)

    # Optional removal of the per-sample camera-distance shift at vis time.
    if no_shift_direct:
        direct_offset = dists_ray
        indirect_offset = dists_indirect
    else:
        direct_offset = 0.0
        indirect_offset = 0.0

    direct_rgbs_sq = direct_rgbs.reshape(n_rays, n_samples, num_rgb_channels)
    direct_bins = (dists_direct + shift - direct_offset) / exposure_time
    transient_direct = bin_direct_pulses(direct_bins, direct_rgbs_sq, weights_sq, n_bins)

    if transient_indirect is not None:
        ti = transient_indirect.reshape(n_rays, n_samples, n_bins, num_rgb_channels)
        bins_move = (dists_indirect + shift - indirect_offset) / exposure_time
        if _use_fft_shift():
            transient_indirect_out = shift_and_integrate_transient(
                ti, bins_move.reshape(n_rays, n_samples), weights_sq, n_bins
            )
        else:
            ti = shift_transient(
                ti.reshape(n_rays * n_samples, n_bins, num_rgb_channels), bins_move, n_bins
            ).reshape(n_rays, n_samples, n_bins, num_rgb_channels)
            transient_indirect_out = (ti * weights_sq[..., None, None]).sum(1)
        rendering["transient_indirect_no_integration"] = extras["transient_indirect"]
    else:
        transient_indirect_out = jnp.zeros((n_rays, n_bins, num_rgb_channels))

    transient_direct_no_filter = transient_direct
    transient_indirect_no_filter = transient_indirect_out

    if impulse_response is not None or tfilter_sigma != 0.0:
        filt = impulse_response if impulse_response is not None else _gaussian_filter(tfilter_sigma)
        conv = lambda x: jax.scipy.signal.convolve(x, filt[None, :, None], mode="same")
        transient_direct = conv(transient_direct)
        if filter_indirect:
            transient_indirect_out = conv(transient_indirect_out)

    integrated_shape = weights.shape[:-1]
    transient_direct = transient_direct.reshape(integrated_shape + transient_direct.shape[-2:])
    transient_indirect_out = transient_indirect_out.reshape(
        integrated_shape + transient_indirect_out.shape[-2:]
    )

    rendering["transient_direct_viz"] = transient_direct + dark_level
    rendering["transient_indirect_viz"] = transient_indirect_out
    rendering["dists"] = direct_bins
    rendering["weights"] = weights_sq
    rendering["direct_rgb_viz"] = direct_rgbs_sq.sum(-2)
    rendering["rgb"] = transient_direct + transient_indirect_out + dark_level
    rendering["acc"] = acc
    rendering["direct_rgb"] = transient_direct.sum(-2)
    rendering["indirect_rgb"] = transient_indirect_out.sum(-2)
    rendering["integrated_rgb"] = rendering["rgb"].sum(-2)
    rendering["transient_indirect"] = transient_indirect_out
    rendering["transient_direct"] = transient_direct
    rendering["transient_indirect_no_filter"] = transient_indirect_no_filter
    rendering["transient_direct_no_filter"] = transient_direct_no_filter
    return rendering
