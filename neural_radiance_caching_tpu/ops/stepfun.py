"""Piecewise-constant step-function toolkit (resampling, dilation, losses).

Behavioral parity targets: reference internal/stepfun.py. Conventions match:
`t` are the N+1 bin endpoints, `w` N bin weights summing to <= 1, `p` a PDF
integrating to <= 1, `y`/logits unconstrained bin values.

All resampling is inverse-CDF with the TPU-friendly dense mask-reduction
lookup from ops.math (no searchsorted gathers inside the hot sampler loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.ops import math


def check_stepfun(t, y):
    if t.shape[-1] != y.shape[-1] + 1:
        raise ValueError(f"Invalid stepfun shapes ({t.shape}, {y.shape}).")


def query(tq, t, y, outside_value=0):
    """Evaluate step function (t, y) at query positions tq."""
    check_stepfun(t, y)
    idx_lo, idx_hi = math.searchsorted(t, tq)
    yq = jnp.take_along_axis(y, jnp.minimum(idx_lo, y.shape[-1] - 1), axis=-1)
    return jnp.where(idx_lo == idx_hi, outside_value, yq)


def weight_to_pdf(t, w):
    """Weights (sum to 1) → PDF (integrates to 1)."""
    check_stepfun(t, w)
    td = jnp.diff(t)
    return jnp.where(td < np.finfo(np.float32).tiny, 0, math.safe_div(w, td))


def pdf_to_weight(t, p):
    check_stepfun(t, p)
    return p * jnp.diff(t)


def integrate_weights(w):
    """CDF at the N+1 endpoints of a weight vector that sums to 1.

    Endpoint values are pinned to exactly 0 and 1 (stepfun.py:125-144).
    """
    cw = jnp.minimum(1, jnp.cumsum(w[..., :-1], axis=-1))
    pad = cw.shape[:-1] + (1,)
    return jnp.concatenate([jnp.zeros(pad), cw, jnp.ones(pad)], axis=-1)


def invert_cdf(u, t, w_logits):
    """Inverse-CDF lookup of u in the step function defined by (t, softmax(w))."""
    check_stepfun(t, w_logits)
    w = jax.nn.softmax(w_logits, axis=-1)
    cw = integrate_weights(w)
    return math.sorted_interp(u, cw, t)


def sample(
    rng,
    t,
    w_logits,
    num_samples,
    single_jitter=False,
    deterministic_center=False,
    eps=np.finfo(np.float32).eps,
):
    """Draw point samples from a step-function PDF (stepfun.py:158-204).

    With rng=None, returns a deterministic linspace over the inverse CDF;
    `single_jitter` shares one jitter across all samples of a ray.
    """
    check_stepfun(t, w_logits)
    if rng is None:
        if deterministic_center:
            pad = 1 / (2 * num_samples)
            u = jnp.linspace(pad, 1.0 - pad - eps, num_samples)
        else:
            u = jnp.linspace(0, 1.0 - eps, num_samples)
        u = jnp.broadcast_to(u, t.shape[:-1] + (num_samples,))
    else:
        # Stratified draw over [0, 1): evenly spaced anchors, each jittered
        # uniformly within a stratum sized so neighbours can never cross
        # (strata stop eps short of touching). The last anchor sits at
        # 1 - eps - (1-eps)/N so its stratum also stays below 1.
        span = 1.0 - (eps + (1.0 - eps) / num_samples)
        stride = span / (num_samples - 1)
        anchors = stride * jnp.arange(num_samples)
        jitter_shape = t.shape[:-1] + ((1,) if single_jitter else (num_samples,))
        u = anchors + jax.random.uniform(rng, jitter_shape, maxval=stride - eps)
    return invert_cdf(u, t, w_logits)


def sample_intervals(
    rng,
    t,
    w_logits,
    num_samples,
    single_jitter=False,
    domain=(-jnp.inf, jnp.inf),
):
    """Sample N intervals (N+1 sorted fenceposts) from a step-function PDF.

    Centers are sampled, then fenceposts span adjacent-center midpoints with
    reflected first/last endpoints (stepfun.py:207-250).
    """
    check_stepfun(t, w_logits)
    if num_samples <= 1:
        raise ValueError(f"num_samples must be > 1, is {num_samples}.")
    centers = sample(rng, t, w_logits, num_samples, single_jitter, deterministic_center=True)
    mid = (centers[..., 1:] + centers[..., :-1]) / 2
    first = 2 * centers[..., :1] - mid[..., :1]
    last = 2 * centers[..., -1:] - mid[..., -1:]
    fence = jnp.concatenate([first, mid, last], axis=-1)
    return jnp.sort(jnp.clip(fence, *domain), axis=-1)


def max_dilate(t, w, dilation, domain=(-jnp.inf, jnp.inf)):
    """Max-pool dilation of a non-negative step function (stepfun.py:88-104)."""
    check_stepfun(t, w)
    t0 = t[..., :-1] - dilation
    t1 = t[..., 1:] + dilation
    t_d = jnp.sort(jnp.concatenate([t, t0, t1], axis=-1), axis=-1)
    t_d = jnp.clip(t_d, *domain)
    covered = (t0[..., None, :] <= t_d[..., None]) & (t1[..., None, :] > t_d[..., None])
    w_d = jnp.max(jnp.where(covered, w[..., None, :], 0), axis=-1)[..., :-1]
    return t_d, w_d


def max_dilate_weights(
    t,
    w,
    dilation,
    domain=(-jnp.inf, jnp.inf),
    renormalize=False,
    eps=np.finfo(np.float32).eps ** 2,
):
    """Dilate weights via the PDF domain (stepfun.py:107-122)."""
    check_stepfun(t, w)
    p = weight_to_pdf(t, w)
    t_d, p_d = max_dilate(t, p, dilation, domain=domain)
    w_d = pdf_to_weight(t_d, p_d)
    if renormalize:
        w_d /= jnp.maximum(eps, jnp.sum(w_d, axis=-1, keepdims=True))
    return t_d, w_d


def lossfun_distortion(t, w, normalize=False):
    """mip-NeRF 360 distortion: ∬ w_i w_j |t_i − t_j| (stepfun.py:253-269)."""
    check_stepfun(t, w)
    if normalize:
        w = w + np.finfo(np.float32).eps ** 2
        w = w / jnp.sum(w, axis=-1, keepdims=True)
    ut = (t[..., 1:] + t[..., :-1]) / 2
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(w**2 * jnp.diff(t), axis=-1) / 3
    return loss_inter + loss_intra


def interval_distortion(t0_lo, t0_hi, t1_lo, t1_hi):
    """mean(|x−y|) for x ∈ [t0_lo, t0_hi], y ∈ [t1_lo, t1_hi].

    Disjoint intervals reduce to the midpoint distance; overlapping ones use
    the closed form of the double integral (an overlap cube term plus the
    four endpoint cross products), normalized by the joint area.
    """
    mid_gap = jnp.abs(0.5 * (t1_lo + t1_hi) - 0.5 * (t0_lo + t0_hi))
    cube = jnp.minimum(t0_hi, t1_hi) ** 3 - jnp.maximum(t0_lo, t1_lo) ** 3
    cross = (
        t1_hi * t0_hi * jnp.abs(t1_hi - t0_hi)
        + t1_lo * t0_lo * jnp.abs(t1_lo - t0_lo)
        - t1_hi * t0_lo * (t1_hi - t0_lo)
        - t1_lo * t0_hi * (t0_hi - t1_lo)
    )
    area = (t0_hi - t0_lo) * (t1_hi - t1_lo)
    disjoint = (t0_lo > t1_hi) | (t1_lo > t0_hi)
    return jnp.where(disjoint, mid_gap, (2.0 * cube + 3.0 * cross) / (6.0 * area))


def weighted_percentile(t, w, ps):
    """Percentiles of a step function; w must sum to 1 (stepfun.py:306-314)."""
    check_stepfun(t, w)
    cw = integrate_weights(w)
    qs = jnp.broadcast_to(jnp.array(ps, dtype=t.dtype) / 100, t.shape[:-1] + (len(ps),))
    return math.sorted_interp(qs, cw, t)


def inner_outer(t0, t1, y1):
    """Inner/outer measures of stepfun (t1, y1) on intervals t0 (stepfun.py:47-61)."""
    check_stepfun(t1, y1)
    cy1 = jnp.concatenate([jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1)
    (idx_lo, idx_hi), ((cy1_lo, cy1_hi),) = math.sorted_lookup(t0, t1, (cy1,))
    y0_outer = cy1_hi[..., 1:] - cy1_lo[..., :-1]
    y0_inner = jnp.where(
        idx_hi[..., :-1] <= idx_lo[..., 1:], cy1_lo[..., 1:] - cy1_hi[..., :-1], 0
    )
    return y0_inner, y0_outer


def lossfun_outer(t, w, t_env, w_env, eps=np.finfo(np.float32).eps):
    """Proposal loss: penalize w exceeding the envelope's outer measure."""
    check_stepfun(t, w)
    check_stepfun(t_env, w_env)
    _, w_outer = inner_outer(t, t_env, w_env)
    return jnp.maximum(0, w - w_outer) ** 2 / (w + eps)


def resample(t, tp, vp, use_avg=False, eps=np.finfo(np.float32).eps):
    """Re-bin step function (tp, vp) into intervals t by integral differencing."""
    check_stepfun(tp, vp)
    if use_avg:
        wp = jnp.diff(tp)
        v_numer = resample(t, tp, vp * wp, use_avg=False)
        v_denom = resample(t, tp, wp, use_avg=False)
        return v_numer / jnp.maximum(eps, v_denom)
    acc = jnp.cumsum(vp, axis=-1)
    acc0 = jnp.concatenate([jnp.zeros(acc.shape[:-1] + (1,)), acc], axis=-1)
    return jnp.diff(math.interp(t, tp, acc0), axis=-1)


def resolve_collisions(t, y, reverse=False):
    """Fix y values of a stepfun with repeated t knots via a scan (stepfun.py:353-391)."""
    check_stepfun(t, y)

    def scan_fn(last, x):
        same = last[..., 0] == x[..., 0]
        carry = jnp.where(same[..., None], last, x)
        out = jnp.where(same, last[..., 1], x[..., 1])
        return carry, out

    ty = jnp.stack([t[..., :-1], y], axis=-1)
    ty_perm = jnp.moveaxis(ty, -2, 0)
    init = ty_perm[-1 if reverse else 0]
    _, y_perm = jax.lax.scan(scan_fn, init, ty_perm, reverse=reverse)
    return jnp.moveaxis(y_perm, 0, -1)


def convolve_with_weighted_diracs(t, w, diracs):
    """Convolve stepfun (t, w) with weighted diracs [(shift, scale), ...]."""
    check_stepfun(t, w)
    dw = jnp.diff(
        jnp.concatenate([jnp.zeros_like(w[..., :1]), w, jnp.zeros_like(w[..., :1])], axis=-1)
    )
    tp, dwp = [
        jnp.concatenate(x, axis=-1)
        for x in zip(*[(t + dt, dw * mult) for (dt, mult) in diracs])
    ]
    order = jnp.argsort(tp, axis=-1)
    tp = jnp.take_along_axis(tp, order, axis=-1)
    dwp = jnp.take_along_axis(dwp, order[..., :-1], axis=-1)
    wp = jnp.cumsum(dwp, axis=-1)
    wp = resolve_collisions(tp, wp, reverse=True)
    return tp, wp


def generate_binomial_diracs(num_taps, num_sigmas=None):
    """Binomial-filter dirac approximation of a unit Gaussian (stepfun.py:430-453)."""
    if num_taps < 2 or num_taps > 64:
        raise ValueError(f"num_taps must be in [2, 64], got {num_taps}")
    w = np.array([1], dtype=np.int64)
    for _ in range(num_taps - 1):
        w = np.convolve(w, np.array([1, 1], dtype=np.int64))
    w = w / 2 ** (num_taps - 1)
    t_max = np.sqrt(num_taps - 1)
    t = np.linspace(-t_max, t_max, num_taps)
    if num_sigmas is not None:
        keep = np.abs(t) <= num_sigmas
        t, w = t[keep], w[keep]
        w = w / np.sum(w)
    return t, w


def blur_with_binomial_diracs(t, y, sigma, num_taps, num_sigmas=3):
    check_stepfun(t, y)
    td, wd = generate_binomial_diracs(num_taps, num_sigmas=num_sigmas)
    return convolve_with_weighted_diracs(t, y, list(zip(td * sigma, wd)))


def blur_and_resample_weights(tq, t, w, blur_halfwidth):
    """Blur histogram (t, w) with a box of half-width `blur_halfwidth`, re-bin to tq.

    Backs the spline interlevel loss (stepfun.py:463-483).
    """
    from neural_radiance_caching_tpu.ops import linspline

    check_stepfun(t, w)
    p = weight_to_pdf(t, w)
    t_lin, p_lin = linspline.blur_stepfun(t, p, blur_halfwidth)
    quad = linspline.compute_integral(t_lin, p_lin)
    acc_wq = linspline.interpolate_integral(tq, t_lin, *quad)
    return jnp.maximum(0, jnp.diff(acc_wq, axis=-1))
