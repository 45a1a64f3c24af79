"""Piecewise-linear spline utilities (backing the spline interlevel loss).

Behavioral parity target: reference internal/linspline.py. The spline blur /
integral / inverse-integral machinery is what turns proposal histograms into
differentiable envelopes for the anti-aliased interlevel loss.

Lookup here keeps `jnp.take_along_axis` (unlike ops.stepfun's dense masks)
because the spline loss operates on already-sorted merged knot vectors where
the gather count is small; XLA handles these fine on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.ops import math

EPS2 = np.float32(np.finfo(np.float32).eps ** 2)


def check_linspline(t, y):
    if t.shape[-1] != y.shape[-1]:
        raise ValueError(f"Invalid linspline shapes ({t.shape}, {y.shape}).")


def query(tq, t, v):
    """Evaluate linear spline (t, v) at tq, zero outside the support."""
    check_linspline(t, v)
    interp = functools.partial(jnp.interp, left=0, right=0)
    return jnp.vectorize(interp, signature="(n),(m),(m)->(n)")(tq, t, v)


def integrate(t, w):
    """Trapezoid-rule integral of the spline."""
    check_linspline(t, w)
    return 0.5 * jnp.sum((w[..., :-1] + w[..., 1:]) * jnp.diff(t), axis=-1)


def normalize(t, w, eps=EPS2):
    check_linspline(t, w)
    return w / jnp.maximum(eps, integrate(t, w))[..., None]


def insert_knot(ti, t, y):
    """Insert knots ti into spline (t, y); assumes zero endpoints."""
    check_linspline(t, y)
    yi = query(ti, t, y)
    ti_ex = jnp.broadcast_to(ti, t.shape[: -len(ti.shape)] + ti.shape)
    yi_ex = jnp.broadcast_to(yi, y.shape[: -len(yi.shape)] + yi.shape)
    to = jnp.concatenate([t, ti_ex], axis=-1)
    yo = jnp.concatenate([y, yi_ex], axis=-1)
    order = jnp.argsort(to)
    return jnp.take_along_axis(to, order, axis=-1), jnp.take_along_axis(yo, order, axis=-1)


def clamp(t, y, minval, maxval):
    """Zero the spline outside t ∈ [minval, maxval]."""
    check_linspline(t, y)
    ti = jnp.concatenate(
        [math.minus_eps(minval), minval, maxval, math.plus_eps(maxval)], axis=-1
    )
    tc, yo = insert_knot(ti, t, y)
    yc = jnp.where((tc > maxval) | (tc < minval), 0, yo)
    return tc, yc


def compute_integral(t, y):
    """Integrate a linear spline into per-interval quadratic coefficients.

    Returns (a, b, c) with the integral on interval i given by
    a[i]*(t-t[i])^2 + b[i]*(t-t[i]) + c[i] (linspline.py:95-107).
    """
    check_linspline(t, y)
    dt = jnp.diff(t)
    a = jnp.diff(y) / jnp.maximum(EPS2, 2 * dt)
    b = y[..., :-1]
    c1 = 0.5 * jnp.cumsum(dt[..., :-1] * (y[..., :-2] + y[..., 1:-1]), axis=-1)
    c = jnp.concatenate([jnp.zeros_like(y[..., :1]), c1], axis=-1)
    return a, b, c


def _bracket(x, xp):
    """searchsorted-style bracketing indices (right-continuous).

    Uses the dense mask-reduction searchsorted (ops.math): on TPU the
    binary-search while-loop jnp.searchsorted compiles to ~30ms/step of
    serial gathers at the spline-loss sizes; the O(N*M) VPU reduction is
    ~free."""
    return math.searchsorted(xp, x)


def interpolate_integral(tq, t, a, b, c):
    """Evaluate the piecewise quadratic from compute_integral at tq."""
    tq = jnp.clip(tq, t[..., :1], math.minus_eps(t[..., -1:]))
    idx0, _ = _bracket(tq, t)
    take = lambda v: math.take_along_last(v, idx0)
    td = tq - take(t)
    return take(a) * td**2 + take(b) * td + take(c)


def interpolate_inverse_integral(uq, t, a, b, c):
    """Invert the piecewise quadratic (for spline PDF sampling)."""
    u = interpolate_integral(t, t, a, b, c)
    uq = jnp.clip(uq, u[..., :1], math.minus_eps(u[..., -1:]))
    idx0, idx1 = _bracket(uq, u)
    take0 = lambda v: math.take_along_last(v, idx0)
    t0, a0, b0, c0 = take0(t), take0(a), take0(b), take0(c)

    a0_safe = jnp.where(a0 >= 0, 1, -1) * jnp.maximum(EPS2, jnp.abs(a0))
    z = b0**2 - 4 * a0 * (c0 - uq)
    v_quad = t0 + (jnp.sqrt(jnp.maximum(EPS2, z)) - b0) / (2 * a0_safe)

    d0 = b0 - 2 * a0 * t0
    d0_safe = jnp.where(d0 >= 0, 1, -1) * jnp.maximum(EPS2, jnp.abs(d0))
    v_lin = t0 + (a0 * t0**2 - (c0 - uq)) / d0_safe

    v = jnp.where((jnp.abs(a0) <= EPS2) | (z <= EPS2), v_lin, v_quad)
    t1 = math.take_along_last(t, idx1)
    return jnp.clip(v, jnp.minimum(t0, t1), jnp.maximum(t0, t1))


def blur_stepfun(ts, ys, halfwidth):
    """Box-blur a step function into a linear spline (linspline.py:187-221).

    Each step edge becomes a ramp of width 2*halfwidth; implemented by
    splatting second-derivative deltas and double-integrating.
    """
    if ts.shape[-1] != ys.shape[-1] + 1:
        raise ValueError(f"Invalid stepfun shapes ({ts.shape}, {ys.shape}).")
    ts_lo = jnp.minimum(math.minus_eps(ts), ts - halfwidth)
    ts_hi = jnp.maximum(math.plus_eps(ts), ts + halfwidth)

    ys0 = jnp.concatenate(
        [jnp.zeros_like(ys[..., :1]), ys, jnp.zeros_like(ys[..., :1])], axis=-1
    )
    dy = jnp.diff(ys0) / (ts_hi - ts_lo)

    tp = jnp.concatenate([ts_lo, ts_hi], axis=-1)
    dyp = jnp.concatenate([dy, -dy], axis=-1)
    # One fused key-value sort instead of argsort + two lane gathers (the
    # reference gathers dyp at order[..., :-2], i.e. sorted minus the two
    # largest-knot entries).
    tp, dyp_sorted = jax.lax.sort([tp, dyp], dimension=-1, num_keys=1)
    dyp = dyp_sorted[..., :-2]

    yp = jnp.cumsum(jnp.diff(tp)[..., :-1] * jnp.cumsum(dyp, axis=-1), axis=-1)
    yp = jnp.concatenate(
        [jnp.zeros_like(yp[..., :1]), yp, jnp.zeros_like(yp[..., -1:])], axis=-1
    )
    return tp, yp


def sample(rng, t, w, num_samples, single_jitter=False, deterministic_center=False,
           eps=np.finfo(np.float32).eps):
    """Draw samples from a piecewise-linear PDF (linspline.py:224-259)."""
    check_linspline(t, w)
    w = normalize(t, w)
    if rng is None:
        if deterministic_center:
            pad = 1 / (2 * num_samples)
            u = jnp.linspace(pad, 1.0 - pad - eps, num_samples)
        else:
            u = jnp.linspace(0, 1.0 - eps, num_samples)
        u = jnp.broadcast_to(u, t.shape[:-1] + (num_samples,))
    else:
        u_max = eps + (1 - eps) / num_samples
        max_jitter = (1 - u_max) / (num_samples - 1) - eps
        d = 1 if single_jitter else num_samples
        u = jnp.linspace(0, 1 - u_max, num_samples) + jax.random.uniform(
            rng, t.shape[:-1] + (d,), maxval=max_jitter
        )
    quad = compute_integral(t, w)
    return interpolate_inverse_integral(u, t, *quad)


def merge(t0, y0, t1, y1, insert_intersections=True):
    """Merge two zero-endpoint splines onto shared knots (linspline.py:262-292)."""
    check_linspline(t0, y0)
    check_linspline(t1, y1)
    tm = jnp.sort(jnp.concatenate([t0, t1], axis=-1), axis=-1)
    ym0 = query(tm, t0, y0)
    ym1 = query(tm, t1, y1)

    if insert_intersections:
        tmd = jnp.diff(tm)
        tmd0 = tmd <= EPS2
        slope0 = jnp.where(tmd0, 0, jnp.diff(ym0) / jnp.where(tmd0, 1, tmd))
        slope1 = jnp.where(tmd0, 0, jnp.diff(ym1) / jnp.where(tmd0, 1, tmd))
        dslope = slope0 - slope1
        dslope0 = jnp.abs(dslope) <= EPS2
        shift = (ym1[..., :-1] - ym0[..., :-1]) / jnp.where(dslope0, 1, dslope)
        invalid = (shift <= 0) | (shift >= tmd) | dslope0 | tmd0
        t_int = jnp.where(invalid, 0, shift) + tm[..., :-1]
        _, ym0 = insert_knot(t_int, tm, ym0)
        tm, ym1 = insert_knot(t_int, tm, ym1)

    return tm, ym0, ym1


def excess_area(t_lo, y_lo, t_hi, y_hi):
    """Area by which spline (t_lo, y_lo) exceeds (t_hi, y_hi)."""
    tm, ym_lo, ym_hi = merge(t_lo, y_lo, t_hi, y_hi)
    delta = jnp.maximum(
        0, (ym_lo[..., 1:] - ym_hi[..., 1:]) + (ym_lo[..., :-1] - ym_hi[..., :-1])
    )
    return 0.5 * jnp.sum(jnp.diff(tm, axis=-1) * delta, axis=-1)
