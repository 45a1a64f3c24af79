"""Numerically-safe math primitives.

Behavioral parity targets: reference internal/math.py (safe_* family :81-228,
power_ladder :295-343, learning_rate_decay :356-411, sorted_lookup :412-447).

Everything here is written for TPU/XLA: no data-dependent control flow, all
lookups expressed as dense masked reductions or matmul-friendly comparisons
(the TPU branch of `sorted_lookup` is the default — on TPU a dense mask
reduction beats searchsorted's gather chains).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

F32_TINY = np.float32(np.finfo(np.float32).tiny)
F32_MIN = np.float32(np.finfo(np.float32).min)
F32_MAX = np.float32(np.finfo(np.float32).max)
F32_EPS = np.float32(np.finfo(np.float32).eps)


def matmul(a, b):
    """Full-precision matmul (jnp.matmul on TPU defaults to bf16 accumulate)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def dot(x, y, axis=-1, keepdims=True):
    return (x * y).sum(axis=axis, keepdims=keepdims)


def normalize(x, eps=0.0):
    denom = jnp.linalg.norm(x, axis=-1, keepdims=True)
    if eps:
        denom = jnp.maximum(denom, eps)
    return x / denom


def safe_sign(x):
    """sign(x) with sign(0) := +1."""
    return jnp.where(x < 0, -1, +1)


def remove_zero(x):
    """Replace values within [-tiny, tiny] by tiny."""
    return jnp.where(jnp.abs(x) < F32_TINY, F32_TINY, x)


def clip_pos(x):
    return jnp.maximum(F32_TINY, x)


def _trig_safe(x, fn, period=100 * jnp.pi):
    # TPU transcendentals can NaN for huge args; wrap into a finite range.
    return fn(jnp.nan_to_num(jnp.where(jnp.abs(x) < period, x, x % period)))


def safe_sin(x):
    return _trig_safe(x, jnp.sin)


def safe_cos(x):
    return _trig_safe(x, jnp.cos)


@jax.custom_jvp
def plus_eps(x):
    return jnp.where(jnp.abs(x) < F32_TINY, F32_TINY, jnp.nextafter(jnp.float32(x), jnp.inf))


@jax.custom_jvp
def minus_eps(x):
    return jnp.where(jnp.abs(x) < F32_TINY, -F32_TINY, jnp.nextafter(jnp.float32(x), -jnp.inf))


@plus_eps.defjvp
def _plus_eps_jvp(primals, tangents):
    return plus_eps(*primals), tangents[0]


@minus_eps.defjvp
def _minus_eps_jvp(primals, tangents):
    return minus_eps(*primals), tangents[0]


def _make_clip_nograd(lo, hi):
    @jax.custom_jvp
    def f(x):
        return jnp.clip(x, lo, hi)

    @f.defjvp
    def _jvp(primals, tangents):
        return f(primals[0]), tangents[0]

    return f


clip_finite_nograd = _make_clip_nograd(F32_MIN, F32_MAX)
clip_pos_finite_nograd = _make_clip_nograd(F32_TINY, F32_MAX)


@jax.custom_vjp
def safe_div(n, d):
    """n/d whose value and gradients never produce NaN/Inf."""
    return _safe_div_fwd(n, d)[0]


def _safe_div_fwd(n, d):
    r = jnp.clip(n / remove_zero(d), F32_MIN, F32_MAX)
    return jnp.where(jnp.abs(d) < F32_TINY, 0, r), (d, r)


def _safe_div_bwd(res, g):
    d, r = res
    dn = jnp.clip(g / remove_zero(d), F32_MIN, F32_MAX)
    dd = jnp.clip(-g * r / remove_zero(d), F32_MIN, F32_MAX)
    return dn, dd


safe_div.defvjp(_safe_div_fwd, _safe_div_bwd)


def _make_safe_fn(fn, grad_fn, lo, hi):
    """Clip inputs in forward AND backward passes (cf. math.py:153-170)."""

    @jax.custom_jvp
    def f(x):
        return fn(jnp.clip(x, lo, hi))

    @f.defjvp
    def _jvp(primals, tangents):
        (x,) = primals
        (dx,) = tangents
        y = f(x)
        return y, grad_fn(jnp.clip(x, lo, hi), y, dx)

    return f


_safe_log = _make_safe_fn(jnp.log, lambda x, _, dx: dx / x, F32_TINY, F32_MAX)
_safe_exp = _make_safe_fn(jnp.exp, lambda _, y, dx: y * dx, F32_MIN, 70.0)
_safe_sqrt = _make_safe_fn(
    jnp.sqrt, lambda x, _, dx: 0.5 * dx / jnp.sqrt(jnp.maximum(F32_TINY, x)), 0, F32_MAX
)
safe_log1p = _make_safe_fn(
    jnp.log1p,
    lambda x, _, dx: dx / (1 + x),
    np.nextafter(np.float32(-1), np.float32(0)),
    F32_MAX,
)
safe_expm1 = _make_safe_fn(
    jnp.expm1,
    lambda x, _, dx: jnp.exp(x) * dx,
    F32_MIN,
    np.nextafter(np.log1p(F32_MAX), np.float32(0)),
)


def safe_log(x):
    return _safe_log(x)


def safe_exp(x):
    return _safe_exp(x)


def safe_sqrt(x):
    return _safe_sqrt(x)


def safe_tanh(x):
    return jax.nn.tanh(x)


def safe_arccos(x):
    y = jnp.arccos(jnp.clip(x, plus_eps(-1.0), minus_eps(1.0)))
    return jnp.where(x >= 1, 0, jnp.where(x <= -1, jnp.pi, y))


def abs(x):  # noqa: A001 - gin-visible name parity with reference math.abs
    return jnp.abs(x)


def power_3(x, exponent=3.0):
    return jnp.power(jnp.abs(x), exponent) * safe_sign(x)


def laplace_cdf(x, beta):
    alpha = 1 / beta
    return alpha * (0.5 + 0.5 * safe_sign(x) * (jnp.exp(-jnp.abs(x) / beta) - 1))


def scaled_softplus(x, scale=100.0):
    return (1.0 / scale) * jax.nn.softplus(scale * x)


def sine_plus(x):
    return (jnp.sin(x) + 1.0) / 2.0


def override_gradient(fval, bval):
    """Forward value = fval, gradient flows through bval."""
    return jax.lax.stop_gradient(fval) + (bval - jax.lax.stop_gradient(bval))


def _apply_fn_to_grad(grad_fn):
    @jax.custom_vjp
    def f(x):
        return x

    f.defvjp(lambda x: (x, None), lambda _, g: (grad_fn(g),))
    return f


nangrad_to_zero = _apply_fn_to_grad(jnp.nan_to_num)


def select(cond_pairs, default):
    return jnp.select(*zip(*cond_pairs), default)


def power_ladder_max_output(p):
    """Limit of power_ladder(x, p) as x → ∞ (math.py:284-292)."""
    return select([(p == -jnp.inf, 1), (p >= 0, jnp.inf)], safe_div(p - 1, p))


def power_ladder(x, p, premult=None, postmult=None):
    """Tukey's power ladder curve with special cases at p ∈ {1, 0, ±inf}.

    y = sign(x) * |p-1|/p * ((|x|/|p-1| + 1)^p - 1); see math.py:295-316.
    """
    if premult is not None:
        x = x * premult
    xp = jnp.abs(x)
    xs = xp / jnp.maximum(F32_TINY, jnp.abs(p - 1))
    p_safe = clip_finite_nograd(remove_zero(p))
    y = safe_sign(x) * select(
        [
            (p == 1, xp),
            (p == 0, safe_log1p(xp)),
            (p == -jnp.inf, -safe_expm1(-xp)),
            (p == jnp.inf, safe_expm1(xp)),
        ],
        clip_finite_nograd(jnp.abs(p_safe - 1) / p_safe * ((xs + 1) ** p_safe - 1)),
    )
    if postmult is not None:
        y = y * postmult
    return y


def inv_power_ladder(y, p, premult=None, postmult=None):
    """Exact inverse of power_ladder (math.py:319-341)."""
    if postmult is not None:
        y = y / postmult
    yp = jnp.abs(y)
    p_safe = clip_finite_nograd(remove_zero(p))
    y_max = minus_eps(power_ladder_max_output(p))
    yp = override_gradient(jnp.clip(yp, -y_max, y_max), yp)
    x = safe_sign(y) * select(
        [
            (p == 1, yp),
            (p == 0, safe_expm1(yp)),
            (p == -jnp.inf, -safe_log1p(-yp)),
            (p == jnp.inf, safe_log1p(yp)),
        ],
        jnp.abs(p_safe - 1)
        * (((safe_div(p_safe, jnp.abs(p_safe - 1)) * yp + 1)) ** (1 / p_safe) - 1),
    )
    if premult is not None:
        x = x / premult
    return x


def approx_erf(x):
    """erf approximation accurate to ~0.007 (math.py:365-367)."""
    return jnp.sign(x) * jnp.sqrt(1 - jnp.exp(-(4 / jnp.pi) * x**2))


def log_lerp(t, v0, v1):
    """Log-linear interpolation from v0 (t=0) to v1 (t=1)."""
    if v0 <= 0 or v1 <= 0:
        raise ValueError(f"Interpolants {v0} and {v1} must be positive.")
    lv0, lv1 = np.log(v0), np.log(v1)
    return jnp.exp(jnp.clip(t, 0, 1) * (lv1 - lv0) + lv0)


def learning_rate_decay(step, lr_init, lr_final, max_steps, lr_delay_steps=0, lr_delay_mult=1):
    """Log-linear lr decay with an optional warmup ease-in (math.py:375-409)."""
    if lr_init == 0.0 and lr_final == 0.0:
        return 0.0
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    return delay_rate * log_lerp(step / max_steps, lr_init, lr_final)


def create_learning_rate_decay(**kwargs):
    return functools.partial(learning_rate_decay, **kwargs)


def power_iteration(a_mat, n):
    """n rounds of power iteration → (top eigenvalue, eigenvector)."""
    vec = jnp.sum(a_mat, axis=-1) / jnp.sqrt(a_mat.shape[-1])
    val = None
    for i in range(n):
        if i > 0:
            vec = matmul(a_mat, vec[..., None])[..., 0]
        val = jnp.sqrt(jnp.sum(vec**2, axis=-1))
        vec = vec / val[..., None]
    return val, vec


def cholesky3(a, symmetrize_input=True):
    """Closed-form 3x3 Cholesky built from safe ops (math.py:244-268)."""
    if a.shape[-2:] != (3, 3):
        raise ValueError(f"input must be (..., 3, 3), got {a.shape}")
    flat = jnp.moveaxis(a.reshape(a.shape[:-2] + (9,)), -1, 0)
    a11, a12, a13, a21, a22, a23, a31, a32, a33 = flat
    if symmetrize_input:
        a21 = (a12 + a21) / 2
        a31 = (a13 + a31) / 2
        a32 = (a23 + a32) / 2

    l11 = safe_sqrt(a11)
    l21 = safe_div(a21, l11)
    l22 = safe_sqrt(a22 - safe_div(a21, l11) ** 2)
    l31 = safe_div(a31, l11)
    l32 = safe_div(a32 - l31 * l21, l22)
    l33 = safe_sqrt(a33 - safe_div(a31**2, a11) - safe_div(a32 - l31 * l21, l22) ** 2)
    z = jnp.zeros_like(a11)
    return jnp.stack([l11, z, z, l21, l22, z, l31, l32, l33], axis=-1).reshape(a.shape)


def safe_cholesky(a, **kwargs):
    fn = cholesky3 if a.shape[-2:] == (3, 3) else jax.lax.linalg.cholesky
    return jnp.nan_to_num(fn(nangrad_to_zero(a), **kwargs))


# ---------------------------------------------------------------------------
# Sorted lookup / interpolation.
#
# On TPU we always take the dense masked-reduction path: for each query we
# build the [..., num_knots, num_queries] comparison mask and reduce. This is
# a VPU-friendly O(N*M) computation with zero gathers, which on TPU beats
# searchsorted-style gathers for the interval counts used here (<= ~130).
# Reference: internal/math.py:412-447 (its device_is_tpu branch).
# ---------------------------------------------------------------------------


def take_along_last(v, idx):
    """take_along_axis(v, idx, -1) as a dense one-hot multiply-reduce.

    XLA lowers lane-axis take_along_axis to a per-element gather that
    dominates sampler/loss profiles on TPU (~5ms per call at NeRF sizes);
    the [..., M, N] equality-mask reduction is pure VPU and ~free for the
    knot counts used here (N <= ~260).
    """
    n = v.shape[-1]
    iota = jnp.arange(n, dtype=idx.dtype)
    eq = idx[..., :, None] == iota  # [..., M, N]
    return jnp.sum(jnp.where(eq, v[..., None, :], 0), axis=-1)


def sorted_lookup(x, xp, fps=()):
    """For each x find its bracketing knots in sorted xp; gather fp values.

    Args:
      x: [..., M] query positions.
      xp: [..., N] sorted knot positions.
      fps: tuple of [..., N] arrays to look up at the bracketing indices.

    Returns:
      ((idx0, idx1), [(fp0, fp1) for fp in fps]) where idx0/idx1 index the
      interval start/end knots for each query.
    """
    if not isinstance(fps, tuple):
        raise ValueError(f"`fps` must be a tuple, got {type(fps)}.")

    # count[m] = #{n : x[m] >= xp[n]} from ONE dense mask reduction (xp is
    # sorted, so the mask is monotone in n). Bracketing indices follow
    # arithmetically: idx0 = count-1 (clamped), idx1 = count (clamped) — no
    # searchsorted, no data-dependent gathers for the index computation.
    n = xp.shape[-1]
    mask = x[..., None, :] >= xp[..., :, None]  # [..., N, M]
    count = jnp.sum(mask, axis=-2).astype(jnp.int32)
    idx0 = jnp.clip(count - 1, 0, n - 1)
    idx1 = jnp.minimum(count, n - 1)

    # Values via one equality mask per fp; the interval-end value reuses the
    # same mask against a shifted copy (idx1 == idx0 + 1 except at the ends,
    # fixed up explicitly).
    iota = jnp.arange(n, dtype=jnp.int32)
    eq0 = idx0[..., :, None] == iota  # [..., M, N]
    below = count == 0
    vals = []
    for fp in fps:
        fp_shift = jnp.concatenate([fp[..., 1:], fp[..., -1:]], axis=-1)
        fp0 = jnp.sum(jnp.where(eq0, fp[..., None, :], 0), axis=-1)
        fp1 = jnp.sum(jnp.where(eq0, fp_shift[..., None, :], 0), axis=-1)
        fp1 = jnp.where(below, jnp.broadcast_to(fp[..., :1], fp1.shape), fp1)
        vals.append((fp0, fp1))
    return (idx0, idx1), vals


def sorted_interp(x, xp, fp, eps=F32_EPS**2):
    """Piecewise-linear interp where xp and fp are sorted along the last axis."""
    (xp0, xp1), (fp0, fp1) = sorted_lookup(x, xp, (xp, fp))[1]
    offset = jnp.clip((x - xp0) / jnp.maximum(eps, xp1 - xp0), 0, 1)
    return fp0 + offset * (fp1 - fp0)


def searchsorted(a, v):
    """Bracketing indices of v in sorted a (boundary-free searchsorted)."""
    return sorted_lookup(v, a)[0]


def interp(x, xp, fp):
    """jnp.interp vectorized over leading batch dims via the mask reduction."""
    (xp0, xp1), (fp0, fp1) = sorted_lookup(x, xp, (xp, fp))[1]
    denom = xp1 - xp0
    offset = jnp.clip(jnp.where(jnp.abs(denom) < F32_TINY, 0.0, (x - xp0) / remove_zero(denom)), 0, 1)
    return fp0 + offset * (fp1 - fp0)


# --- Sampling helpers (math.py:491-530) -----------------------------------


def random_sample_sphere(key, sh):
    return normalize(jax.random.normal(key, sh))


def random_sample_hemisphere(key, sh):
    s = normalize(jax.random.normal(key, sh))
    return jnp.concatenate([s[..., 0:1], s[..., 1:2], jnp.abs(s[..., 2:3])], axis=-1)


def cosine_sample_hemisphere(key, sh):
    s = random_sample_sphere(key, sh)
    offs = jnp.concatenate([jnp.zeros(sh[:-1] + (2,)), jnp.ones(sh[:-1] + (1,))], axis=-1)
    return normalize(s + offs)


def cosine_sample_hemisphere_normal(key, sh, normal):
    return normalize(random_sample_sphere(key, sh) + normal)


def cosine_sample_weights(samples, normal):
    return dot(samples, normal) / jnp.pi


def average_across_multisamples(x):
    return jnp.mean(x, axis=-2)


def concat_across_multisamples(x):
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))
