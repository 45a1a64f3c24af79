"""Numerical parity against the reference implementation, function by function.

When the reference tree is present at /root/reference (it is read-only public
content used as a behavioral spec), these tests run this framework's numeric
core side by side with the reference's own functions on random inputs and
assert the outputs agree. This is direct evidence that a user switching from
the reference finds the same numerics, not a re-interpretation. The module
self-skips when the reference tree is absent, so the framework stays
standalone.

Reference counterparts (cited per test): internal/stepfun.py, internal/coord.py,
internal/ref_utils.py, internal/math.py, internal/render.py,
internal/linspline.py, internal/inverse_render/render_utils.py.

Where this framework deliberately re-expresses an algorithm whose outputs are
rng-draw-dependent (e.g. stepfun.sample's stratified jitter), the rng=None
deterministic path is compared exactly and the rng path is checked by its
guaranteed properties (range, monotonicity) instead of bitwise equality.
"""

import math as py_math
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_radiance_caching_tpu.ops import coord
from neural_radiance_caching_tpu.ops import linspline
from neural_radiance_caching_tpu.ops import math as ops_math
from neural_radiance_caching_tpu.ops import ref_utils
from neural_radiance_caching_tpu.ops import render
from neural_radiance_caching_tpu.ops import render_utils
from neural_radiance_caching_tpu.ops import stepfun

REF_ROOT = "/root/reference"
SHIM_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "ref_shims",
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "internal")),
    reason="reference tree not available",
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference's numeric modules (once per test module)."""
    # numpy>=2 removed the np.math alias the 2023-era reference uses.
    if not hasattr(np, "math"):
        np.math = py_math
    # Append (never prepend): the reference must not shadow repo modules;
    # only names nothing else provides resolve to it ('internal', the 'gin'
    # shim used by inverse_render/render_utils).
    for path in (SHIM_DIR, REF_ROOT):
        if path not in sys.path:
            sys.path.append(path)
    import importlib
    import types

    mods = {}
    for name in ("math", "stepfun", "coord", "ref_utils", "render",
                 "linspline"):
        mods[name] = importlib.import_module(f"internal.{name}")
    mods["render_utils"] = importlib.import_module(
        "internal.inverse_render.render_utils")
    return types.SimpleNamespace(**mods)


def _rng(seed=0):
    return np.random.default_rng(seed)


def _stepfun(rng, n_rows=6, n_bins=16, t_lo=0.1, t_hi=4.0):
    t = np.sort(rng.uniform(t_lo, t_hi, (n_rows, n_bins + 1)), -1)
    w_logits = rng.normal(size=(n_rows, n_bins))
    return t.astype(np.float32), w_logits.astype(np.float32)


def assert_close(ours, theirs, atol=1e-5, rtol=1e-5):
    if isinstance(theirs, (tuple, list)):
        assert len(ours) == len(theirs)
        for a, b in zip(ours, theirs):
            assert_close(a, b, atol=atol, rtol=rtol)
        return
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(theirs), atol=atol, rtol=rtol)


# --- stepfun -----------------------------------------------------------------


def test_stepfun_query_integrate_invert(ref):
    """query/integrate_weights/invert_cdf vs internal/stepfun.py:35,125,147."""
    rng = _rng(1)
    t, w_logits = _stepfun(rng)
    w = np.asarray(jax.nn.softmax(jnp.asarray(w_logits), -1))

    assert_close(stepfun.integrate_weights(w), ref.stepfun.integrate_weights(w))

    tq = np.sort(rng.uniform(-0.5, 5.0, (6, 9)), -1).astype(np.float32)
    y = rng.normal(size=(6, 16)).astype(np.float32)
    assert_close(
        stepfun.query(tq, t, y, outside_value=-3.0),
        ref.stepfun.query(tq, t, y, outside_value=-3.0),
    )

    u = np.sort(rng.uniform(0, 1, (6, 7)), -1).astype(np.float32)
    assert_close(stepfun.invert_cdf(u, t, w_logits),
                 ref.stepfun.invert_cdf(u, t, w_logits))


def test_stepfun_sample_deterministic(ref):
    """sample/sample_intervals rng=None paths vs internal/stepfun.py:158,207."""
    rng = _rng(2)
    t, w_logits = _stepfun(rng)
    for deterministic_center in (False, True):
        assert_close(
            stepfun.sample(None, t, w_logits, 11,
                           deterministic_center=deterministic_center),
            ref.stepfun.sample(None, t, w_logits, 11,
                               deterministic_center=deterministic_center),
        )
    for single_jitter in (False, True):
        assert_close(
            stepfun.sample_intervals(None, t, w_logits, 9, single_jitter,
                                     domain=(0.05, 4.5)),
            ref.stepfun.sample_intervals(None, t, w_logits, 9, single_jitter,
                                         domain=(0.05, 4.5)),
        )


def test_stepfun_sample_jittered_properties(ref):
    """The rng jitter math is deliberately re-expressed, so the draw differs
    bitwise from internal/stepfun.py:158-204; both must satisfy the same
    guarantees: samples sorted, inside the t-domain, and (single draw per
    stratum) no two samples from one row collide."""
    rng = _rng(3)
    t, w_logits = _stepfun(rng)
    key = jax.random.PRNGKey(0)
    for single_jitter in (False, True):
        for fn in (stepfun.sample, ref.stepfun.sample):
            s = np.asarray(fn(key, t, w_logits, 13, single_jitter))
            assert s.shape == (6, 13)
            assert (np.diff(s, axis=-1) >= 0).all()
            assert (s >= t[:, :1]).all() and (s <= t[:, -1:]).all()


def test_stepfun_losses_and_dilation(ref):
    """distortion/outer losses, max_dilate_weights, weighted_percentile vs
    internal/stepfun.py:64,88,107,253,306."""
    rng = _rng(4)
    t, w_logits = _stepfun(rng)
    # jnp arrays: the reference's normalize branch does `w += eps` in place,
    # which is invalid on read-only numpy inputs.
    w = jax.nn.softmax(jnp.asarray(w_logits), -1)
    for normalize in (False, True):
        assert_close(stepfun.lossfun_distortion(t, w, normalize=normalize),
                     ref.stepfun.lossfun_distortion(t, w, normalize=normalize))

    t_env, w_env_logits = _stepfun(rng, t_lo=0.05, t_hi=4.5)
    w_env = np.asarray(jax.nn.softmax(jnp.asarray(w_env_logits), -1))
    assert_close(stepfun.lossfun_outer(t, w, t_env, w_env),
                 ref.stepfun.lossfun_outer(t, w, t_env, w_env))

    assert_close(
        stepfun.max_dilate_weights(t, w, 0.1, domain=(0.0, 5.0),
                                   renormalize=True),
        ref.stepfun.max_dilate_weights(t, w, 0.1, domain=(0.0, 5.0),
                                       renormalize=True),
    )
    ps = np.array([10.0, 50.0, 90.0], np.float32)
    assert_close(stepfun.weighted_percentile(t, w, ps),
                 ref.stepfun.weighted_percentile(t, w, ps))


def test_stepfun_resample_and_blur(ref):
    """resample/convolve_with_weighted_diracs/blur_and_resample_weights vs
    internal/stepfun.py:317,394,463."""
    rng = _rng(5)
    t, w_logits = _stepfun(rng)
    w = np.asarray(jax.nn.softmax(jnp.asarray(w_logits), -1))
    tp, vp_logits = _stepfun(rng, t_lo=0.0, t_hi=4.2)
    vp = np.asarray(jax.nn.softmax(jnp.asarray(vp_logits), -1))
    for use_avg in (False, True):
        assert_close(stepfun.resample(t, tp, vp, use_avg=use_avg),
                     ref.stepfun.resample(t, tp, vp, use_avg=use_avg))

    diracs = ref.stepfun.generate_binomial_diracs(5)
    ours_diracs = stepfun.generate_binomial_diracs(5)
    assert_close(ours_diracs[0], diracs[0])
    assert_close(ours_diracs[1], diracs[1])
    dt, dw = (np.asarray(x) for x in diracs)
    dirac_pairs = list(zip(dt * 0.05, dw))  # [(offset, multiplier), ...]
    assert_close(
        stepfun.convolve_with_weighted_diracs(t, w, dirac_pairs),
        ref.stepfun.convolve_with_weighted_diracs(t, w, dirac_pairs),
    )

    tq = np.sort(rng.uniform(0.0, 4.5, (6, 12)), -1).astype(np.float32)
    assert_close(stepfun.blur_and_resample_weights(tq, t, w, 0.07),
                 ref.stepfun.blur_and_resample_weights(tq, t, w, 0.07),
                 atol=1e-4, rtol=1e-4)


# --- coord -------------------------------------------------------------------


def test_coord_contraction_family(ref):
    """Every registered contraction + inverse vs internal/coord.py:27-135."""
    rng = _rng(6)
    x = rng.uniform(-8.0, 8.0, (64, 3)).astype(np.float32)
    pairs = [
        ("contract", "inv_contract"),
        ("contract_cube", "inv_contract_cube"),
        ("contract_projective", "inv_contract_projective"),
    ]
    for fwd, inv in pairs:
        z_ref = np.asarray(getattr(ref.coord, fwd)(x))
        z_ours = np.asarray(getattr(coord, fwd)(x))
        assert_close(z_ours, z_ref)
        assert_close(getattr(coord, inv)(z_ours), getattr(ref.coord, inv)(z_ref),
                     atol=1e-4, rtol=1e-4)
    for name in ("contract_constant", "contract_constant_1",
                 "contract_radius_5", "contract_radius_2",
                 "contract_radius_1_2", "contract_radius_1_4",
                 "contract_cube_5", "contract_cube_2", "contract_cube_1_2",
                 "contract_cube_1_4", "contract3_isoscale"):
        assert_close(getattr(coord, name)(x), getattr(ref.coord, name)(x))


def test_coord_pos_encodings(ref):
    """pos_enc/IPE/expected_sin/windowed variants vs internal/coord.py:263-366."""
    rng = _rng(7)
    x = rng.uniform(-2.0, 2.0, (32, 3)).astype(np.float32)
    mean = rng.normal(size=(32, 3)).astype(np.float32)
    var = rng.uniform(0.01, 0.5, (32, 3)).astype(np.float32)

    assert_close(coord.expected_sin(mean, var), ref.coord.expected_sin(mean, var))
    assert_close(coord.integrated_pos_enc(mean, var, 0, 6),
                 ref.coord.integrated_pos_enc(mean, var, 0, 6))
    for append_identity in (False, True):
        assert_close(coord.pos_enc(x, 0, 5, append_identity),
                     ref.coord.pos_enc(x, 0, 5, append_identity))
    assert_close(coord.pos_enc_window(0, 6, 2.5), ref.coord.pos_enc_window(0, 6, 2.5))


def test_coord_ray_warps_and_tracking(ref):
    """construct_ray_warps/track_linearize/track_isotropic/lift_and_diagonalize
    vs internal/coord.py:138-262,291."""
    rng = _rng(8)
    t_near, t_far = np.float32(0.2), np.float32(60.0)
    t = rng.uniform(0.0, 1.0, (16,)).astype(np.float32)
    for fn in (None, jnp.reciprocal, jnp.log):
        t_to_s_ref, s_to_t_ref = ref.coord.construct_ray_warps(fn, t_near, t_far)
        t_to_s_ours, s_to_t_ours = coord.construct_ray_warps(fn, t_near, t_far)
        s = np.asarray(s_to_t_ours(t))
        assert_close(s, s_to_t_ref(t), atol=1e-4, rtol=1e-4)
        assert_close(t_to_s_ours(s), t_to_s_ref(s), atol=1e-4, rtol=1e-4)

    mean = rng.normal(size=(8, 3)).astype(np.float32)
    cov = rng.normal(size=(8, 3, 3)).astype(np.float32)
    cov = np.einsum("...ij,...kj->...ik", cov, cov) * 0.01 + np.eye(3, dtype=np.float32) * 0.05
    fn = coord.contract
    m_ours, c_ours = coord.track_linearize(fn, mean, cov)
    m_ref, c_ref = ref.coord.track_linearize(ref.coord.contract, mean, cov)
    assert_close(m_ours, m_ref)
    assert_close(c_ours, c_ref, atol=1e-4, rtol=1e-4)

    scale = rng.uniform(0.05, 0.4, (8,)).astype(np.float32)
    m_ours, s_ours = coord.track_isotropic(fn, mean, scale)
    m_ref, s_ref = ref.coord.track_isotropic(ref.coord.contract, mean, scale)
    assert_close(m_ours, m_ref)
    assert_close(s_ours, s_ref, atol=1e-4, rtol=1e-4)

    basis = np.linalg.qr(_rng(9).normal(size=(3, 3)))[0].astype(np.float32)
    lm_ours, lv_ours = coord.lift_and_diagonalize(mean, cov, basis)
    lm_ref, lv_ref = ref.coord.lift_and_diagonalize(mean, cov, basis)
    assert_close(lm_ours, lm_ref)
    assert_close(lv_ours, lv_ref, atol=1e-4, rtol=1e-4)


# --- ref_utils ---------------------------------------------------------------


def test_ref_utils_ide_parity(ref):
    """IDE/dir-enc/reflect/l2_normalize/MAE/orientation loss vs
    internal/ref_utils.py:25-213."""
    rng = _rng(10)
    d = rng.normal(size=(24, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    n = rng.normal(size=(24, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)

    assert_close(ref_utils.reflect(d, n), ref.ref_utils.reflect(d, n))
    x = rng.normal(size=(24, 3)).astype(np.float32) * 3.0
    assert_close(ref_utils.l2_normalize(x), ref.ref_utils.l2_normalize(x))

    for deg in (2, 4):
        kappa_inv = rng.uniform(0.0, 1.0, (24, 1)).astype(np.float32)
        assert_close(
            ref_utils.generate_ide_fn(deg)(d, kappa_inv),
            ref.ref_utils.generate_ide_fn(deg)(d, kappa_inv),
            atol=1e-4, rtol=1e-4,
        )
        assert_close(ref_utils.generate_dir_enc_fn(deg)(d),
                     ref.ref_utils.generate_dir_enc_fn(deg)(d),
                     atol=1e-4, rtol=1e-4)

    w = rng.uniform(0.0, 1.0, (24,)).astype(np.float32)
    n2 = rng.normal(size=(24, 3)).astype(np.float32)
    n2 /= np.linalg.norm(n2, axis=-1, keepdims=True)
    assert_close(ref_utils.compute_weighted_mae(w, n, n2),
                 ref.ref_utils.compute_weighted_mae(w, n, n2),
                 atol=1e-4, rtol=1e-4)
    wv = rng.uniform(0.0, 1.0, (24, 8)).astype(np.float32)
    nv = rng.normal(size=(24, 8, 3)).astype(np.float32)
    nv /= np.linalg.norm(nv, axis=-1, keepdims=True)
    v = rng.normal(size=(24, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    assert_close(ref_utils.orientation_loss(wv, nv, v),
                 ref.ref_utils.orientation_loss(wv, nv, v))


# --- math --------------------------------------------------------------------


def test_math_scalar_functions(ref):
    """safe_* clamps, power_ladder pair, schedules vs internal/math.py."""
    rng = _rng(11)
    x = np.concatenate([
        rng.normal(size=(64,)).astype(np.float32) * 10,
        np.array([0.0, 1e-30, -1e-30, 1e20, -1e20], np.float32),
    ])
    assert_close(ops_math.safe_exp(x), ref.math.safe_exp(x))
    assert_close(ops_math.safe_log(np.abs(x)), ref.math.safe_log(np.abs(x)))
    assert_close(ops_math.safe_sqrt(np.abs(x)), ref.math.safe_sqrt(np.abs(x)))
    assert_close(ops_math.safe_sin(x), ref.math.safe_sin(x))
    assert_close(ops_math.safe_cos(x), ref.math.safe_cos(x))
    assert_close(ops_math.laplace_cdf(x, 0.3), ref.math.laplace_cdf(x, 0.3))
    assert_close(ops_math.approx_erf(x / 10), ref.math.approx_erf(x / 10))
    assert_close(ops_math.sine_plus(x), ref.math.sine_plus(x))
    assert_close(ops_math.scaled_softplus(x / 100), ref.math.scaled_softplus(x / 100))

    p = np.array([-1.5, -1.0, 0.0, 0.5, 1.0, 2.0], np.float32)
    for pi in p:
        y_ref = np.asarray(ref.math.power_ladder(x / 10, pi))
        y_ours = np.asarray(ops_math.power_ladder(x / 10, pi))
        assert_close(y_ours, y_ref, atol=1e-4, rtol=1e-4)
        assert_close(ops_math.inv_power_ladder(y_ours, pi),
                     ref.math.inv_power_ladder(y_ref, pi), atol=1e-3, rtol=1e-3)

    t = rng.uniform(0, 1, (16,)).astype(np.float32)
    assert_close(ops_math.log_lerp(t, 1e-3, 1.0), ref.math.log_lerp(t, 1e-3, 1.0))
    steps = np.arange(0, 1000, 37)
    assert_close(
        ops_math.learning_rate_decay(steps, 1e-2, 1e-4, 1000, 100, 0.1),
        ref.math.learning_rate_decay(steps, 1e-2, 1e-4, 1000, 100, 0.1),
    )


def test_math_sorted_interp(ref):
    """sorted_interp (the TPU gather-free variant must match the reference's
    values) vs internal/math.py:448."""
    rng = _rng(12)
    xp = np.sort(rng.uniform(0, 10, (8, 20)), -1).astype(np.float32)
    fp = rng.normal(size=(8, 20)).astype(np.float32)
    x = np.sort(rng.uniform(-1, 11, (8, 14)), -1).astype(np.float32)
    # device_is_tpu=False is the reference's exact path for arbitrary fp.
    assert_close(ops_math.sorted_interp(x, xp, fp),
                 ref.math.sorted_interp(x, xp, fp, False),
                 atol=1e-4, rtol=1e-4)
    # The reference's device_is_tpu=True variant is a max/min-reduction trick
    # that is only exact when fp is monotone along the axis (its CDF use,
    # internal/stepfun.py:147-156); compare on sorted fp.
    fp_sorted = np.sort(fp, -1)
    assert_close(ops_math.sorted_interp(x, xp, fp_sorted),
                 ref.math.sorted_interp(x, xp, fp_sorted, True),
                 atol=1e-4, rtol=1e-4)


# --- render ------------------------------------------------------------------


def test_render_cast_rays_and_weights(ref):
    """cast_rays cone/cylinder gaussians + compute_alpha_weights vs
    internal/render.py:26-171."""
    rng = _rng(13)
    n, m = 8, 12
    tdist = np.sort(rng.uniform(0.2, 6.0, (n, m + 1)), -1).astype(np.float32)
    origins = rng.normal(size=(n, 3)).astype(np.float32)
    directions = rng.normal(size=(n, 3)).astype(np.float32)
    radii = rng.uniform(0.001, 0.01, (n, 1)).astype(np.float32)
    for shape in ("cone", "cylinder"):
        m_ours, v_ours = render.cast_rays(tdist, origins, directions, radii, shape)
        m_ref, v_ref = ref.render.cast_rays(tdist, origins, directions, radii, shape)
        assert_close(m_ours, m_ref, atol=1e-4, rtol=1e-4)
        assert_close(v_ours, v_ref, atol=1e-4, rtol=1e-4)

    density = rng.uniform(0.0, 3.0, (n, m)).astype(np.float32)
    for opaque in (False, True):
        w_ours = render.compute_alpha_weights(density, tdist, directions, opaque)
        w_ref = ref.render.compute_alpha_weights(density, tdist, directions, opaque)
        for a, b in zip(w_ours, w_ref):
            assert_close(a, b)


# --- linspline ---------------------------------------------------------------


def test_linspline_parity(ref):
    """query/integrate/normalize/insert_knot/clamp/compute_integral/blur vs
    internal/linspline.py."""
    rng = _rng(14)
    n, m = 6, 14
    t = np.sort(rng.uniform(0.0, 5.0, (n, m)), -1).astype(np.float32)
    y = rng.uniform(0.0, 2.0, (n, m)).astype(np.float32)
    # Zero endpoints where the reference's checkify asserts require them.
    y_zero = y.copy()
    y_zero[..., 0] = 0
    y_zero[..., -1] = 0

    tq = np.sort(rng.uniform(-0.5, 5.5, (n, 9)), -1).astype(np.float32)
    assert_close(linspline.query(tq, t, y), ref.linspline.query(tq, t, y))
    assert_close(linspline.integrate(t, y), ref.linspline.integrate(t, y))
    assert_close(linspline.normalize(t, y_zero), ref.linspline.normalize(t, y_zero))

    ti = rng.uniform(0.5, 4.5, (n,)).astype(np.float32)[:, None]
    t_ours, y_ours = linspline.insert_knot(ti, t, y_zero)
    t_ref, y_ref = ref.linspline.insert_knot(ti, t, y_zero)
    assert_close(t_ours, t_ref)
    assert_close(y_ours, y_ref, atol=1e-5, rtol=1e-4)

    lo = np.full((n, 1), 0.2, np.float32)
    hi = np.full((n, 1), 1.5, np.float32)
    assert_close(linspline.clamp(t, y_zero, lo, hi)[1],
                 ref.linspline.clamp(t, y_zero, lo, hi)[1],
                 atol=1e-5, rtol=1e-4)
    a_ours, b_ours, c_ours = linspline.compute_integral(t, y)
    a_ref, b_ref, c_ref = ref.linspline.compute_integral(t, y)
    assert_close(a_ours, a_ref, atol=1e-4, rtol=1e-4)
    assert_close(b_ours, b_ref, atol=1e-4, rtol=1e-4)
    assert_close(c_ours, c_ref, atol=1e-4, rtol=1e-4)

    # blur_stepfun takes a STEP function: len(ts) == len(ys) + 1.
    ts_step = np.sort(rng.uniform(0.0, 5.0, (n, m + 1)), -1).astype(np.float32)
    ts_ours, ys_ours = linspline.blur_stepfun(ts_step, y, 0.15)
    ts_ref, ys_ref = ref.linspline.blur_stepfun(ts_step, y, 0.15)
    assert_close(ts_ours, ts_ref, atol=1e-5, rtol=1e-5)
    assert_close(ys_ours, ys_ref, atol=1e-4, rtol=1e-4)


# --- inverse_render toolkit ----------------------------------------------------


def test_render_utils_parity(ref):
    """GGX_D/eval_vmf/envmap directions/rotation frames/dtof transforms vs
    internal/inverse_render/render_utils.py."""
    rng = _rng(15)
    costheta = rng.uniform(0.0, 1.0, (32,)).astype(np.float32)
    a = rng.uniform(0.05, 1.0, (32,)).astype(np.float32)
    assert_close(render_utils.GGX_D(costheta, a), ref.render_utils.GGX_D(costheta, a))

    x = rng.normal(size=(16, 4, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    means = rng.normal(size=(16, 4, 3)).astype(np.float32)
    means /= np.linalg.norm(means, axis=-1, keepdims=True)
    kappa = rng.uniform(0.0, 50.0, (16, 4)).astype(np.float32)
    assert_close(render_utils.eval_vmf(x, means, kappa),
                 ref.render_utils.eval_vmf(x, means, kappa),
                 atol=1e-4, rtol=1e-4)

    d_ours = render_utils.get_directions(8, 16)
    d_ref = ref.render_utils.get_directions(8, 16)
    assert_close(d_ours, d_ref, atol=1e-5, rtol=1e-5)

    n = rng.normal(size=(12, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    for y_up in (False, True):
        r_ours = np.asarray(render_utils.get_rotation_matrix(n, y_up=y_up))
        r_ref = np.asarray(ref.render_utils.get_rotation_matrix(n, y_up=y_up))
        assert_close(r_ours, r_ref, atol=1e-4, rtol=1e-4)

    dtof = rng.uniform(0.0, 1.0, (4, 64, 3)).astype(np.float32)
    freq_phase = [(2.0, 0.0), (2.0, 0.5 * np.pi), (3.0, np.pi)]
    assert_close(
        render_utils.dtof_to_itof(dtof, freq_phase, 0.05),
        ref.render_utils.dtof_to_itof(dtof, freq_phase, 0.05),
        atol=1e-4, rtol=1e-4,
    )
    sigma_scales = [(1.0, 0.8), (2.0, 1.2)]  # [(sigma, scale), ...]
    assert_close(
        render_utils.dtof_to_gauss(dtof, sigma_scales, 0.3),
        ref.render_utils.dtof_to_gauss(dtof, sigma_scales, 0.3),
        atol=1e-4, rtol=1e-4,
    )


def _reflect_samples(rng, n=6, s=5, bins=None):
    """Random secondary-sample dict in the shape _integrate_lobe feeds."""
    d = rng.normal(size=(n, s, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    v = rng.normal(size=(n, s, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v[..., 2] = np.abs(v[..., 2])
    rad_shape = (n, s, 3) if bins is None else (n, s, bins, 3)
    return {
        "local_lightdirs": d,
        "local_viewdirs": v,
        "pdf": rng.uniform(1e-6, 2.0, (n, s, 1)).astype(np.float32),
        "weight": rng.uniform(-0.1, 1.5, (n, s, 1)).astype(np.float32),
        "radiance_in": rng.uniform(0.0, 5.0, rad_shape).astype(np.float32),
        "brdf_correction": rng.uniform(0.2, 2.0, (n, s, 2)).astype(np.float32),
        "indirect_occ": rng.uniform(0.0, 1.0, (n, s, 1)).astype(np.float32),
    }


def _reflect_material(rng, n=6):
    return {
        "albedo": rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32),
        "specular_albedo": rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32),
        "roughness": rng.uniform(0.05, 1.0, (n, 1)).astype(np.float32),
        "F_0": rng.uniform(0.02, 0.1, (n, 1)).astype(np.float32),
        "metalness": rng.uniform(0.0, 1.0, (n, 1)).astype(np.float32),
        "diffuseness": rng.uniform(0.0, 1.0, (n, 1)).astype(np.float32),
        "mirrorness": rng.uniform(0.0, 1.0, (n, 1)).astype(np.float32),
    }


def test_integrate_reflect_rays_parity(ref):
    """Reflection-integral estimators vs
    internal/inverse_render/render_utils.py:1102-1193."""
    rng = _rng(77)
    material = _reflect_material(rng)
    for use_corr in (False, True):
        samples = _reflect_samples(rng)
        ours = render_utils.integrate_reflect_rays(
            "microfacet", use_corr, material, samples, max_radiance=3.0)
        theirs = ref.render_utils.integrate_reflect_rays(
            "microfacet", use_corr, material, samples, max_radiance=3.0)
        assert set(ours) == set(theirs)
        for k in theirs:
            assert_close(ours[k], theirs[k], atol=1e-5, rtol=1e-4)


def test_transient_integrate_reflect_rays_parity(ref):
    """Time-binned reflection estimators vs
    internal/inverse_render/render_utils.py:1195-1302 (direct lobe without
    correction integrals; indirect lobe with and without)."""
    rng = _rng(78)
    material = _reflect_material(rng)

    samples = _reflect_samples(rng)
    ours = render_utils.transient_integrate_reflect_rays(
        "microfacet", False, material, samples, direct=True, max_radiance=3.0)
    theirs = ref.render_utils.transient_integrate_reflect_rays(
        "microfacet", False, material, samples, direct=True, max_radiance=3.0)
    assert ours["indirect_occ"] is None and theirs["indirect_occ"] is None
    for k in theirs:
        if theirs[k] is not None:
            assert_close(ours[k], theirs[k], atol=1e-5, rtol=1e-4)

    for use_corr in (False, True):
        samples = _reflect_samples(rng, bins=4)
        ours = render_utils.transient_integrate_reflect_rays(
            "microfacet", use_corr, material, samples, direct=False,
            max_radiance=3.0)
        theirs = ref.render_utils.transient_integrate_reflect_rays(
            "microfacet", use_corr, material, samples, direct=False,
            max_radiance=3.0)
        assert set(ours) == set(theirs)
        for k in theirs:
            assert_close(ours[k], theirs[k], atol=1e-5, rtol=1e-4)
