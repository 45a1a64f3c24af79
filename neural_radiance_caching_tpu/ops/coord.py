"""Coordinate contractions, ray warps, and positional encodings.

Behavioral parity targets: reference internal/coord.py (contraction family
:27-136, ray warps :223-261, IPE :268-313, Gaussian tracking :138-210,
unscented transform :484-611).

The per-scale contraction wrappers keep the reference's gin-visible names
(contract_radius_5, contract_cube_2, ...) so scene configs bind unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.ops import geopoly, math


# --- Contractions -----------------------------------------------------------


def contract(x):
    """mip-NeRF 360 spherical contraction (Eq. 10 of arxiv/2111.12077)."""
    x_mag_sq = jnp.maximum(1, jnp.sum(x**2, axis=-1, keepdims=True))
    scale = (2 * jnp.sqrt(x_mag_sq) - 1) / x_mag_sq
    return scale * x


def inv_contract(z, eps=1e-8):
    z_mag_sq = jnp.maximum(1, jnp.sum(z**2, axis=-1, keepdims=True))
    inv_scale = jnp.maximum(eps, 2 * jnp.sqrt(z_mag_sq) - z_mag_sq)
    return z / inv_scale


def contract_cube(x):
    """L∞ analogue of contract(): squashes space into a cube."""
    x_max = jnp.maximum(1, jnp.max(jnp.abs(x), axis=-1, keepdims=True))
    scale = (2 * x_max - 1) / x_max**2
    return scale * x


def inv_contract_cube(z, eps=1e-8):
    z_max = jnp.maximum(1, jnp.max(jnp.abs(z), axis=-1, keepdims=True))
    inv_scale = jnp.maximum(eps, 2 * z_max - z_max**2)
    return z / inv_scale


def contract_projective(x):
    """MERF-style projective contraction (coord.py:99-118)."""
    x_abs = jnp.abs(x)
    x_max = jnp.maximum(1, jnp.max(x_abs, axis=-1, keepdims=True))
    x_max = (x_max + 1) / 2.0
    scale = 1 / x_max
    z = scale * x
    idx = jnp.argmax(x_abs, axis=-1, keepdims=True)
    negative = jnp.take_along_axis(z, idx, axis=-1) < 0
    o = jnp.where(negative, -2 + scale, 2 - scale)
    ival = jnp.arange(x.shape[-1]).reshape([1] * (x.ndim - 1) + [x.shape[-1]])
    return jnp.where(x_max <= 1, x, jnp.where(ival == idx, o, z))


def inv_contract_projective(z):
    z_abs = jnp.abs(z)
    z_max = jnp.maximum(1, jnp.max(z_abs, axis=-1, keepdims=True))
    inv_z_max = jnp.maximum(np.finfo(np.float32).eps, 2 - z_max)
    scale = 1 / inv_z_max
    x = scale * z
    scale = scale * 2 - 1
    idx = jnp.argmax(z_abs, axis=-1, keepdims=True)
    negative = jnp.take_along_axis(x, idx, axis=-1) < 0
    o = jnp.where(negative, -scale, scale)
    ival = jnp.arange(z.shape[-1]).reshape([1] * (z.ndim - 1) + [z.shape[-1]])
    return jnp.where(z_max <= 1, z, jnp.where(ival == idx, o, x))


# gin-visible per-scale wrappers (coord.py:27-60).
def contract_constant(x, c=7.0):
    return x / c


def contract_constant_1(x, c=1.0):
    return x / c


def contract_radius_5(x):
    return contract(x / 5.0)


def contract_radius_2(x):
    return contract(x / 2.0)


def contract_radius_1_2(x):
    return contract(x / 0.5)


def contract_radius_1_4(x):
    return contract(x / 0.25)


def contract_cube_5(x):
    return contract_cube(x / 5.0)


def contract_cube_2(x):
    return contract_cube(x / 2.0)


def contract_cube_1_2(x):
    # NOTE: reference divides by 0.25 here as well (coord.py:56-57).
    return contract_cube(x / 0.25)


def contract_cube_1_4(x):
    return contract_cube(x / 0.25)


def contract3_isoscale(x):
    """Isotropic scale of contract()'s Jacobian for 3D inputs (coord.py:204-210)."""
    if x.shape[-1] != 3:
        raise ValueError(f"Inputs must be 3D, are {x.shape[-1]}D.")
    norm_sq = jnp.maximum(1, jnp.sum(x**2, axis=-1))
    return jnp.exp(2 / 3 * jnp.log(2 * jnp.sqrt(norm_sq) - 1) - jnp.log(norm_sq))


# --- Gaussian tracking through warps ---------------------------------------


def track_linearize(fn, mean, cov):
    """Push a Gaussian through fn by linearization: cov' = J cov J^T."""
    if (len(mean.shape) + 1) != len(cov.shape):
        raise ValueError("cov must be non-diagonal")
    fn_mean, lin_fn = jax.linearize(fn, mean)
    fn_cov = jax.vmap(lin_fn, -1, -2)(jax.vmap(lin_fn, -1, -2)(cov))
    return fn_mean, fn_cov


def track_isotropic(fn, mean, scale):
    """Isotropic variant: scale' = scale * |det J|^(1/d) (coord.py:162-201)."""
    if mean.shape[:-1] != scale.shape:
        raise ValueError(f"mean {mean.shape}[:-1] != scale {scale.shape}.")
    d = mean.shape[-1]
    fn_mean, lin_fn = jax.linearize(fn, mean)
    if scale is not None:
        jac = jax.vmap(lin_fn, in_axes=-1, out_axes=-1)(
            jnp.broadcast_to(jnp.eye(d), mean.shape + (d,))
        )
        eps = jnp.finfo(jnp.float32).tiny
        abs_det = jnp.maximum(eps, jnp.abs(jnp.linalg.det(jac)))
        fn_scale = scale * (jnp.cbrt(abs_det) if d == 3 else abs_det ** (1 / d))
    else:
        fn_scale = None
    return fn_mean, fn_scale


def isotropize(cov, mode="accurate"):
    """Replace covariances with isotropic ones of equal determinant."""
    d = cov.shape[-1]
    if d == 1:
        return cov
    if mode == "fast":
        det = jnp.linalg.det(cov)
        diag_val = det ** (1 / d)
        invalid = (det <= jnp.finfo(jnp.float32).tiny) | ~jnp.isfinite(det)
    elif mode == "accurate":
        log_det = jnp.linalg.slogdet(cov)[1]
        diag_val = jnp.exp(log_det / d)
        invalid = ~jnp.isfinite(log_det)
    else:
        raise ValueError(f"mode={mode} not implemented.")
    cov_iso = jnp.eye(d) * diag_val[..., None, None]
    return jnp.where(invalid[..., None, None], jnp.zeros_like(cov), cov_iso)


# --- Ray distance warps -----------------------------------------------------


def piecewise_warp_fwd(x, eps=np.finfo(np.float32).eps):
    """Linear in [0, 1], 1 − 0.5/x beyond (allows t_near = 0)."""
    return jnp.where(x < 1, 0.5 * x, 1 - 0.5 / jnp.maximum(eps, x))


def piecewise_warp_inv(x, eps=np.finfo(np.float32).eps):
    return jnp.where(x < 0.5, 2 * x, 0.5 / jnp.maximum(eps, 1 - x))


def construct_ray_warps(fn, t_near, t_far, *, fn_inv=None):
    """Bijection between metric distance t and normalized distance s ∈ [0, 1].

    fn may be None (identity), 'piecewise', or a callable with a known or
    supplied inverse (coord.py:223-260).
    """
    if fn is None:
        fn_fwd = lambda x: x
        fn_inv = lambda x: x
    elif fn == "piecewise":
        fn_fwd = piecewise_warp_fwd
        fn_inv = piecewise_warp_inv
    else:
        fn_fwd = fn
        if fn_inv is None:
            inv_mapping = {
                "reciprocal": jnp.reciprocal,
                "log": jnp.exp,
                "exp": jnp.log,
                "sqrt": jnp.square,
                "square": jnp.sqrt,
            }
            fn_inv = inv_mapping[fn.__name__]
    s_near, s_far = [fn_fwd(x) for x in (t_near, t_far)]
    t_to_s = lambda t: (fn_fwd(t) - s_near) / (s_far - s_near)
    s_to_t = lambda s: fn_inv(s * s_far + (1 - s) * s_near)
    return t_to_s, s_to_t


# --- Positional encodings ---------------------------------------------------


def expected_sin(mean, var):
    """E[sin(x)] for x ~ N(mean, var)."""
    return jnp.exp(-0.5 * var) * math.safe_sin(mean)


def integrated_pos_enc(mean, var, min_deg, max_deg, dtype=None):
    """IPE: expected sinusoids of a Gaussian at scales 2^[min_deg, max_deg).

    dtype: optional compute/output dtype (e.g. bfloat16). Casting BEFORE the
    frequency lift keeps every [..., n_dims * n_freqs] intermediate at half
    width — at secondary-ray fan-outs one f32 scaled-mean buffer alone is
    ~2GB — and loses nothing downstream when the consuming trunk matmul runs
    in bf16 anyway. High-frequency phase error is damped by the exp(-var/2)
    mip weight.
    """
    if dtype is not None:
        mean = mean.astype(dtype)
        var = var.astype(dtype)
    scales = 2.0 ** jnp.arange(min_deg, max_deg, dtype=mean.dtype)
    shape = mean.shape[:-1] + (-1,)
    scaled_mean = jnp.reshape(mean[..., None, :] * scales[:, None], shape)
    scaled_var = jnp.reshape(var[..., None, :] * scales[:, None] ** 2, shape)
    out = expected_sin(
        jnp.concatenate([scaled_mean, scaled_mean + 0.5 * jnp.pi], axis=-1),
        jnp.concatenate([scaled_var] * 2, axis=-1),
    )
    # Named so a remat policy can pin the lifted features as saved residuals
    # (identity outside jax.checkpoint): recomputing the lift in the backward
    # is cheap in FLOPs but re-materializes the largest elementwise buffers
    # in the step, which shows up as layout-copy time on TPU.
    from jax import ad_checkpoint

    return ad_checkpoint.checkpoint_name(out, "ipe_lift")


def pos_enc(x, min_deg, max_deg, append_identity=True):
    """Classic NeRF positional encoding."""
    scales = 2.0 ** jnp.arange(min_deg, max_deg)
    shape = x.shape[:-1] + (-1,)
    scaled_x = jnp.reshape(x[..., None, :] * scales[:, None], shape)
    four_feat = jnp.sin(jnp.concatenate([scaled_x, scaled_x + 0.5 * jnp.pi], axis=-1))
    if append_identity:
        return jnp.concatenate([x, four_feat], axis=-1)
    return four_feat


def pos_enc_window(min_deg, max_deg, alpha):
    """Truncated-Hann frequency window used by windowed_pos_enc."""
    bands = jnp.arange(min_deg, max_deg)
    x = jnp.clip(alpha - bands, 0.0, 1.0)
    return 0.5 * (1 + jnp.cos(jnp.pi * x + jnp.pi))


def windowed_pos_enc(x, min_deg, max_deg, alpha, append_identity=False):
    """Nerfies-style eased-in positional encoding."""
    window = pos_enc_window(min_deg, max_deg, alpha)
    window = jnp.repeat(window, x.shape[-1])
    window = jnp.tile(window, 2)
    four_feat = window * pos_enc(x, min_deg, max_deg, append_identity=False)
    if append_identity:
        return jnp.concatenate([x, four_feat], axis=-1)
    return four_feat


def lift_and_diagonalize(mean, cov, basis):
    """Project mean/cov onto a direction basis, keep diagonal variances."""
    fn_mean = math.matmul(mean, basis)
    fn_cov_diag = jnp.sum(basis * math.matmul(cov, basis), axis=-2)
    return fn_mean, fn_cov_diag


# --- sqrtm / unscented transform -------------------------------------------


def sqrtm(mat, return_eigs=False):
    """Matrix square root of a PSD matrix via eigendecomposition."""
    eigvec, eigval = jax.lax.linalg.eigh(mat, symmetrize_input=False, sort_eigenvalues=False)
    scaling = math.safe_sqrt(eigval)[..., None, :]
    out = math.matmul(eigvec * scaling, jnp.moveaxis(eigvec, -2, -1))
    return (out, (eigvec, eigval)) if return_eigs else out


def construct_perp_basis(directions):
    """Two unit vectors perpendicular to each direction (coord.py:400-420)."""
    if directions.shape[-1] != 3:
        raise ValueError(f"directions must be 3D, got {directions.shape[-1]}D")
    cross1a = jnp.cross(directions, np.array([0.0, 0.0, 1.0]))
    cross1b = jnp.cross(directions, np.array([1.0, 1.0, 1.0]))
    use_b = jnp.all(jnp.abs(cross1a) < np.finfo(np.float32).eps, axis=-1)
    cross1 = jnp.where(use_b[..., None], cross1b, cross1a)
    cross2 = jnp.cross(directions, cross1)
    unit = lambda z: z / jnp.sqrt(jnp.sum(z**2, axis=-1, keepdims=True))
    return unit(cross1), unit(cross2)


def hexify(rng, *, origins, directions, radii, tdist):
    """Hexagonal multisample pattern over each ray interval (coord.py:423-481)."""
    thetas = (np.pi / 3) * np.array([0, 2, 4, 3, 5, 1])
    sz = tdist.shape[:-1] + (tdist.shape[-1] - 1, len(thetas))
    thetas = jnp.broadcast_to(thetas, sz)

    if rng is not None:
        key, rng = jax.random.split(rng)
        flip = jax.random.bernoulli(key, shape=sz[:-1])
        thetas = jnp.where(flip[..., None], thetas[..., ::-1], thetas)
        key, rng = jax.random.split(rng)
        thetas += (2 * jnp.pi) * jax.random.uniform(key, shape=sz[:-1])[..., None]
    else:
        flip = jnp.arange(thetas.shape[-2]) % 2
        thetas = jnp.where(flip[..., None], thetas[..., ::-1], thetas)
        thetas += (flip * jnp.pi / 6)[..., None]

    perp_axis1, perp_axis2 = construct_perp_basis(directions)

    t0, t1 = tdist[..., :-1], tdist[..., 1:]
    s = (t0 + t1) / 2
    d = (t1 - t0) / 2

    cz = t0[..., None] + math.safe_div(d, (d**2 + 3 * s**2))[..., None] * (
        (t1**2 + 2 * s**2)[..., None]
        + (3 / np.sqrt(7))
        * (np.arange(6) * (2 / 5) - 1)
        * math.safe_sqrt(((d**2 - s**2) ** 2 + 4 * s**4))[..., None]
    )

    perp_mag = jnp.sqrt(0.5) * radii[..., None, :] * cz
    cx = perp_mag * jnp.cos(thetas)
    cy = perp_mag * jnp.sin(thetas)
    control = (
        origins[..., None, None, :]
        + perp_axis1[..., None, None, :] * cx[..., None]
        + perp_axis2[..., None, None, :] * cy[..., None]
        + directions[..., None, None, :] * cz[..., None]
    )
    return control, perp_mag


def unscented_transform(mean, cov, basis, sqrt_fn="sqrtm", axis=0):
    """Sigma points along `axis` from each (mean, cov) (coord.py:484-565)."""
    d = cov.shape[-1]
    mean_ex = jnp.expand_dims(mean, axis)

    if basis == "mean":
        return mean_ex

    if basis.startswith("random_"):
        num_random = int(basis.split("_")[-1])
        noise = jax.random.multivariate_normal(
            jax.random.PRNGKey(0), jnp.zeros_like(mean), cov, (num_random,) + mean.shape[:-1]
        )
        return mean_ex + jnp.moveaxis(jnp.nan_to_num(noise), 0, axis)

    if basis.startswith("poweriter_"):
        num_iters = int(basis.split("_")[-1])
        val, vec = math.power_iteration(cov, num_iters)
        offsets = (jnp.sqrt(val)[..., None] * jnp.array([-1, 1]))[..., None]
        return mean_ex + jnp.moveaxis(offsets * vec[..., None, :], -2, axis)

    if sqrt_fn == "sqrtm":
        sqrtm_cov = sqrtm(cov)
    elif sqrt_fn == "cholesky":
        sqrtm_cov = math.safe_cholesky(cov, symmetrize_input=False)
    else:
        raise ValueError(f"sqrt_fn={sqrt_fn} not implemented.")

    if any(basis.startswith(x) for x in ("tetrahedron", "icosahedron", "octahedron")):
        if d != 3:
            raise ValueError(f"Input is {d}D; polyhedra are only defined for 3D.")
        base_shape, tess = basis.split("_")
        transform = geopoly.generate_basis(base_shape, int(tess), remove_symmetries=False).T
        transform1 = np.concatenate([np.zeros((d, 1)), transform], axis=-1)
        transform1 /= np.sqrt(np.mean(transform1**2, axis=1))[:, None]
        return mean_ex + jnp.moveaxis(math.matmul(sqrtm_cov, transform1), -1, axis)

    if basis == "julier":
        offsets = np.sqrt(d + 0.5) * jnp.moveaxis(sqrtm_cov, -1, axis)
        return jnp.concatenate([mean_ex, mean_ex + offsets, mean_ex - offsets], axis=axis)

    if basis == "menegaz":
        if d == 3:
            sqrtm_cov_sum = jnp.sum(sqrtm_cov, axis=-1, keepdims=True)
            offsets = jnp.concatenate(
                [-sqrtm_cov_sum, 2 * sqrtm_cov - sqrtm_cov_sum / 3], axis=-1
            )
            return mean_ex + jnp.moveaxis(offsets, -1, axis)
        transform = np.sqrt(d + 1) * np.eye(d) + (1 - np.sqrt(d + 1)) / d
        transform1 = np.concatenate([-np.ones((d, 1)), transform], axis=-1)
        return mean_ex + jnp.moveaxis(math.matmul(sqrtm_cov, transform1), -1, axis)

    raise ValueError(f"basis={basis} not implemented.")


def compute_control_points(
    means, covs, rays, tdist, rng, unscented_mip_basis, unscented_sqrt_fn, unscented_scale_mult
):
    """Multisample control points for grid encoders (coord.py:568-610)."""
    if unscented_mip_basis == "hexify":
        return hexify(
            rng, origins=rays.origins, directions=rays.directions, radii=rays.radii, tdist=tdist
        )
    control = unscented_transform(
        means, covs, basis=unscented_mip_basis, sqrt_fn=unscented_sqrt_fn, axis=-2
    )
    if unscented_scale_mult > 0:
        if rays is None:
            raise ValueError("Rays required when unscented_scale_mult > 0.")
        t_recon = jnp.sum(
            (control - rays.origins[..., None, None, :]) * rays.directions[..., None, None, :],
            axis=-1,
        )
        perp_mag = jnp.sqrt(0.5) * rays.radii[..., None, :] * t_recon
    else:
        perp_mag = None
    return control, perp_mag


# --- Gradient rescaling (arxiv/2305.02756) ----------------------------------


@jax.custom_vjp
def rescale_gradient(scaling, ray_results):
    del scaling
    return ray_results


def _rescale_gradient_fwd(scaling, ray_results):
    return rescale_gradient(scaling, ray_results), scaling


def _rescale_gradient_bwd(scaling, g):
    def scale_fn(gi):
        if gi is None:
            return None
        s = scaling[..., None] if gi.ndim == scaling.ndim + 1 else scaling
        return jnp.multiply(gi, s).astype(gi.dtype)

    return (jnp.zeros_like(scaling), jax.tree_util.tree_map(scale_fn, g))


rescale_gradient.defvjp(_rescale_gradient_fwd, _rescale_gradient_bwd)
