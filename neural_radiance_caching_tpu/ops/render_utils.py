"""Path-tracing toolkit: importance samplers, GGX BRDF, MIS, vMF lights.

Behavioral parity target: reference internal/inverse_render/render_utils.py.
Provides the secondary-ray machinery the material stage uses to query the
radiance cache: local-frame importance samplers (uniform/cosine/GGX/light/
env-map/vMF), multiple importance sampling with the power heuristic, the
Disney-ish microfacet lobe, Monte-Carlo estimators over secondary samples,
vMF mixture evaluation/sampling, and the transient helpers (iToF projection,
Gaussian pyramids, causal bin masking).

Everything is batched dense math: rotations are 3x3 matmuls, samplers are
closed-form transforms of 2D uniforms, and MIS weights are computed for all
samplers against all samples with no data-dependent control flow.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.engine import gin_config as gin
from neural_radiance_caching_tpu.ops import math as math_utils
from neural_radiance_caching_tpu.ops import ref_utils
from neural_radiance_caching_tpu.utils.jaxutil import random_split

DENOMINATOR_EPS = 1e-5


# --- frames ------------------------------------------------------------------


def get_rotation_matrix(normal, y_up=False):
    """Rotation matrix mapping local +z to `normal` (columns are the frame)."""
    old_z = jnp.array([0.0, 0.0, 1.0])[None]
    old_y = jnp.array([0.0, 1.0, 0.0])[None]
    if y_up:
        up = jnp.where(jnp.abs(normal[..., 1:2]) < 0.9, old_y, old_z)
    else:
        up = jnp.where(jnp.abs(normal[..., 2:3]) < 0.9, old_z, old_y)
    new_x = jnp.cross(up, normal)
    new_x = new_x / (jnp.linalg.norm(new_x, axis=-1, keepdims=True) + 1e-10)
    new_z = normal
    new_y = jnp.cross(new_z, new_x)
    new_y = new_y / (jnp.linalg.norm(new_y, axis=-1, keepdims=True) + 1e-10)
    return jnp.stack([new_x, new_y, new_z], axis=-1)


def global_to_local(directions, rot):
    return (
        directions[..., 0:1] * rot[..., 0, :]
        + directions[..., 1:2] * rot[..., 1, :]
        + directions[..., 2:3] * rot[..., 2, :]
    )


def local_to_global(directions, rot):
    return (
        directions[..., 0:1] * rot[..., 0]
        + directions[..., 1:2] * rot[..., 1]
        + directions[..., 2:3] * rot[..., 2]
    )


def reflect_local(wo):
    """Mirror about the local +z axis."""
    return jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)


def get_directions(envmap_h, envmap_w):
    """Equirect pixel-center directions and solid-angle element."""
    omega_phi, omega_theta = jnp.meshgrid(
        jnp.linspace(-jnp.pi, jnp.pi, envmap_w + 1)[:-1] + 2.0 * jnp.pi / (2.0 * envmap_w),
        jnp.linspace(0.0, jnp.pi, envmap_h + 1)[:-1] + jnp.pi / (2.0 * envmap_h),
    )
    dtheta_dphi = (omega_theta[1, 1] - omega_theta[0, 0]) * (omega_phi[1, 1] - omega_phi[0, 0])
    omega_theta = omega_theta.flatten()
    omega_phi = omega_phi.flatten()
    omega_xyz = jnp.stack(
        [
            jnp.sin(omega_theta) * jnp.cos(omega_phi),
            jnp.sin(omega_theta) * jnp.sin(omega_phi),
            jnp.cos(omega_theta),
        ],
        axis=-1,
    )
    return omega_theta, omega_phi, omega_xyz, dtheta_dphi


def get_sphere_directions(height, width, flip=False):
    """Equirect sphere directions with the Trainer probe's convention
    (reference utils.py:55-84): phi runs π→-π, and `flip` swaps the pole axis
    to -x for captures whose light frame is x-forward."""
    phi, theta = jnp.meshgrid(
        jnp.linspace(jnp.pi, -jnp.pi, width, endpoint=False)
        - 2.0 * jnp.pi / (2.0 * width),
        jnp.linspace(0.0, jnp.pi, height, endpoint=False)
        + jnp.pi / (2.0 * height),
    )
    dtheta_dphi = (2.0 * jnp.pi / width) * (jnp.pi / height)
    theta = theta.flatten()
    phi = phi.flatten()
    if flip:
        xyz = jnp.stack(
            [
                -jnp.cos(theta),
                jnp.sin(theta) * jnp.cos(phi),
                jnp.sin(theta) * jnp.sin(phi),
            ],
            axis=-1,
        )
    else:
        xyz = jnp.stack(
            [
                jnp.sin(theta) * jnp.cos(phi),
                jnp.sin(theta) * jnp.sin(phi),
                jnp.cos(theta),
            ],
            axis=-1,
        )
    return theta, phi, xyz, dtheta_dphi


# --- 2D sample generators ----------------------------------------------------


@flax.struct.dataclass
class RandomGenerator2D:
    """Optionally-stratified uniform samples in [0, 1)^2."""

    h_blocks: Any
    w_blocks: Any
    stratified: Any

    @classmethod
    def create(cls, n, stratified):
        h_blocks = int(2 ** np.int32(np.floor((np.log2(n) - 1) / 2.0)))
        w_blocks = h_blocks * 2
        return cls(h_blocks, w_blocks, stratified)

    def sample(self, rng, n, _):
        key, rng = random_split(rng)
        u = jax.random.uniform(key, shape=(n, 2))
        uh, uw = u[..., 0], u[..., 1]
        if self.stratified:
            h_shifts = (
                jnp.linspace(0.0, 1.0, self.w_blocks + 1)[:-1][None, :]
                .repeat(n // self.w_blocks, 0)
                .flatten()
            )
            w_shifts = (
                jnp.linspace(0.0, 1.0, self.h_blocks + 1)[:-1][:, None]
                .repeat(n // self.h_blocks, 1)
                .flatten()
            )
            eps = np.finfo(np.float32).eps
            uh = jnp.clip(h_shifts + uh / self.w_blocks, 0.0, 1.0 - eps)
            uw = jnp.clip(w_shifts + uw / self.h_blocks, 0.0, 1.0 - eps)
        return uh, uw


@flax.struct.dataclass
class DummySampler2D:
    global_dirs: bool = False
    return_rgb: bool = False
    deterministic: bool = False

    def sample(self, *_):
        return None, None


# --- importance samplers -----------------------------------------------------
#
# Each sampler maps 2D uniforms (u1, u2) to directions in the local shading
# frame (+z = normal) unless global_dirs, plus a pdf; `pdf()` evaluates the
# density of arbitrary directions for MIS.


@flax.struct.dataclass
class UniformSphereSampler:
    global_dirs: bool = True
    return_rgb: bool = False
    deterministic: bool = False

    def sample_directions(self, rng, u1, u2, wo, _, light_idx, kwargs):
        costheta = 1.0 - 2.0 * u1
        sintheta = jnp.sqrt((1.0 - u1) * 4.0 * u1)
        phi = u2 * 2.0 * jnp.pi - jnp.pi
        wi = jnp.stack(
            [sintheta * jnp.cos(phi), sintheta * jnp.sin(phi), costheta], axis=-1
        )
        return wi, jnp.full_like(phi, 1 / (4.0 * jnp.pi))

    def pdf(self, wo, wi, _, kwargs):
        return jnp.full_like(wi[..., 2], 1 / (4.0 * jnp.pi))


class UniformHemisphereSampler:
    global_dirs: bool = False
    return_rgb: bool = False
    deterministic: bool = False

    def sample_directions(self, rng, u1, u2, wo, _, light_idx, kwargs):
        costheta = 1.0 - u1
        sintheta = jnp.sqrt((2.0 - u1) * u1)
        phi = u2 * 2.0 * jnp.pi - jnp.pi
        wi = jnp.stack(
            [sintheta * jnp.cos(phi), sintheta * jnp.sin(phi), costheta], axis=-1
        )
        return wi, jnp.full_like(phi, 1 / (2.0 * jnp.pi))

    def pdf(self, wo, wi, _, kwargs):
        pdf = jnp.full_like(wi[..., 2], 1 / (2.0 * jnp.pi))
        return jnp.maximum(jnp.where(wi[..., 2] < 0, 0.0, pdf), 0.0)


class CosineSampler:
    global_dirs: bool = False
    return_rgb: bool = False
    deterministic: bool = False

    def sample_directions(self, rng, u1, u2, wo, _, light_idx, kwargs):
        r = jnp.sqrt(u1)
        phi = u2 * 2.0 * jnp.pi - jnp.pi
        wi_x = r * jnp.cos(phi)
        wi_y = r * jnp.sin(phi)
        wi_z = jnp.sqrt(jnp.maximum(DENOMINATOR_EPS, 1.0 - wi_x**2 - wi_y**2))
        return jnp.stack([wi_x, wi_y, wi_z], axis=-1), jnp.maximum(wi_z / jnp.pi, 0.0)

    def pdf(self, wo, wi, _, kwargs):
        pdf = wi[..., 2] / jnp.pi
        return jnp.maximum(jnp.where(wi[..., 2] < 0, 0.0, pdf), 0.0)


class IdentitySampler:
    global_dirs: bool = False
    return_rgb: bool = False
    deterministic: bool = True

    def sample_directions(self, rng, u1, u2, wo, _, light_idx, kwargs):
        return wo, jnp.ones_like(wo[..., 0])

    def pdf(self, wo, wi, _, kwargs):
        return jnp.ones_like(wo[..., 0])


class ActiveSampler:
    """Deterministic sampler pointing at the active light source."""

    global_dirs: bool = True
    return_rgb: bool = False
    deterministic: bool = True

    def sample_directions(self, rng, u1, u2, wo, _, light_idx, kwargs):
        light_offset = kwargs["lights"] - kwargs["origins"]
        light_dists = jnp.linalg.norm(light_offset, axis=-1, keepdims=True)
        light_dirs = light_offset / jnp.maximum(light_dists, 1e-5)
        return light_dirs.reshape(wo.shape), jnp.ones_like(wo[..., 0])

    def pdf(self, wo, wi, _, kwargs):
        return jnp.ones_like(wo[..., 0])


class MirrorSampler:
    global_dirs: bool = False
    return_rgb: bool = False
    deterministic: bool = False

    def sample_directions(self, rng, u1, u2, wo, _, light_idx, kwargs):
        wi = reflect_local(wo)
        return wi, jnp.ones_like(wi[..., 0])

    def pdf(self, wo, wi, _, kwargs):
        return jnp.zeros_like(wi[..., 2])


def GGX_D(costheta, a):
    """Trowbridge-Reitz normal distribution."""
    eps = np.finfo(np.float32).eps
    return a**2 / jnp.maximum(eps, jnp.pi * ((costheta**2 * (a**2 - 1.0) + 1.0)) ** 2)


def GGX_G1(w, a):
    """Smith masking term for GGX: 2cosθ / (cosθ + sqrt(a² + (1-a²)cos²θ))."""
    eps = np.finfo(np.float32).eps
    cos_t = jnp.abs(w[..., 2])
    return 2.0 * cos_t / jnp.maximum(
        eps, cos_t + jnp.sqrt(a**2 + (1.0 - a**2) * cos_t**2)
    )


@flax.struct.dataclass
class MicrofacetSampler:
    """GGX half-vector importance sampler."""

    sample_visible: bool = False
    global_dirs: bool = False
    return_rgb: bool = False
    deterministic: bool = False

    def _sample_visible_normals(self, u1, u2, wo, alpha):
        """VNDF sampling of GGX visible normals (Heitz 2018).

        Draws microfacet normals proportional to D(m)·G1(wo)·max(0, wo·m),
        which removes the wasted samples of plain D-sampling at grazing
        angles. The reference leaves this path unimplemented
        (render_utils.py:502-504); implementing it is a strict improvement.
        """
        eps = np.finfo(np.float32).eps
        a = jnp.broadcast_to(alpha, wo.shape[:-1])[..., None]
        # Stretch wo into the unit-roughness configuration.
        vh = math_utils.normalize(
            jnp.concatenate([a * wo[..., :2], wo[..., 2:]], axis=-1)
        )
        # Orthonormal frame around vh, robust when vh ≈ ±z.
        lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
        inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, eps))
        t1 = jnp.where(
            (lensq > eps)[..., None],
            jnp.stack(
                [-vh[..., 1] * inv_len, vh[..., 0] * inv_len, jnp.zeros_like(inv_len)],
                axis=-1,
            ),
            jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), vh.shape),
        )
        t2 = jnp.cross(vh, t1)
        # Uniform disk sample warped onto the projected hemisphere.
        r = jnp.sqrt(u1)
        phi = u2 * 2.0 * jnp.pi - jnp.pi
        p1 = r * jnp.cos(phi)
        p2 = r * jnp.sin(phi)
        s = 0.5 * (1.0 + vh[..., 2])
        p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1**2)) + s * p2
        nh = (
            p1[..., None] * t1
            + p2[..., None] * t2
            + jnp.sqrt(jnp.maximum(0.0, 1.0 - p1**2 - p2**2))[..., None] * vh
        )
        # Unstretch back to the true roughness.
        ne = math_utils.normalize(
            jnp.concatenate(
                [a * nh[..., :2], jnp.maximum(nh[..., 2:], 1e-6)], axis=-1
            )
        )
        alpha_b = a[..., 0]
        pdf = (
            GGX_G1(wo, alpha_b)
            * jnp.maximum(jnp.sum(wo * ne, axis=-1), 0.0)
            * GGX_D(ne[..., 2], alpha_b)
            / jnp.maximum(jnp.abs(wo[..., 2]), eps)
        )
        return ne, jnp.maximum(pdf, 0.0)

    def sample_normals(self, u1, u2, alpha):
        if self.sample_visible:
            raise NotImplementedError(
                "visible-normal sampling needs wo; use sample_directions"
            )
        eps = np.finfo(np.float32).eps
        tantheta2 = alpha**2 * u1 / jnp.maximum(1.0 - u1, eps)
        costheta = 1.0 / jnp.sqrt(jnp.maximum(1.0 + tantheta2, eps))
        sintheta = jnp.sqrt(jnp.maximum(DENOMINATOR_EPS, 1.0 - costheta**2))
        phi = u2 * 2.0 * jnp.pi - jnp.pi
        n = jnp.stack([sintheta * jnp.cos(phi), sintheta * jnp.sin(phi), costheta], axis=-1)
        pdf = GGX_D(costheta, alpha) * jnp.abs(costheta)
        return n, jnp.maximum(pdf, 0.0)

    def sample_directions(self, rng, u1, u2, wo, alpha, light_idx, kwargs):
        if self.sample_visible:
            normals, normal_pdf = self._sample_visible_normals(u1, u2, wo, alpha[..., 0])
        else:
            normals, normal_pdf = self.sample_normals(u1, u2, alpha[..., 0])
        # Reflect wo about the sampled microfacet normal.
        directions = 2.0 * jnp.sum(wo * normals, axis=-1, keepdims=True) * normals - wo
        eps = np.finfo(np.float32).eps
        jac = 1.0 / jnp.maximum(4.0 * jnp.sum(wo * normals, axis=-1), eps)
        pdf = normal_pdf * jac
        pdf = jnp.where(jnp.sum(wo * normals, axis=-1) <= 0.0, 0.0, pdf)
        return math_utils.normalize(directions), jnp.maximum(pdf, 0.0)

    def pdf(self, wo, wi, alpha, kwargs):
        normals = math_utils.normalize(wo + wi)
        eps = np.finfo(np.float32).eps
        jac = 1.0 / jnp.maximum(4.0 * jnp.sum(wo * normals, axis=-1), eps)
        if self.sample_visible:
            # VNDF density: D(m)·G1(wo)·(wo·m)/cosθo, times the half-vector
            # jacobian 1/(4 wo·m) → D(m)·G1(wo)/(4 cosθo).
            pdf = (
                GGX_D(normals[..., 2], alpha[..., 0])
                * GGX_G1(wo, alpha[..., 0])
                / jnp.maximum(4.0 * jnp.abs(wo[..., 2]), eps)
            )
        else:
            pdf = GGX_D(normals[..., 2], alpha[..., 0]) * jnp.abs(normals[..., 2]) * jac
        pdf = jnp.where(jnp.sum(wo * normals, axis=-1) <= 0.0, 0.0, pdf)
        return jnp.maximum(pdf, 0.0)


@gin.configurable
class EnvironmentSampler:
    """Importance sampler over a known environment map's pmf."""

    global_dirs: bool = True
    return_rgb: bool = True
    deterministic: bool = False
    samples_to_take: int = 256

    def __init__(self, samples_to_take=256):
        self.samples_to_take = samples_to_take

    def sample_directions(self, rng, u1, u2, wo, _, light_idx, kwargs):
        num_samples = u1.shape[-1]
        bs = wo.reshape(-1, num_samples, 3).shape[0]
        pmf = kwargs["env_map_pmf"]
        pdf_return = kwargs["env_map_pdf"]
        light_dirs = kwargs["env_map_dirs"]
        light_rgbs = kwargs["env_map"]

        if (bs * num_samples) % self.samples_to_take != 0:
            samples_to_take = bs * num_samples
            reps = 1
        else:
            samples_to_take = self.samples_to_take
            reps = bs * num_samples // self.samples_to_take

        key, rng = random_split(rng)
        idx = jax.random.categorical(
            key,
            math_utils.safe_log(pmf),
            axis=-2,
            shape=(pmf.shape[:-2] + (samples_to_take, pmf.shape[-1])),
        )

        sg = jax.lax.stop_gradient
        take3 = lambda v: jnp.repeat(
            sg(jnp.take_along_axis(v, idx[..., None], axis=-3)), reps, 0
        ).reshape(u1.shape + (-1, 3))
        dirs = take3(light_dirs)
        rgbs = take3(light_rgbs)
        pdf = jnp.repeat(sg(jnp.take_along_axis(pdf_return, idx, axis=-2)), reps, 0).reshape(
            u1.shape + (-1,)
        )

        light_idx = light_idx.reshape(u1.shape[:-1] + (1, 1))
        dirs = jnp.take_along_axis(dirs, light_idx[..., None], axis=-2)[..., 0, :]
        pdf = jnp.take_along_axis(pdf, light_idx, axis=-1)[..., 0]
        rgbs = jnp.take_along_axis(rgbs, light_idx[..., None], axis=-2)[..., 0, :]
        return dirs, pdf, rgbs

    def pdf(self, wo, wi, _, kwargs):
        # Dense equirect pdf evaluation for MIS against the envmap sampler.
        pdf_map = kwargs["env_map_pdf"]
        dirs = kwargs["env_map_dirs"]
        # Nearest-direction lookup: argmax of dot product.
        sims = jnp.einsum("...c,...nc->...n", wi, dirs[..., 0, :, :])
        idx = jnp.argmax(sims, axis=-1)
        return jnp.take_along_axis(pdf_map[..., 0], idx[..., None], axis=-1)[..., 0]


class QuadratureEnvmapSampler:
    """Deterministic equirectangular quadrature over a GT environment map.

    Every sample is an env-map texel direction with pdf 1/(2π² sinθ): the
    reciprocal of an equirect texel's solid-angle weight, so the MC estimator
    sum(f/pdf)/N becomes fixed-grid quadrature of ∫f dΩ. Use as the ONLY
    sampler with num_secondary_samples equal to (a divisor of) the texel
    count — this is the GT-relighting evaluation path
    (reference render_utils.py:1431-1491; that version returns the full grid
    and is unregistered — here a strided texel subset supports any sample
    count and the sampler is registered as "quadrature"). Directions are
    world-frame, hence global_dirs=True (the reference's False is unreachable
    there).
    """

    global_dirs: bool = True
    return_rgb: bool = True
    deterministic: bool = True

    def sample_directions(self, rng, u1, u2, wo, _, light_idx, kwargs):
        del rng, u2
        dirs = jax.lax.stop_gradient(kwargs["env_map_dirs"]).reshape(-1, 3)
        rgbs = jax.lax.stop_gradient(kwargs["env_map"]).reshape(-1, 3)
        total = dirs.shape[0]
        n = u1.shape[-1]
        idx = jnp.round(jnp.linspace(0, total - 1, n)).astype(jnp.int32)
        sub_dirs = jnp.broadcast_to(dirs[idx], u1.shape + (3,))
        sub_rgbs = jnp.broadcast_to(rgbs[idx], u1.shape + (3,))
        sintheta = jnp.sqrt(jnp.maximum(1.0 - sub_dirs[..., 2] ** 2, 1e-12))
        pdf = 1.0 / (2.0 * jnp.pi**2 * sintheta)
        return sub_dirs, jnp.maximum(pdf, 0.0), sub_rgbs

    def pdf(self, wo, wi, _, kwargs):
        sintheta = jnp.sqrt(jnp.maximum(1.0 - wi[..., 2] ** 2, 1e-12))
        return 1.0 / (2.0 * jnp.pi**2 * sintheta)


# --- vMF mixtures -------------------------------------------------------------


def eval_vmf(x, means, kappa):
    """von Mises-Fisher density at directions x."""
    eps = np.finfo(np.float32).eps
    vals = kappa * math_utils.safe_exp(kappa * jnp.sum(x * means, axis=-1)) / (
        4 * jnp.pi * jnp.sinh(kappa)
    )
    return jnp.where(kappa <= eps, jnp.ones_like(means[..., 0]) / (4.0 * jnp.pi), vals)


def expand_vmf_vars(vmf_vars, x):
    means, kappas, logits = vmf_vars
    means = jnp.repeat(means[None], x.shape[0], axis=0)
    kappas = jnp.repeat(kappas[None], x.shape[0], axis=0)
    return means, kappas, logits


def sample_vmf_vars(rng, vmf_vars, x):
    key, rng = random_split(rng)
    latents = jax.random.categorical(key, logits=vmf_vars[2], axis=-1, shape=(x.shape[0],))
    means = jnp.take_along_axis(vmf_vars[0], latents[..., None, None], axis=-2)[..., 0, :]
    kappas = jnp.take_along_axis(vmf_vars[1], latents[..., None], axis=-1)[..., 0]
    return means, kappas, vmf_vars[2]


def filter_vmf_vars(vmf_vars, sample_normals, t1=0.1, t2=0.09):
    """Down-weight lobes pointing below the surface."""
    means, kappas, logits = vmf_vars
    dotprod = (
        ref_utils.l2_normalize(means, grad_eps=1e-5) * sample_normals[..., None, :]
    ).sum(axis=-1)
    new_logits = logits + jax.lax.stop_gradient(dotprod - t2) / (t1 - t2)
    logits = jnp.where(dotprod > t1, logits, new_logits)
    return means, kappas, logits


def sample_vmf(rng, vmf_vars, x, n_dirs):
    """Sample directions from a vMF mixture (mitsuba vmf.pdf recipe)."""
    key, rng = random_split(rng)
    mean, kappa, _ = sample_vmf_vars(key, vmf_vars, x)

    t_vec = jnp.stack([-mean[..., 1], mean[..., 0], jnp.zeros_like(mean[..., 0])], axis=-1)
    t_vec = ref_utils.l2_normalize(t_vec)
    b_vec = ref_utils.l2_normalize(jnp.cross(mean, t_vec))
    rotmat = jnp.stack([t_vec, b_vec, mean], axis=-1)

    key, rng = random_split(rng)
    v = ref_utils.l2_normalize(jax.random.normal(key, shape=mean.shape[:-1] + (n_dirs, 2)))
    key, rng = random_split(rng)
    tmp = jax.random.uniform(key, shape=mean.shape[:-1] + (n_dirs,))
    eps = np.finfo(np.float32).eps
    w = 1.0 + (1.0 / jnp.maximum(kappa[..., None], eps)) * math_utils.safe_log(
        tmp + (1.0 - tmp) * jnp.exp(-2.0 * kappa[..., None])
    )
    rand_dirs = jnp.stack(
        [
            math_utils.safe_sqrt(1.0 - w**2) * v[..., 0],
            math_utils.safe_sqrt(1.0 - w**2) * v[..., 1],
            w,
        ],
        axis=-1,
    )
    return jnp.matmul(rotmat[..., None, :, :], rand_dirs[..., None])[..., 0]


class LightSampler:
    """Importance sampler over a learned vMF mixture (LightMLP output)."""

    global_dirs: bool = True
    return_rgb: bool = False
    deterministic: bool = False

    def _vars(self, kwargs):
        means = ref_utils.l2_normalize(kwargs["vmf_means"], grad_eps=1e-5)
        return means, kwargs["vmf_kappas"][..., 0], kwargs["vmf_logits"][..., 0]

    def sample_directions(self, rng, u1, u2, wo, _, light_idx, kwargs):
        means, kappas, logits = self._vars(kwargs)
        weights = jax.nn.softmax(logits)
        key, rng = random_split(rng)
        dirs = sample_vmf(key, (means, kappas, logits), wo, n_dirs=u1.shape[-1])
        pdf = jnp.sum(
            weights[..., None, :]
            * eval_vmf(dirs[..., None, :], means[..., None, :, :], kappas[..., None, :]),
            axis=-1,
        )
        return dirs, jnp.maximum(pdf, 0.0)

    def pdf(self, wo, wi, _, kwargs):
        means, kappas, logits = self._vars(kwargs)
        weights = jax.nn.softmax(logits)
        pdf = jnp.sum(
            weights[..., None, :]
            * eval_vmf(wi[..., None, :], means[..., None, :, :], kappas[..., None, :]),
            axis=-1,
        )
        return jnp.maximum(pdf, 0.0)


def vmf_loss_fn(
    vmf_vars,
    sample_normals,
    sample_dirs,
    samples,
    function_vals,
    function_vals_nocorr,
    lossmult,
    linear_to_srgb=True,
):
    """Unbiased NLL-style loss fitting a vMF mixture to sampled radiance."""
    from neural_radiance_caching_tpu.ops import image as image_ops

    means = ref_utils.l2_normalize(vmf_vars[0], grad_eps=1e-5)
    kappas = vmf_vars[1][..., 0]
    weights_mix = math_utils.safe_exp(vmf_vars[2][..., 0])

    likelihood = jnp.sum(
        weights_mix[..., None, :]
        * eval_vmf(sample_dirs[..., None, :], means[..., None, :, :], kappas[..., None, :]),
        axis=-1,
    )
    denominator = jnp.maximum(samples["pdf"][..., 0], 1e-2)
    dotprod = (sample_dirs * sample_normals[..., None, :]).sum(axis=-1)
    weight = jnp.clip(samples["weight"][..., 0], 0.0, 10.0)
    weight = jnp.where(dotprod > 0.0, weight, 0.0)

    if linear_to_srgb:
        function_vals = image_ops.linear_to_srgb(jnp.maximum(function_vals, 1e-5))
        function_vals_nocorr = image_ops.linear_to_srgb(jnp.maximum(function_vals_nocorr, 1e-5))
        likelihood = image_ops.linear_to_srgb(jnp.maximum(likelihood, 1e-5))

    return jnp.mean(
        (function_vals - likelihood)
        * jax.lax.stop_gradient(function_vals_nocorr - likelihood)
        * weight
        * lossmult
        / denominator
    )


# --- BRDF lobe ----------------------------------------------------------------


def get_lobe(wi, wo, normal, materials, brdf_correction, config):
    """Evaluate the BRDF (times n.l) in local coordinates.

    Disney-ish microfacet: GGX D*F*G/(4 n.v) specular + Lambertian diffuse,
    mixed by metalness/diffuseness/mirrorness (render_utils.py:566-695).
    """
    if config.shading in ["mirror"]:
        return 1.0

    lobe = 0.0
    if config.shading in ["lambertian", "phong", "blinnphong", "microfacet"]:
        lobe = jnp.maximum(0.0, wi[..., 2:]) * materials["albedo"][..., None, :] / jnp.pi

    if "microfacet" in config.shading:
        eps = np.finfo(np.float32).eps
        roughness = materials["roughness"][..., None, :]
        F_0 = materials["F_0"][..., None, :]
        albedo = materials["albedo"][..., None, :]
        metalness = materials["metalness"][..., None, :]

        if config.use_specular_albedo:
            specular_albedo = materials["specular_albedo"][..., None, :]
        else:
            specular_albedo = albedo
        if config.use_mirrorness:
            mirrorness = materials["mirrorness"][..., None, :]
        else:
            mirrorness = jnp.ones_like(metalness)
        if config.use_diffuseness:
            diffuseness = materials["diffuseness"][..., None, :]
            if not config.use_mirrorness:
                mirrorness = 1.0 - diffuseness
        else:
            diffuseness = 1.0 - metalness

        F_0 = specular_albedo * metalness + F_0 * (1.0 - metalness)

        halfdirs = math_utils.normalize(wi + wo)
        n_dot_v = jnp.maximum(0.0, math_utils.dot(normal, wo))
        n_dot_l = jnp.maximum(0.0, math_utils.dot(normal, wi))
        n_dot_h = jnp.maximum(0.0, math_utils.dot(normal, halfdirs))
        l_dot_h = jnp.maximum(0.0, math_utils.dot(wi, halfdirs))
        a = roughness

        F = F_0 + (1.0 - F_0) * jnp.power(jnp.clip(1.0 - l_dot_h, 0.0, 1.0), 5)
        D = GGX_D(n_dot_h, a)
        k = a / 2
        G = (n_dot_v / jnp.maximum(eps, n_dot_v * (1.0 - k) + k)) * (
            n_dot_l / jnp.maximum(eps, n_dot_l * (1.0 - k) + k)
        )
        ggx_lobe = D * F * G / jnp.maximum(eps, 4.0 * n_dot_v)
        lambertian_lobe = n_dot_l * albedo / jnp.pi

        if config.shading == "microfacet":
            lobe = (
                ggx_lobe * brdf_correction[..., 0:1] * mirrorness
                + lambertian_lobe * brdf_correction[..., 1:2] * diffuseness
            )
        elif config.shading == "microfacet_diffuse":
            lobe = lambertian_lobe * brdf_correction[..., 1:2] * diffuseness
        elif config.shading == "microfacet_specular":
            lobe = ggx_lobe * brdf_correction[..., 0:1] * mirrorness

    if config.shading == "phong":
        specular_albedo = materials["specular_albedo"][..., None, :]
        exponent = materials["specular_exponent"][..., None, :]
        refdir = reflect_local(wo)
        lobe += specular_albedo * jnp.maximum(0.0, (refdir * wi).sum(-1, keepdims=True)) ** exponent

    return lobe


# --- MIS sampling -------------------------------------------------------------


def importance_sample_rays(
    rng,
    global_viewdirs,
    normal,
    material,
    random_generator_2d=None,
    stratified_sampling=False,
    use_mis=True,
    samplers=None,
    num_secondary_samples=None,
    light_sampler_results=None,
):
    """Sample secondary directions from a set of samplers with MIS weights.

    Follows render_utils.py:722-924: per sampler, draw its share of samples,
    compute the power-heuristic MIS weight against all samplers, then
    optionally resample down to num_secondary_samples.
    """
    rotation_mat = get_rotation_matrix(normal)
    local_viewdirs = global_to_local(global_viewdirs, rotation_mat)
    roughness = material.get("roughness", jnp.ones_like(local_viewdirs))

    if light_sampler_results is not None:
        light_idx = light_sampler_results.get(
            "light_idx", jnp.ones_like(local_viewdirs[..., :1]).astype(jnp.int32)
        )
    else:
        light_idx = jnp.ones_like(local_viewdirs[..., :1]).astype(jnp.int32)

    num_real_samples = sum(count for _, count in samplers)
    resample = num_real_samples > num_secondary_samples

    local_lightdirs, pdf, rgb, weight = [], [], [], []
    del_rgb = False

    for sampler, sample_count in samplers:
        if resample:
            real_count = sample_count
        else:
            real_count = int(
                round((float(sample_count) / num_real_samples) * num_secondary_samples)
            )

        key, rng = random_split(rng)
        uh, uw = random_generator_2d.sample(
            key, local_viewdirs.shape[0] * real_count, stratified_sampling
        )
        uh = uh.reshape(local_viewdirs.shape[0], real_count)
        uw = uw.reshape(local_viewdirs.shape[0], real_count)

        cur_viewdirs = jnp.repeat(local_viewdirs[..., None, :], real_count, axis=-2)
        cur_roughness = jnp.repeat(roughness[..., None, :], real_count, axis=-2)

        key, rng = random_split(rng)
        if sampler.return_rgb:
            cur_dirs, cur_pdf, cur_rgb = sampler.sample_directions(
                key, uh, uw, cur_viewdirs, cur_roughness, light_idx, light_sampler_results
            )
        else:
            cur_dirs, cur_pdf = sampler.sample_directions(
                key, uh, uw, cur_viewdirs, cur_roughness, light_idx, light_sampler_results
            )
            del_rgb = True
            cur_rgb = jnp.ones_like(cur_pdf)[..., None]

        if sampler.global_dirs:
            cur_dirs = global_to_local(cur_dirs, rotation_mat[..., None, :, :])

        if use_mis and len(samplers) > 1:
            # Power heuristic: w_i ∝ (n_i p_i)^2 / sum_j (n_j p_j)^2.
            denominator = 0.0
            for sampler_p, count_p in samplers:
                if sampler_p.global_dirs:
                    temp_viewdirs = local_to_global(cur_viewdirs, rotation_mat[..., None, :, :])
                    temp_lightdirs = local_to_global(cur_dirs, rotation_mat[..., None, :, :])
                else:
                    temp_viewdirs = cur_viewdirs
                    temp_lightdirs = cur_dirs
                denominator += jnp.square(
                    sampler_p.pdf(temp_viewdirs, temp_lightdirs, cur_roughness,
                                  light_sampler_results)
                    * count_p
                )
            cur_pdf = jnp.maximum(cur_pdf, 0.0)
            denominator = jnp.maximum(denominator, DENOMINATOR_EPS)
            cur_weight = jnp.square(sample_count * cur_pdf) / denominator
            cur_weight = cur_weight * (float(num_real_samples) / float(sample_count))
        else:
            cur_pdf = jnp.maximum(cur_pdf, 0.0)
            cur_weight = jnp.ones_like(cur_pdf)

        local_lightdirs.append(cur_dirs)
        pdf.append(cur_pdf)
        weight.append(cur_weight)
        rgb.append(cur_rgb)

    local_lightdirs = jnp.concatenate(local_lightdirs, axis=-2)
    local_viewdirs_rep = jnp.repeat(local_viewdirs[..., None, :], num_secondary_samples, axis=-2)
    global_viewdirs_rep = jnp.repeat(
        global_viewdirs[..., None, :], num_secondary_samples, axis=-2
    )
    pdf = jnp.concatenate(pdf, axis=-1)[..., None]
    weight = jnp.concatenate(weight, axis=-1)[..., None]
    rgb = jnp.concatenate(rgb, axis=-2)

    global_lightdirs = local_to_global(local_lightdirs, rotation_mat[..., None, :, :])

    samples = {
        "local_lightdirs": local_lightdirs,
        "local_viewdirs": local_viewdirs_rep,
        "global_lightdirs": global_lightdirs,
        "global_viewdirs": global_viewdirs_rep,
        "pdf": jax.lax.stop_gradient(pdf),
        "rgb": jax.lax.stop_gradient(rgb),
        "weight": jax.lax.stop_gradient(weight),
    }
    if del_rgb:
        del samples["rgb"]

    if resample:
        probs = jnp.ones_like(pdf)
        key, rng = random_split(rng)
        inds = jax.random.categorical(
            key,
            math_utils.safe_log(probs),
            axis=-2,
            shape=(pdf.shape[:-2] + (num_secondary_samples,)),
        )[..., None]
        samples = jax.tree_util.tree_map(
            lambda x: jnp.take_along_axis(x, inds, axis=-2), samples
        )
        samples["weight"] = samples["weight"] * (
            float(num_real_samples) / float(num_secondary_samples)
        )

    return samples


def get_secondary_rays(
    rng,
    rays,
    means,
    viewdirs,
    normals,
    material,
    normal_eps=1e-2,
    refdir_eps=1e-2,
    random_generator_2d=None,
    stratified_sampling=False,
    use_mis=True,
    samplers=None,
    num_secondary_samples=None,
    light_sampler_results=None,
    offset_origins=False,
    light_rotation=None,
    far=None,
):
    """Fan a Rays batch out into [N*S] secondary rays at surface points.

    Origins are offset along the normal; directions come from MIS importance
    sampling (render_utils.py:927-1056). All camera-frame fields are broadcast
    so the cache sees well-formed rays.
    """
    ref_origins = means + jax.lax.stop_gradient(normals * normal_eps)
    ref_origins = jnp.repeat(ref_origins[..., None, :], num_secondary_samples, axis=-2)

    global_viewdirs = -viewdirs[..., None, :] * jnp.ones_like(means)
    material = jax.tree_util.tree_map(lambda x: x.reshape(-1, x.shape[-1]), material)

    if light_sampler_results is not None and ("env_map" not in light_sampler_results):
        light_sampler_results = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[-2:]), light_sampler_results
        )

    key, rng = random_split(rng)
    ref_samples = importance_sample_rays(
        key,
        global_viewdirs.reshape(-1, 3),
        normals.reshape(-1, 3),
        material,
        random_generator_2d=random_generator_2d,
        stratified_sampling=stratified_sampling,
        use_mis=use_mis,
        samplers=samplers,
        num_secondary_samples=num_secondary_samples,
        light_sampler_results=light_sampler_results,
    )

    new_sh = (-1, num_secondary_samples, 3)
    bcast3 = lambda v: (v[..., None, None, :] * jnp.ones_like(ref_origins)).reshape(new_sh)
    bcast1 = lambda v, dtype=None: (
        v[..., None, None] * jnp.ones_like(ref_origins[..., :1]).astype(v.dtype)
    ).reshape(new_sh[:-1] + (1,))

    ref_rays = rays.replace(
        near=(refdir_eps * jnp.ones_like(ref_origins[..., :1])).reshape(new_sh[:-1] + (1,)),
        far=(
            (rays.far[..., None, None] if far is None else far)
            * jnp.ones_like(ref_origins[..., :1])
        ).reshape(new_sh[:-1] + (1,)),
        cam_idx=bcast1(rays.cam_idx),
        light_idx=bcast1(rays.light_idx),
        lights=bcast3(rays.lights),
        imageplane=(
            rays.imageplane[..., None, None, :] * jnp.ones_like(ref_origins[..., :2])
        ).reshape(new_sh[:-1] + (2,)),
        look=bcast3(rays.look),
        up=bcast3(rays.up),
        cam_origins=bcast3(rays.cam_origins),
        vcam_look=bcast3(rays.vcam_look),
        vcam_up=bcast3(rays.vcam_up),
        vcam_origins=bcast3(rays.vcam_origins),
        origins=ref_origins.reshape(new_sh),
        directions=ref_samples["global_lightdirs"].reshape(new_sh),
        viewdirs=ref_samples["global_lightdirs"].reshape(new_sh),
    )
    ref_rays = ref_rays.replace(
        radii=jnp.ones_like(ref_rays.directions[..., :1]),
        lossmult=bcast1(rays.lossmult),
    )

    if offset_origins:
        ref_rays = ref_rays.replace(
            origins=ref_rays.origins + ref_rays.directions * ref_rays.near,
            near=jnp.zeros_like(ref_rays.near),
        )

    if light_rotation is not None:
        ref_rays = ref_rays.replace(
            directions=local_to_global(ref_rays.directions, light_rotation.reshape(-1, 1, 3, 3)),
            viewdirs=local_to_global(ref_rays.viewdirs, light_rotation.reshape(-1, 1, 3, 3)),
        )

    ref_samples = jax.tree_util.tree_map(
        lambda x: x.reshape(new_sh[:-1] + (x.shape[-1],)), ref_samples
    )
    return ref_rays, ref_samples


def get_outgoing_rays(
    rng,
    rays,
    viewdirs,
    normals,
    material,
    random_generator_2d=None,
    stratified_sampling=False,
    use_mis=True,
    samplers=None,
    num_secondary_samples=None,
):
    """Replace ray viewdirs by importance-sampled outgoing directions."""
    global_viewdirs = -viewdirs[..., None, :] * jnp.ones_like(normals)
    material = jax.tree_util.tree_map(lambda x: x.reshape(-1, x.shape[-1]), material)
    key, rng = random_split(rng)
    ref_samples = importance_sample_rays(
        key,
        global_viewdirs.reshape(-1, 3),
        normals.reshape(-1, 3),
        material,
        random_generator_2d=random_generator_2d,
        stratified_sampling=stratified_sampling,
        use_mis=use_mis,
        samplers=samplers,
        num_secondary_samples=num_secondary_samples,
    )
    return rays.replace(
        viewdirs=-ref_samples["global_lightdirs"].reshape(rays.viewdirs.shape)
    )


# --- Monte Carlo estimators -----------------------------------------------------


def _shading_config(material_type, use_brdf_correction, use_diffuseness, use_mirrorness,
                    use_specular_albedo):
    cfg = type("", (), {})()
    cfg.shading = material_type
    cfg.use_brdf_correction = use_brdf_correction
    cfg.use_diffuseness = use_diffuseness
    cfg.use_mirrorness = use_mirrorness
    cfg.use_specular_albedo = use_specular_albedo
    return cfg


def _lobe_estimates(cfg, material, samples, max_radiance, bins_main=False,
                    bins_mult=False):
    """Importance-weighted estimator means shared by the reflection integrators.

    Every output is a mean over the secondary-sample axis of
    ``clip(L_in * response) * w / pdf`` for some per-sample ``response``
    (the full BRDF lobe for outgoing radiance, the cosine lobe for
    irradiance, the learned correction factors for the multiplier
    integrals). Samples whose direction falls below the local horizon
    (z <= 0 in the surface frame) contribute zero weight.

    ``bins_main`` / ``bins_mult`` insert a broadcast axis in front of the
    channel axis so time-binned incoming radiance ``[P, S, bins, C]``
    integrates against per-sample responses/weights ``[P, S, C]``.

    Estimator surface matches the reference
    (internal/inverse_render/render_utils.py:1102-1302).
    """
    z_up = samples["local_lightdirs"][..., 2:]
    surface_frame_normal = jnp.concatenate(
        [jnp.zeros_like(samples["local_lightdirs"][..., :2]), jnp.ones_like(z_up)],
        axis=-1,
    )
    brdf_response = get_lobe(
        samples["local_lightdirs"],
        samples["local_viewdirs"],
        surface_frame_normal,
        jax.tree_util.tree_map(lambda x: x.reshape(-1, x.shape[-1]), material),
        samples["brdf_correction"],
        cfg,
    )
    cosine_response = jnp.maximum(0.0, z_up) / jnp.pi

    mc_w = jnp.where(z_up > 0.0, jnp.maximum(samples["weight"], 0.0), 0.0)
    inv_p = jnp.maximum(samples["pdf"], DENOMINATOR_EPS)
    incoming = samples["radiance_in"]
    binned = lambda x: x[..., None, :]

    def estimate(response, lift):
        if lift:
            return (
                jnp.clip(incoming * binned(response), 0.0, max_radiance)
                * binned(mc_w) / binned(inv_p)
            ).mean(1)
        return (
            jnp.clip(incoming * response, 0.0, max_radiance) * mc_w / inv_p
        ).mean(1)

    out = {
        "radiance_out": estimate(brdf_response, bins_main),
        "irradiance": estimate(cosine_response, bins_main),
    }

    correction = samples["brdf_correction"]
    if cfg.use_brdf_correction:
        # The correction integrals are NOT radiance-clipped.
        out["integrated_multiplier"] = (
            (correction * mc_w / inv_p).mean(1) / (2 * jnp.pi)
        )
        if bins_mult:
            out["integrated_multiplier_irradiance"] = (
                binned(correction[..., 1:2]) * incoming * binned(cosine_response)
                * binned(mc_w) / binned(inv_p)
            ).mean(1)
        else:
            out["integrated_multiplier_irradiance"] = (
                correction[..., 1:2] * incoming * cosine_response * mc_w / inv_p
            ).mean(1)
    else:
        out["integrated_multiplier"] = correction[:, 0]
        out["integrated_multiplier_irradiance"] = correction[:, 0, :1]
    return out


def integrate_reflect_rays(
    material_type,
    use_brdf_correction,
    material,
    samples,
    use_diffuseness=False,
    use_mirrorness=False,
    use_specular_albedo=False,
    max_radiance=float("inf"),
):
    """MC estimate of one lobe's reflection integral over secondary samples."""
    cfg = _shading_config(
        material_type, use_brdf_correction, use_diffuseness, use_mirrorness,
        use_specular_albedo,
    )
    out = _lobe_estimates(cfg, material, samples, max_radiance)
    out["indirect_occ"] = samples["indirect_occ"].mean(1)
    return out


def transient_integrate_reflect_rays(
    material_type,
    use_brdf_correction,
    material,
    samples,
    use_diffuseness=False,
    use_mirrorness=False,
    use_specular_albedo=False,
    direct=True,
    max_radiance=float("inf"),
):
    """Time-binned variant: indirect incoming radiance carries a bins axis."""
    cfg = _shading_config(
        material_type, use_brdf_correction, use_diffuseness, use_mirrorness,
        use_specular_albedo,
    )
    out = _lobe_estimates(
        cfg, material, samples, max_radiance,
        bins_main=not direct, bins_mult=True,
    )
    out["indirect_occ"] = None if direct else samples["indirect_occ"].mean(1)
    return out


def integrate_irradiance(samples):
    eps = np.finfo(np.float32).eps
    denominator = jnp.maximum(samples["pdf"], eps)
    weight = jnp.maximum(samples["weight"], 0.0)
    weight = jnp.where(samples["local_lightdirs"][..., 2:] > 0.0, weight, 0.0)
    diffuse_lobe = jnp.maximum(0.0, samples["local_lightdirs"][..., 2:]) / jnp.pi
    return (samples["radiance_in"] * diffuse_lobe * weight / denominator).mean(1)


# --- environment / structured light ------------------------------------------


def _bilerp_2d(img, yx):
    """Bilinear lookup of [H, W, C] at float [N, 2] (y, x), clamped edges."""
    h, w = img.shape[0], img.shape[1]
    y = jnp.clip(yx[..., 0], 0.0, h - 1.0)
    x = jnp.clip(yx[..., 1], 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (y - y0)[..., None]
    wx = (x - x0)[..., None]
    g = lambda yi, xi: img[yi, xi]
    return (
        g(y0, x0) * (1 - wy) * (1 - wx)
        + g(y0, x1) * (1 - wy) * wx
        + g(y1, x0) * wy * (1 - wx)
        + g(y1, x1) * wy * wx
    )


def get_environment_color(ref_rays, env_map, env_map_w, env_map_h):
    """Equirect lookup of an env map along ray viewdirs (multi-illum aware)."""
    x = ref_rays.viewdirs[..., 0:1]
    y = ref_rays.viewdirs[..., 1:2]
    z = ref_rays.viewdirs[..., 2:3]
    x, y, z = x, z, -y

    sin_theta = jnp.sqrt(x * x + y * y + 1e-8)
    phi = jnp.arctan2(y / (sin_theta + 1e-8), x / (sin_theta + 1e-8))
    theta = jnp.arctan2(sin_theta, z)

    phi = ((-phi + jnp.pi) / (2 * jnp.pi)) * env_map_w
    theta = (theta / jnp.pi) * env_map_h
    locations = jnp.concatenate([theta, phi], axis=-1).reshape(-1, 2)

    img = env_map.reshape(env_map_h, env_map_w, -1)
    # Half-pixel centering like the reference's jax_resample_2d path.
    values = _bilerp_2d(img, locations).reshape(ref_rays.origins.shape[:-1] + (-1, 3))
    light_idx = ref_rays.light_idx
    return jnp.take_along_axis(values, light_idx[..., None], axis=-2)[..., 0, :]


def get_sl_color(
    pattern,
    pattern_width,
    pattern_height,
    up,
    look,
    points,
    lights,
    hfov=10.0,
    vfov=10.0,
    shift=(0.0, 0.0),
    mult=5.0,
    invert=False,
):
    """Structured-light projector pattern color at 3D points."""
    del invert
    fx = pattern_width / (2.0 * np.tan(np.radians(hfov)))
    fy = pattern_height / (2.0 * np.tan(np.radians(vfov)))
    cx = pattern_width / 2.0
    cy = pattern_height / 2.0

    light_dirs = points - lights
    light_dirs = jnp.concatenate(
        [
            math_utils.dot(light_dirs, jnp.cross(look, up)),
            -math_utils.dot(light_dirs, up),
            math_utils.dot(light_dirs, look),
        ],
        axis=-1,
    )
    light_dirs = light_dirs / light_dirs[..., 2:3]

    light_pix = jnp.concatenate(
        [
            light_dirs[..., 1:2] * fy + cy + shift[1],
            light_dirs[..., 0:1] * fx + cx + shift[0],
        ],
        axis=-1,
    )
    img = pattern.reshape(pattern_height, pattern_width, -1)
    values = _bilerp_2d(img, light_pix.reshape(-1, 2)).reshape(points.shape[:-1] + (-1,))
    return values[..., :1] * mult


# --- transient helpers ---------------------------------------------------------


def dtof_to_itof(dtof_data, frequency_phase_shifts, bin_to_total_dist):
    """Project d-ToF transients onto iToF correlation measurements."""
    sh = dtof_data.shape
    dtof_data = dtof_data.reshape(-1, sh[-2], sh[-1])
    num_bins = dtof_data.shape[-2]
    c = 299792458
    time_to_travel = jnp.linspace(0, num_bins * bin_to_total_dist, num_bins, endpoint=False) / c
    itof_data = []
    for frequency, phase_shift in frequency_phase_shifts:
        for trig in (jnp.cos, jnp.sin):
            w = trig(2 * np.pi * frequency * time_to_travel + phase_shift) + 1.0
            itof_data.append((w[None, :, None] * dtof_data).sum(axis=-2, keepdims=True))
    itof_data.append(dtof_data.sum(axis=-2, keepdims=True) / 2.0)
    itof_data = jnp.concatenate(itof_data, axis=-2)
    return itof_data.reshape(sh[:-2] + (-1, sh[-1]))


def dtof_to_gauss(dtof_data, sigma_scales, constant_scale):
    """Gaussian-pyramid projections of d-ToF transients."""
    sh = dtof_data.shape
    dtof_data = dtof_data.reshape(-1, sh[-2], sh[-1])
    conv_data = []
    for sigma, scale in sigma_scales:
        taps = jnp.arange(round(-4 * sigma), round(4 * sigma) + 1)
        filt = jnp.exp(-(taps**2) / (2 * sigma**2)) - jnp.exp(-8.0)
        conv_data.append(
            jax.scipy.signal.convolve(dtof_data, filt[None, :, None], mode="same") * scale
        )
    conv_data.append(dtof_data.sum(axis=-2, keepdims=True) * constant_scale)
    conv_data = jnp.concatenate(conv_data, axis=-2)
    return conv_data.reshape(sh[:-2] + (-1, sh[-1]))


def zero_invalid_bins(
    transient_indirect_diffuse, transient_indirect_specular, rays, means, config
):
    """Causality mask: zero bins light cannot reach or that arrive too late."""
    shape_trans = transient_indirect_diffuse.shape
    bins = jnp.arange(config.n_bins).reshape(
        (1,) * (len(shape_trans) - 2) + (config.n_bins, 1)
    )

    hist_dists_light = (bins + config.bin_zero_threshold_light) * config.exposure_time
    light_dists = jnp.linalg.norm(rays.lights[..., None, :] - means, axis=-1, keepdims=True)
    mask_near = hist_dists_light < light_dists[..., None, :]
    transient_indirect_diffuse = jnp.where(mask_near, 0.0, transient_indirect_diffuse)
    transient_indirect_specular = jnp.where(mask_near, 0.0, transient_indirect_specular)

    hist_dists_cam = bins * config.exposure_time
    max_dists = (config.n_bins - 1) * config.exposure_time
    cam_dists = jnp.linalg.norm(
        rays.origins[..., None, :] - means, axis=-1, keepdims=True
    ) + jnp.linalg.norm(
        rays.origins[..., None, :] - rays.cam_origins[..., None, :], axis=-1, keepdims=True
    )
    mask_far = (hist_dists_cam + cam_dists[..., None, :]) > max_dists
    transient_indirect_diffuse = jnp.where(mask_far, 0.0, transient_indirect_diffuse)
    transient_indirect_specular = jnp.where(mask_far, 0.0, transient_indirect_specular)

    if config.light_zero:
        mask_zero = light_dists[..., None, :] < config.light_near
        transient_indirect_diffuse = jnp.where(mask_zero, 0.0, transient_indirect_diffuse)
        transient_indirect_specular = jnp.where(mask_zero, 0.0, transient_indirect_specular)

    return transient_indirect_diffuse, transient_indirect_specular


IMPORTANCE_SAMPLER_BY_NAME = {
    "light": LightSampler,
    "environment": EnvironmentSampler,
    "quadrature": QuadratureEnvmapSampler,
    "microfacet": MicrofacetSampler,
    "cosine": CosineSampler,
    "uniform": UniformHemisphereSampler,
    "uniform_sphere": UniformSphereSampler,
    "identity": IdentitySampler,
    "active": ActiveSampler,
    "mirror": MirrorSampler,
}
