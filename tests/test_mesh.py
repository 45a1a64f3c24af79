"""TriangleMesh intersection + the sampler's mesh-intersection shortcut.

Parity target: reference internal/sampling.py:217-233 (intersect up front,
normals flipped toward the ray) and :369-382, 576-592 (single surface sample
with unit weight / distance-to-surface annotations). The reference never
wires a mesh in (its dataset.mesh stays None), so the numeric spec here is
closed-form geometry, not reference output.
"""

import os

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from neural_radiance_caching_tpu.engine.configs import Config
from neural_radiance_caching_tpu.ops import mesh as mesh_lib
from neural_radiance_caching_tpu.utils import pytrees


def quad_mesh(z=3.0, half=5.0):
    """Two triangles forming an axis-aligned quad at depth z, normals -z."""
    v = np.array(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]],
        np.float32,
    )
    f = np.array([[0, 2, 1], [0, 3, 2]], np.int32)  # wound so normal is -z
    return mesh_lib.TriangleMesh(v, f)


def test_intersect_quad_closed_form():
    mesh = quad_mesh(z=3.0)
    o = jnp.array([[0.0, 0.0, 0.0], [1.0, 2.0, 0.0], [9.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t, points, normals, face_normals, valid = mesh.intersect(o, d)
    np.testing.assert_allclose(np.asarray(t[:2]), [3.0, 3.0], rtol=1e-5)
    assert bool(valid[0]) and bool(valid[1])
    assert not bool(valid[2])  # x=9 misses the half=5 quad
    np.testing.assert_allclose(
        np.asarray(points[1]), [1.0, 2.0, 3.0], atol=1e-5
    )
    # Geometric normal is unit +-z.
    np.testing.assert_allclose(
        np.abs(np.asarray(face_normals[0])), [0.0, 0.0, 1.0], atol=1e-6
    )


def test_intersect_unnormalized_directions_scale_t():
    # t is in units of |direction|, matching ray tdist conventions.
    mesh = quad_mesh(z=4.0)
    o = jnp.zeros((1, 3))
    d = jnp.array([[0.0, 0.0, 2.0]])
    t, _, _, _, valid = mesh.intersect(o, d)
    assert bool(valid[0])
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)


def test_intersect_nearest_hit_across_chunks():
    # Two quads; chunk=2 puts them in different scan steps, so the nearest-
    # hit merge across chunk boundaries is what's being tested.
    near = quad_mesh(z=2.0)
    far = quad_mesh(z=5.0)
    both = mesh_lib.TriangleMesh(
        np.concatenate([np.asarray(far.vertices), np.asarray(near.vertices)]),
        np.concatenate(
            [np.asarray(far.faces), np.asarray(near.faces) + 4]
        ),
    )
    o = jnp.zeros((4, 3))
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 3))
    t, _, _, _, valid = both.intersect(o, d, chunk=2)
    assert np.asarray(valid).all()
    np.testing.assert_allclose(np.asarray(t), 2.0, rtol=1e-6)


def test_vertex_normal_interpolation():
    # One triangle whose vertex normals tilt differently: the smooth normal
    # at the centroid is the normalized barycentric mean.
    v = np.array([[0, 0, 1], [2, 0, 1], [0, 2, 1]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    vn = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], np.float32)
    mesh = mesh_lib.TriangleMesh(v, f, vn)
    centroid = v.mean(0)
    o = jnp.asarray(centroid[None] - np.array([0, 0, 1], np.float32))
    d = jnp.array([[0.0, 0.0, 1.0]])
    _, _, normals, _, valid = mesh.intersect(o, d)
    assert bool(valid[0])
    expect = vn.mean(0) / np.linalg.norm(vn.mean(0))
    np.testing.assert_allclose(np.asarray(normals[0]), expect, atol=1e-5)


def test_load_obj_quads_and_normals(tmp_path):
    p = os.path.join(tmp_path, "quad.obj")
    with open(p, "w") as fh:
        fh.write(
            "# comment\n"
            "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
            "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
            "f 1//1 2//2 3//3 4//4\n"
        )
    mesh = mesh_lib.load_obj(p)
    assert mesh.num_faces == 2  # quad fanned into two triangles
    np.testing.assert_allclose(
        np.asarray(mesh.vertex_normals), [[0, 0, 1]] * 4, atol=1e-6
    )
    t, _, _, _, valid = mesh.intersect(
        jnp.array([[0.2, 0.2, -2.0]]), jnp.array([[0.0, 0.0, 1.0]])
    )
    assert bool(valid[0]) and abs(float(t[0]) - 2.0) < 1e-5


def test_sampler_mesh_shortcut_depth_parity():
    """With a mesh, the cache model's geometry IS the intersected depth:
    single sample exactly at the hit point, unit weight, mesh normals."""
    from test_train_e2e import make_tiny_model

    config = Config(
        dataset_loader="synthetic_spheres", batch_size=8, near=0.1, far=20.0
    )
    model = make_tiny_model(config)
    n = 8
    rays = pytrees.dummy_rays(n)
    origins = jnp.stack(
        [jnp.linspace(-1, 1, n), jnp.zeros(n), jnp.zeros(n)], axis=-1
    )
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    rays = rays.replace(
        origins=origins, directions=d, viewdirs=d,
        near=jnp.full((n, 1), 0.1), far=jnp.full((n, 1), 20.0),
        radii=jnp.full((n, 1), 1e-3),
    )
    mesh = quad_mesh(z=3.0)

    variables = jax.jit(lambda k, r: model.init(
        k, rng=jax.random.PRNGKey(0), rays=r, train_frac=1.0, train=False
    ))(jax.random.PRNGKey(0), rays)
    out = model.apply(
        variables, rng=jax.random.PRNGKey(1), rays=rays,
        train_frac=1.0, train=False, mesh=mesh,
    )
    geo = out["main"]["geometry"]
    # One level survives (proposals skipped), one sample per ray.
    assert geo["means"].shape == (n, 1, 3)
    expect = np.asarray(origins) + 3.0 * np.asarray(d)
    np.testing.assert_allclose(np.asarray(geo["means"][:, 0]), expect, atol=1e-4)
    np.testing.assert_allclose(np.asarray(geo["weights"]), 1.0, atol=1e-6)
    # tdist spans [0, t + 0.1] (sampling.py:376-382).
    np.testing.assert_allclose(np.asarray(geo["tdist"][:, 1]), 3.1, atol=1e-4)
    # Normals come from the mesh, flipped toward the ray (-z for +z rays).
    np.testing.assert_allclose(
        np.asarray(geo["normals_to_use"][:, 0]), [[0.0, 0.0, -1.0]] * n,
        atol=1e-5,
    )
    # And the sampler history collapsed to the single mesh level.
    assert len(out["main"]["sampler"]) == 1


@pytest.mark.slow
def test_sampler_mesh_annotations_without_shortcut():
    """use_mesh=False keeps volume sampling but annotates samples with the
    surface distance (sampling.py:578-592)."""
    from test_train_e2e import make_tiny_model

    config = Config(
        dataset_loader="synthetic_spheres", batch_size=8, near=0.1, far=20.0
    )
    model = make_tiny_model(config)
    n = 4
    rays = pytrees.dummy_rays(n)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    rays = rays.replace(
        origins=jnp.zeros((n, 3)), directions=d, viewdirs=d,
        near=jnp.full((n, 1), 0.1), far=jnp.full((n, 1), 20.0),
        radii=jnp.full((n, 1), 1e-3),
    )
    mesh = quad_mesh(z=3.0)
    variables = jax.jit(lambda k, r: model.init(
        k, rng=jax.random.PRNGKey(0), rays=r, train_frac=1.0, train=False
    ))(jax.random.PRNGKey(0), rays)
    out = model.apply(
        variables, rng=jax.random.PRNGKey(1), rays=rays,
        train_frac=1.0, train=False, mesh=mesh, use_mesh=False,
    )
    geo = out["main"]["geometry"]
    assert geo["means"].shape[1] > 1  # volume sampling intact
    np.testing.assert_allclose(
        np.asarray(geo["mesh_points"][..., 2]), 3.0, atol=1e-5
    )
    # t_to_nearest = |surface - o| - |sample - o| along the ray.
    expect = 3.0 - np.asarray(geo["means"][..., 2])
    np.testing.assert_allclose(
        np.asarray(geo["t_to_nearest"][..., 0]), expect, atol=1e-4
    )
