"""Tests for ray primitives, marching tetrahedra, and mesh sampling."""

import numpy as np
import jax
import jax.numpy as jnp

from permuto_sdf_tpu.ops.ray_primitives import Sphere, AABB
from permuto_sdf_tpu.ops.marching_cubes import marching_tetrahedra, extract_mesh_from_sdf_fn
from permuto_sdf_tpu.datasets.mesh_io import (
    make_uv_sphere, make_torus, sample_points_on_mesh, compute_vertex_normals,
)


def test_sphere_intersection_analytic():
    s = Sphere(0.5, (0, 0, 0))
    origins = jnp.asarray([[0.0, 0.0, -2.0], [0.0, 0.0, -2.0], [0.0, 2.0, -2.0],
                           [0.0, 0.0, 0.0]])
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
                        [0.0, 0.0, 1.0]])
    p0, t0, p1, t1, hit = s.ray_intersection(origins, dirs)
    hit = np.asarray(hit)[:, 0]
    assert hit[0] and not hit[1] and not hit[2] and hit[3]
    np.testing.assert_allclose(float(t0[0, 0]), 1.5, atol=1e-5)
    np.testing.assert_allclose(float(t1[0, 0]), 2.5, atol=1e-5)
    # origin inside the sphere: entry clamped to 0
    np.testing.assert_allclose(float(t0[3, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(t1[3, 0]), 0.5, atol=1e-5)


def test_aabb_intersection():
    box = AABB()
    origins = jnp.asarray([[-2.0, 0.0, 0.0], [-2.0, 2.0, 0.0]])
    dirs = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    p0, t0, p1, t1, hit = box.ray_intersection(origins, dirs)
    assert bool(hit[0, 0]) and not bool(hit[1, 0])
    np.testing.assert_allclose(float(t0[0, 0]), 1.5, atol=1e-5)
    np.testing.assert_allclose(float(t1[0, 0]), 2.5, atol=1e-5)


def test_rand_points_inside():
    s = Sphere(0.5, (0.1, 0.0, 0.0))
    pts = s.rand_points_inside(jax.random.PRNGKey(0), 4096)
    d = np.linalg.norm(np.asarray(pts) - np.array([0.1, 0, 0]), axis=-1)
    assert d.max() <= 0.5 + 1e-5
    # roughly uniform in volume: mean radius of uniform ball = 3/4 R
    np.testing.assert_allclose(d.mean(), 0.375, atol=0.02)

    box = AABB()
    pts = np.asarray(box.rand_points_inside(jax.random.PRNGKey(1), 4096))
    assert (pts >= -0.5).all() and (pts <= 0.5).all()


def test_marching_tets_sphere():
    n = 48
    ax = np.linspace(-0.5, 0.5, n, dtype=np.float32)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - 0.3
    V, F = marching_tetrahedra(sdf, 0.0, origin=(-0.5,) * 3,
                               spacing=(1.0 / (n - 1),) * 3)
    assert len(V) > 500 and len(F) > 1000
    r = np.linalg.norm(V, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.3, atol=5e-3)
    assert np.abs(r - 0.3).max() < 0.02

    # normals must point outward (toward positive sdf): signed volume > 0
    v0, v1, v2 = V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]
    signed_vol = np.sum(np.einsum("ij,ij->i", v0, np.cross(v1, v2))) / 6.0
    vol_true = 4.0 / 3.0 * np.pi * 0.3 ** 3
    np.testing.assert_allclose(signed_vol, vol_true, rtol=0.05)


def test_marching_tets_is_watertight_on_sphere():
    n = 24
    ax = np.linspace(-0.5, 0.5, n, dtype=np.float32)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - 0.3
    V, F = marching_tetrahedra(sdf, 0.0)
    # every edge appears exactly twice (once per direction) in a closed mesh
    edges = np.concatenate([F[:, [0, 1]], F[:, [1, 2]], F[:, [2, 0]]])
    und = np.sort(edges, axis=1)
    _, counts = np.unique(und, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_extract_mesh_from_sdf_fn_chunked():
    def sdf_fn(pts):
        return jnp.linalg.norm(pts, axis=-1, keepdims=True) - 0.25

    V, F = extract_mesh_from_sdf_fn(sdf_fn, 50, -0.5, 0.5, block=32)
    r = np.linalg.norm(V, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.25, atol=5e-3)


def test_mesh_sampling():
    mesh = make_uv_sphere(radius=0.3)
    rng = np.random.default_rng(0)
    pts, nrm = sample_points_on_mesh(mesh, 5000, rng)
    r = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(r, 0.3, atol=0.01)  # points on the sphere
    # normals ~ radial
    cos = np.einsum("ij,ij->i", nrm, pts / r[:, None])
    assert cos.min() > 0.95

    torus = make_torus()
    pts, nrm = sample_points_on_mesh(torus, 2000, rng)
    assert np.isfinite(pts).all() and np.isfinite(nrm).all()


def test_vertex_normals_outward_on_sphere():
    mesh = make_uv_sphere(radius=0.3)
    nv = compute_vertex_normals(mesh.V, mesh.F)
    r = np.linalg.norm(mesh.V, axis=-1, keepdims=True)
    ok = r[:, 0] > 1e-6
    cos = np.einsum("ij,ij->i", nv[ok], mesh.V[ok] / r[ok])
    assert cos.min() > 0.9
