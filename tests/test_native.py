"""Native C++ marching-tets vs the NumPy reference implementation."""

import numpy as np
import pytest

from permuto_sdf_tpu.native import native_available, marching_tetrahedra_native
from permuto_sdf_tpu.ops.marching_cubes import marching_tetrahedra

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain available")


def _sphere_grid(n=40, r=0.3):
    ax = np.linspace(-0.5, 0.5, n, dtype=np.float32)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    return np.linalg.norm(g, axis=-1) - r


def test_native_matches_numpy_topology():
    sdf = _sphere_grid()
    spacing = (1.0 / 39,) * 3
    Vn, Fn = marching_tetrahedra_native(sdf, 0.0, origin=(-0.5,) * 3,
                                        spacing=spacing)
    Vr, Fr = marching_tetrahedra(sdf, 0.0, origin=(-0.5,) * 3, spacing=spacing)
    # The two implementations interpolate in float32 vs float64, so welding
    # can differ for a handful of vertices at quantization boundaries —
    # compare geometrically instead of exactly.
    assert len(Fn) == len(Fr)
    assert abs(len(Vn) - len(Vr)) <= 0.005 * len(Vr)
    from scipy.spatial import cKDTree

    d = cKDTree(Vr).query(Vn, k=1)[0]
    assert d.max() < 1e-5


def test_native_orientation_and_radius():
    sdf = _sphere_grid(48)
    V, F = marching_tetrahedra_native(sdf, 0.0, origin=(-0.5,) * 3,
                                      spacing=(1.0 / 47,) * 3)
    r = np.linalg.norm(V, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.3, atol=5e-3)
    v0, v1, v2 = V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]
    vol = np.sum(np.einsum("ij,ij->i", v0, np.cross(v1, v2))) / 6.0
    np.testing.assert_allclose(vol, 4 / 3 * np.pi * 0.3 ** 3, rtol=0.05)


def test_native_is_watertight():
    sdf = _sphere_grid(24)
    V, F = marching_tetrahedra_native(sdf, 0.0)
    edges = np.concatenate([F[:, [0, 1]], F[:, [1, 2]], F[:, [2, 0]]])
    und = np.sort(edges, axis=1)
    _, counts = np.unique(und, axis=0, return_counts=True)
    assert (counts == 2).all()
