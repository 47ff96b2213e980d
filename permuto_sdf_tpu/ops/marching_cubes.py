"""Isosurface extraction from an SDF model — mesh-extraction capability.

Equivalent of ``extract_mesh_from_sdf_model``
(``/root/reference/permuto_sdf_py/utils/sdf_utils.py:252-292``), which
chunks the grid into 64^3 blocks, evaluates the SDF, and runs skimage's
marching cubes. skimage is not available in this environment, so the
isosurfacer is implemented natively here via **marching tetrahedra**: each
grid cube is split into 6 positively-oriented tetrahedra and each
tetrahedron emits 0-2 triangles.

The 16-entry tetrahedron case table is *generated programmatically at import
time* from the inside/outside topology, with winding fixed by a geometric
test on a canonical tetrahedron — no hand-copied tables, no transcription
bugs. Output triangles are wound so normals point toward positive SDF
(outward).

Extraction itself is vectorized NumPy over z-slabs (bounded memory at high
resolutions); the SDF evaluation is chunked jit'd JAX on device.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# Six-tetrahedra decomposition of the unit cube around the 0-7 diagonal.
# Cube corners indexed by (x, y, z) bits: corner k = (k&1, (k>>1)&1, (k>>2)&1).
_CUBE_CORNERS = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], dtype=np.int64
)
_TETS = np.array(
    [[0, 5, 1, 7], [0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7], [0, 6, 4, 7], [0, 4, 5, 7]],
    dtype=np.int64,
)

# The 6 edges of a tetrahedron as (vertex, vertex) pairs.
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int64
)


def _check_positive_orientation():
    for tet in _TETS:
        v = _CUBE_CORNERS[tet].astype(np.float64)
        det = np.linalg.det(np.stack([v[1] - v[0], v[2] - v[0], v[3] - v[0]]))
        assert det > 0, f"tet {tet} not positively oriented (det={det})"


def _build_case_table() -> Tuple[np.ndarray, np.ndarray]:
    """Returns (tri_edges [16, 2, 3], n_tris [16]).

    tri_edges[case, t] holds the 3 tet-edge ids of triangle t (-1 padded).
    Winding is derived geometrically: on a canonical positively-oriented
    tetrahedron, the triangle normal must point from the inside vertices
    toward the outside ones (toward positive SDF).
    """
    canon = np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    det = np.linalg.det(np.stack([canon[1] - canon[0], canon[2] - canon[0], canon[3] - canon[0]]))
    assert det > 0

    edge_id = {}
    for e, (a, b) in enumerate(_TET_EDGES):
        edge_id[(a, b)] = e
        edge_id[(b, a)] = e

    tri_edges = -np.ones((16, 2, 3), dtype=np.int64)
    n_tris = np.zeros(16, dtype=np.int64)

    for case in range(1, 15):
        inside = [i for i in range(4) if case & (1 << i)]
        outside = [i for i in range(4) if not (case & (1 << i))]
        sdf = np.where([case & (1 << i) for i in range(4)], -1.0, 1.0)
        # direction the normal should have: from inside centroid to outside
        want = canon[outside].mean(0) - canon[inside].mean(0)

        crossed = [
            (i, o) for i in inside for o in outside
        ]  # each (inside, outside) pair is a crossed edge

        def midpoint(i, o):
            t = (0.0 - sdf[i]) / (sdf[o] - sdf[i])
            return canon[i] + t * (canon[o] - canon[i])

        if len(crossed) == 3:
            pts = [midpoint(i, o) for i, o in crossed]
            tris = [(0, 1, 2)]
        else:  # 4 crossed edges: two inside (i,j), two outside (a,b)
            i, j = inside
            a, b = outside
            cycle = [(i, a), (i, b), (j, b), (j, a)]
            crossed = cycle
            pts = [midpoint(x, y) for x, y in cycle]
            tris = [(0, 1, 2), (0, 2, 3)]

        for t, (p, q, r) in enumerate(tris):
            n = np.cross(np.asarray(pts[q]) - pts[p], np.asarray(pts[r]) - pts[p])
            order = (p, q, r) if np.dot(n, want) > 0 else (p, r, q)
            tri_edges[case, t] = [edge_id[crossed[k]] for k in order]
        n_tris[case] = len(tris)

    return tri_edges, n_tris


_check_positive_orientation()
_TRI_EDGES, _N_TRIS = _build_case_table()


def marching_tetrahedra(values: np.ndarray, level: float = 0.0,
                        origin=(0.0, 0.0, 0.0), spacing=(1.0, 1.0, 1.0),
                        slab: int = 32) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the `level` isosurface of a dense scalar grid.

    Args:
      values: [Nx, Ny, Nz] scalar field (SDF convention: negative inside).
      origin / spacing: world placement of grid node (0,0,0) and node pitch.
      slab: number of cube-layers processed per pass (memory bound).

    Returns:
      (vertices [V, 3] float32, faces [F, 3] int64) — welded, outward
      normals toward positive values.
    """
    values = np.asarray(values, dtype=np.float32)
    nx, ny, nz = values.shape
    origin = np.asarray(origin, dtype=np.float64)
    spacing = np.asarray(spacing, dtype=np.float64)

    all_tris = []
    for z0 in range(0, nz - 1, slab):
        z1 = min(z0 + slab, nz - 1)
        # cube base coordinates in this slab
        cx, cy, cz = np.meshgrid(
            np.arange(nx - 1), np.arange(ny - 1), np.arange(z0, z1), indexing="ij"
        )
        base = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)  # [C, 3]
        # corner values [C, 8]
        corner = base[:, None, :] + _CUBE_CORNERS[None, :, :]
        cv = values[corner[..., 0], corner[..., 1], corner[..., 2]]  # [C, 8]

        # quick reject: cubes fully inside/outside
        lo = cv.min(1)
        hi = cv.max(1)
        active = (lo < level) & (hi >= level)
        if not active.any():
            continue
        base, corner, cv = base[active], corner[active], cv[active]

        # tet corner values [C, 6, 4] and positions
        tv = cv[:, _TETS]  # [C, 6, 4]
        tpos = corner[:, _TETS, :].astype(np.float64)  # [C, 6, 4, 3]
        case = ((tv < level) << np.arange(4)).sum(-1)  # [C, 6]

        tri_e = _TRI_EDGES[case]  # [C, 6, 2, 3]
        ntri = _N_TRIS[case]  # [C, 6]

        # flatten all (tet, tri) pairs that emit a triangle
        tri_mask = np.arange(2)[None, None, :] < ntri[..., None]  # [C, 6, 2]
        c_idx, t_idx, k_idx = np.nonzero(tri_mask)
        edges = tri_e[c_idx, t_idx, k_idx]  # [T, 3] tet-edge ids
        va = _TET_EDGES[edges][..., 0]  # [T, 3] tet-vertex id a
        vb = _TET_EDGES[edges][..., 1]

        sa = tv[c_idx, t_idx][np.arange(len(c_idx))[:, None], va]  # [T, 3]
        sb = tv[c_idx, t_idx][np.arange(len(c_idx))[:, None], vb]
        pa = tpos[c_idx, t_idx][np.arange(len(c_idx))[:, None], va]  # [T, 3, 3]
        pb = tpos[c_idx, t_idx][np.arange(len(c_idx))[:, None], vb]
        # canonicalize edge direction by global corner id so every tet
        # sharing a grid edge computes a bit-identical crossing position
        ga = (pa[..., 0] * ny + pa[..., 1]) * nz + pa[..., 2]
        gb = (pb[..., 0] * ny + pb[..., 1]) * nz + pb[..., 2]
        swap = ga > gb
        sa, sb = np.where(swap, sb, sa), np.where(swap, sa, sb)
        sw3 = swap[..., None]
        pa, pb = np.where(sw3, pb, pa), np.where(sw3, pa, pb)
        t = ((level - sa) / np.where(np.abs(sb - sa) < 1e-12, 1e-12, sb - sa))[..., None]
        pts = pa + np.clip(t, 0.0, 1.0) * (pb - pa)  # [T, 3, 3] grid coords
        all_tris.append(pts)

    if not all_tris:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    tris = np.concatenate(all_tris, axis=0)  # [T, 3, 3]
    # weld vertices (grid coords are exact rationals of the cell -> rounding
    # at 1e-6 of a cell is safe)
    flat = tris.reshape(-1, 3)
    keyed = np.round(flat * 1e6).astype(np.int64)
    uniq, inverse = np.unique(keyed, axis=0, return_inverse=True)
    # representative positions: first occurrence
    first = np.full(len(uniq), len(flat), dtype=np.int64)
    np.minimum.at(first, inverse, np.arange(len(flat)))
    verts = flat[first]
    faces = inverse.reshape(-1, 3)
    # drop degenerate faces
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[good]
    verts_world = origin[None, :] + verts * spacing[None, :]
    return verts_world.astype(np.float32), faces


def extract_mesh_from_sdf_fn(
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    nr_points_per_dim: int,
    min_val: float,
    max_val: float,
    threshold: float = 0.0,
    block: int = 64,
) -> Tuple[np.ndarray, np.ndarray]:
    """Chunked SDF evaluation + isosurface extraction.

    ``sdf_fn`` maps [N, 3] points -> [N, 1] (or [N]) SDF values; evaluation
    is chunked into ``block``-sized sub-grids like the reference
    (``sdf_utils.py:260-277``), then the full grid runs through
    :func:`marching_tetrahedra`.
    """
    axis = np.linspace(min_val, max_val, nr_points_per_dim, dtype=np.float32)
    full = np.zeros((nr_points_per_dim,) * 3, dtype=np.float32)

    # Device->host transfer runs at ~2 MB/s for float32 through this
    # environment's remote-TPU transport (PERFORMANCE.md finding 11) — a
    # 512^3 float grid would take minutes just to fetch. Quantize each
    # block to int16 on device: values are clipped to +-clip_r (sign — the
    # only thing that matters away from the isosurface — survives; the
    # near-zero values that place vertices keep ~3e-6 resolution).
    clip_r = 0.25 * (max_val - min_val)
    q_scale = 32766.0 / clip_r

    @jax.jit
    def q_sdf(pts):
        s = sdf_fn(pts).reshape(-1)
        return jnp.round(jnp.clip(s, -clip_r, clip_r) * q_scale).astype(jnp.int16)

    for xi in range(0, nr_points_per_dim, block):
        xs = axis[xi : xi + block]
        for yi in range(0, nr_points_per_dim, block):
            ys = axis[yi : yi + block]
            for zi in range(0, nr_points_per_dim, block):
                zs = axis[zi : zi + block]
                xx, yy, zz = np.meshgrid(xs, ys, zs, indexing="ij")
                pts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
                sdf = np.asarray(q_sdf(jnp.asarray(pts))).astype(np.float32)
                sdf = sdf.reshape(len(xs), len(ys), len(zs)) / q_scale
                full[xi : xi + len(xs), yi : yi + len(ys), zi : zi + len(zs)] = sdf

    spacing = (max_val - min_val) / (nr_points_per_dim - 1.0)
    try:
        from permuto_sdf_tpu.native import marching_tetrahedra_native

        return marching_tetrahedra_native(
            full, level=threshold, origin=(min_val,) * 3, spacing=(spacing,) * 3
        )
    except RuntimeError:
        return marching_tetrahedra(
            full, level=threshold, origin=(min_val,) * 3, spacing=(spacing,) * 3
        )
