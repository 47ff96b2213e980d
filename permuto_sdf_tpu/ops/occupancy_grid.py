"""Occupancy grid for empty-space skipping — TPU-native redesign.

Functional equivalent of the reference's CUDA ``OccupancyGrid``
(``/root/reference/src/OccupancyGrid.cu``,
``kernels/permuto_sdf/OccupancyGridGPU.cuh``): a dense value+occupancy grid
over the ``[-extent/2, extent/2]^3`` cube with update rules

- ``update_with_density``: value = max(new, old*decay); occupied iff
  value > thresh (``OccupancyGridGPU.cuh:303-378``)
- ``update_with_sdf``: value = new sdf; occupied iff the NeuS logistic
  density of ``max(|sdf| - 1.0*half_diagonal, 0)`` at the current ``inv_s``
  exceeds thresh (``OccupancyGridGPU.cuh:440-507``; the random-sample
  variant uses factor 1.0 on the half-diagonal)

and the ray sampler ``compute_samples_in_occupied_regions``
(``OccupancyGridGPU.cuh:510-703``).

TPU redesign decisions (documented deviations):

- **Row-major instead of Morton order.** Morton indexing exists on the GPU
  for cache locality of the DDA walk; on TPU the grid is gathered with
  vectorized index math and layout has no such effect. The update/sample
  functions use the same linear indices on both sides, which is the only
  consistency the reference relies on.
- **No atomicAdd packing, no DDA while-loop.** Sampling is a two-pass
  *probe* scheme with static shapes: (1) test occupancy at ``nr_probes``
  equispaced t's in ``[t_entry, t_exit]`` and accumulate the occupied arc
  length; (2) choose ``n = clamp(occupied_len/min_dist, 0, max)`` sample
  arc-positions (uniformly spaced, jittered start — same distribution as
  the reference's equispaced jittered DDA samples) and map arc length back
  to t via a vectorized ``searchsorted`` over the per-ray cumulative
  occupied length. Everything is a gather/cumsum — no per-ray loops.
- Scatter updates use JAX ``.at[].set``/``max``; duplicate voxel indices in
  a random sample resolve in unspecified order, exactly as benign as the
  reference's racy writes (SURVEY.md §5.2).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from permuto_sdf_tpu.ops.ray_samples import RaySamples, prefix_mask


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OccupancyGridState:
    values: jnp.ndarray  # [V^3] float
    occupancy: jnp.ndarray  # [V^3] bool


@dataclasses.dataclass(frozen=True)
class OccupancyGridConfig:
    nr_voxels_per_dim: int = 256
    grid_extent: float = 1.0
    grid_translation: tuple = (0.0, 0.0, 0.0)

    @property
    def nr_voxels(self) -> int:
        return self.nr_voxels_per_dim ** 3

    @property
    def voxel_size(self) -> float:
        return self.grid_extent / self.nr_voxels_per_dim

    @property
    def half_diagonal(self) -> float:
        return (3.0 ** 0.5) * self.voxel_size / 2.0


def make_occupancy_grid(cfg: OccupancyGridConfig,
                        initial_occupied: bool = True) -> OccupancyGridState:
    """Fresh grid. The reference starts fully occupied (grid created with
    occupancy true so early iterations sample everywhere)."""
    return OccupancyGridState(
        values=jnp.zeros((cfg.nr_voxels,), jnp.float32),
        occupancy=jnp.full((cfg.nr_voxels,), initial_occupied),
    )


# ---------------------------------------------------------------------------
# Index math
# ---------------------------------------------------------------------------

def lin_idx_to_voxel_center(cfg: OccupancyGridConfig, lin_idx: jnp.ndarray):
    """Linear (row-major x,y,z) index -> world voxel center."""
    v = cfg.nr_voxels_per_dim
    x = lin_idx // (v * v)
    y = (lin_idx // v) % v
    z = lin_idx % v
    ijk = jnp.stack([x, y, z], axis=-1).astype(jnp.float32)
    t = jnp.asarray(cfg.grid_translation)
    return (ijk + 0.5) * cfg.voxel_size - cfg.grid_extent / 2.0 + t


def point_to_lin_idx(cfg: OccupancyGridConfig, points: jnp.ndarray):
    """World point -> (linear index, in_bounds mask)."""
    v = cfg.nr_voxels_per_dim
    t = jnp.asarray(cfg.grid_translation, dtype=points.dtype)
    p = (points - t + cfg.grid_extent / 2.0) / cfg.voxel_size
    ijk = jnp.floor(p).astype(jnp.int32)
    in_bounds = jnp.all((ijk >= 0) & (ijk < v), axis=-1)
    ijk = jnp.clip(ijk, 0, v - 1)
    lin = ijk[..., 0] * v * v + ijk[..., 1] * v + ijk[..., 2]
    return lin, in_bounds


def check_occupancy(cfg: OccupancyGridConfig, grid: OccupancyGridState,
                    points: jnp.ndarray):
    """[N, 3] -> [N] bool (out-of-grid points report unoccupied), equivalent
    of ``OccupancyGridGPU.cuh:901-941``."""
    lin, in_bounds = point_to_lin_idx(cfg, points)
    return jnp.take(grid.occupancy, lin) & in_bounds


# ---------------------------------------------------------------------------
# Random grid-point sampling + updates
# ---------------------------------------------------------------------------

def compute_random_sample_of_grid_points(cfg: OccupancyGridConfig, key,
                                         nr_points: int, jitter: bool = True):
    """-> (center_points [n, 3], lin_indices [n]) — voxel centers with
    optional in-voxel jitter (``OccupancyGridGPU.cuh:248-301``)."""
    k_idx, k_jit = jax.random.split(key)
    lin = jax.random.randint(k_idx, (nr_points,), 0, cfg.nr_voxels)
    centers = lin_idx_to_voxel_center(cfg, lin)
    if jitter:
        mov = jax.random.uniform(
            k_jit, (nr_points, 3), minval=-0.5, maxval=0.5
        ) * cfg.voxel_size
        centers = centers + mov
    return centers, lin


def compute_stratified_sample_of_grid_points(cfg: OccupancyGridConfig, key,
                                             nr_points: int, update_idx,
                                             jitter: bool = True):
    """Voxel sample for grid updates with GUARANTEED full coverage.

    The reference refreshes a random iid subset of voxels per update
    (``OccupancyGridGPU.cuh:248-301``); with 256^3 voxels and 256^2*4
    samples that covers only ~1-exp(-k/64) of the grid after k updates —
    stale never-visited voxels keep their initial occupied=true for
    thousands of iterations, so early empty-space skipping (and the
    steady-state ray-budget balance) is limited by SAMPLING COVERAGE, not
    by the SDF. Here update ``k`` visits voxels
    ``lin = (a * i + b) mod V`` for ``i in [k*n, (k+1)*n)`` with ``a`` odd
    and V a power of two — a bijection of the voxel ids, so every voxel is
    refreshed exactly once every ``V / n`` updates (64 for the flagship
    config) while consecutive updates still spread pseudo-randomly through
    space. In-voxel jitter stays random. Strictly stronger freshness than
    the reference under the identical update rule.
    """
    assert cfg.nr_voxels & (cfg.nr_voxels - 1) == 0, "needs power-of-2 voxels"
    i = update_idx * nr_points + jnp.arange(nr_points, dtype=jnp.uint32)
    # multiplicative bijection mod 2^k: odd multiplier + odd offset
    # (Weyl-style); constants are arbitrary large odd numbers
    lin = (i * jnp.uint32(2654435761) + jnp.uint32(340573321)) & jnp.uint32(
        cfg.nr_voxels - 1
    )
    lin = lin.astype(jnp.int32)
    centers = lin_idx_to_voxel_center(cfg, lin)
    if jitter:
        mov = jax.random.uniform(
            key, (nr_points, 3), minval=-0.5, maxval=0.5
        ) * cfg.voxel_size
        centers = centers + mov
    return centers, lin


def _logistic_density(x, s):
    """NeuS logistic density (OccupancyGridGPU.cuh:382-385)."""
    return s * jnp.exp(-s * x) / (1.0 + jnp.exp(-s * x)) ** 2


def update_with_sdf_random_sample(cfg: OccupancyGridConfig,
                                  grid: OccupancyGridState,
                                  lin_indices, sdf, inv_s,
                                  occupancy_thresh: float = 1e-4):
    """Scatter new sdf values and re-threshold occupancy
    (``OccupancyGridGPU.cuh:440-507``)."""
    sdf = sdf.reshape(-1)
    values = grid.values.at[lin_indices].set(sdf)
    min_sdf_possible = jnp.clip(jnp.abs(sdf) - 1.0 * cfg.half_diagonal, 0.0, 1e10)
    weight = _logistic_density(min_sdf_possible, inv_s)
    occ = grid.occupancy.at[lin_indices].set(weight > occupancy_thresh)
    return OccupancyGridState(values=values, occupancy=occ)


def update_with_density_random_sample(cfg: OccupancyGridConfig,
                                      grid: OccupancyGridState,
                                      lin_indices, density,
                                      decay: float = 0.7,
                                      occupancy_thresh: float = 1e-3):
    """value = max(new, old*decay); occupied = value > thresh
    (``OccupancyGridGPU.cuh:341-378``)."""
    density = density.reshape(-1)
    old = jnp.take(grid.values, lin_indices)
    updated = jnp.maximum(density, old * decay)
    values = grid.values.at[lin_indices].set(updated)
    occ = grid.occupancy.at[lin_indices].set(updated > occupancy_thresh)
    return OccupancyGridState(values=values, occupancy=occ)


# ---------------------------------------------------------------------------
# Ray sampling through occupied space (static-shape probe scheme)
# ---------------------------------------------------------------------------

def _probe_occupancy(cfg, grid, origins, dirs, t_entry, t_exit, nr_probes):
    """Occupancy at nr_probes midpoints along each ray.

    Returns (occ [R, P] bool, seg_len [R] probe segment length)."""
    t_entry = t_entry.reshape(-1, 1)
    t_exit = t_exit.reshape(-1, 1)
    frac = (jnp.arange(nr_probes) + 0.5) / nr_probes  # [P]
    ts = t_entry + frac[None, :] * (t_exit - t_entry)  # [R, P]
    pts = origins[:, None, :] + ts[..., None] * dirs[:, None, :]
    occ = check_occupancy(cfg, grid, pts.reshape(-1, 3)).reshape(ts.shape)
    seg_len = (t_exit - t_entry)[:, 0] / nr_probes
    return occ, seg_len, t_entry[:, 0]


def compute_samples_in_occupied_regions(
    cfg: OccupancyGridConfig,
    grid: OccupancyGridState,
    origins, dirs, t_entry, t_exit,
    min_dist_between_samples: float,
    max_nr_samples_per_ray: int,
    key=None,
    jitter: bool = False,
    nr_probes: int = 512,
) -> RaySamples:
    """Equispaced jittered samples inside occupied voxels along each ray —
    dense-masked equivalent of ``compute_samples_in_occupied_regions``
    (``OccupancyGridGPU.cuh:510-703``).

    Pass 1 measures the occupied arc length with ``nr_probes`` probes;
    pass 2 places ``n = clamp(occ_len/min_dist, 0, max)`` samples at
    equispaced arc positions (jittered start like the reference) and maps
    arc position -> t with a per-ray searchsorted over the cumulative
    occupied length. Rays with n <= 2 are zeroed (reference discard rule).

    Resolution bound vs the reference's exact DDA (quantified in
    tests/test_probe_sampler_exactness.py against a NumPy DDA oracle):
    the probe lattice has pitch ``(t_exit - t_entry) / nr_probes``, so an
    occupied interval of length ``l >= pitch`` is NEVER missed (midpoints
    are spaced exactly one pitch apart). A sub-pitch sliver is detected
    with probability ``l / pitch`` per ray and counted as one full pitch
    when detected, so the occupied-length estimator stays unbiased over
    the ray population. At the production operating point (512 probes,
    ~unit chord, 256^3 grid) the pitch is ~half a voxel: a straight-through
    occupied voxel is always found; only corner-clips shorter than half a
    voxel degrade to probabilistic coverage — and those contribute
    O(pitch) arc length to the render integral in the first place.
    """
    R = origins.shape[0]
    S = max_nr_samples_per_ray
    occ, seg_len, t0 = _probe_occupancy(cfg, grid, origins, dirs, t_entry, t_exit,
                                        nr_probes)
    occ_f = occ.astype(jnp.float32)
    occupied_dist = jnp.sum(occ_f, axis=-1) * seg_len  # [R]

    nr = jnp.floor(occupied_dist / min_dist_between_samples).astype(jnp.int32)
    nr = jnp.clip(nr, 0, S)
    nr = jnp.where(nr <= 2, 0, nr)  # discard rays with <=2 samples
    dt_ray = jnp.where(nr > 0, occupied_dist / jnp.maximum(nr, 1), 0.0)  # [R]

    # arc positions of the samples: (i + jitter) * dt_ray
    if jitter and key is not None:
        start = jax.random.uniform(key, (R, 1))
    else:
        start = jnp.full((R, 1), 0.5)
    arc = (jnp.arange(S)[None, :] + start) * dt_ray[:, None]  # [R, S]

    # invert arc -> t through the cumulative occupied length:
    # cum[p] = occupied length after probe p. Find first probe with cum > arc,
    # place t inside that probe proportionally.
    cum = jnp.cumsum(occ_f * seg_len[:, None], axis=-1)  # [R, P]
    # method="compare_all": the default binary-search lowering is a
    # serial while loop on TPU (~13 ms/step of the traced r4 lever step,
    # profiling/trace_top_ops.json while.18); the dense compare+sum form
    # is pure vector work with identical results.
    idx = jax.vmap(
        lambda c, a: jnp.searchsorted(c, a, side="right",
                                      method="compare_all")
    )(cum, arc)  # [R, S] probe index whose segment contains the arc position
    idx = jnp.clip(idx, 0, occ.shape[1] - 1)
    cum_before = jnp.where(
        idx > 0, jnp.take_along_axis(cum, jnp.maximum(idx - 1, 0), axis=-1), 0.0
    )
    # distance into this (occupied) probe segment
    into = jnp.clip(arc - cum_before, 0.0, seg_len[:, None])
    t = t0[:, None] + idx.astype(jnp.float32) * seg_len[:, None] + into  # [R, S]

    mask = prefix_mask(nr, S)
    z = jnp.where(mask, t, 0.0)
    dt = jnp.broadcast_to(dt_ray[:, None], (R, S))
    # last valid sample's dt clamps to the remaining distance to t_exit
    last_idx = jnp.maximum(nr - 1, 0)
    z_last = jnp.take_along_axis(z, last_idx[:, None], axis=-1)[:, 0]
    rem = jnp.clip(t_exit.reshape(-1) - z_last, 0.0, dt_ray)
    is_last = jnp.arange(S)[None, :] == last_idx[:, None]
    dt = jnp.where(is_last & mask, rem[:, None], dt)
    dt = jnp.where(mask, dt, 0.0)

    return RaySamples(
        origins=origins, dirs=dirs, z=z, dt=dt, mask=mask,
        ray_fixed_dt=jnp.where(nr > 0, dt_ray, 0.0),
    )


def chebyshev_empty_distance(cfg: OccupancyGridConfig, occupancy: jnp.ndarray,
                             max_dist: int = 15) -> jnp.ndarray:
    """[V^3] int32: L-inf (Chebyshev) voxel distance to the nearest occupied
    voxel, capped at ``max_dist`` (0 = occupied).

    The sphere tracer's empty-space skip: a point whose voxel has distance
    k can safely advance (k-1) voxel widths along any ray without entering
    occupied space (L2 >= L-inf). One gather per ray per step replaces the
    reference's per-step DDA walk (``OccupancyGridGPU.cuh:817-895``) and
    any per-frame ray probing: the field depends only on the GRID, so it
    is computed once per grid state (``max_dist`` min-pool sweeps, pure
    VPU work) and amortizes over every frame rendered from it."""
    v = cfg.nr_voxels_per_dim
    occ3 = occupancy.reshape(v, v, v)
    d = jnp.where(occ3, 0, max_dist).astype(jnp.int32)
    for _ in range(max_dist):
        neigh = -jax.lax.reduce_window(
            -d, jnp.iinfo(jnp.int32).min, jax.lax.max,
            (3, 3, 3), (1, 1, 1), "SAME",
        )
        d = jnp.minimum(d, neigh + 1)
    return d.reshape(-1)


def empty_distance_at(cfg: OccupancyGridConfig, dist_field: jnp.ndarray,
                      points: jnp.ndarray, max_dist: int = 15) -> jnp.ndarray:
    """[N] voxel distances at world points (out-of-grid -> max_dist)."""
    lin, in_bounds = point_to_lin_idx(cfg, points)
    return jnp.where(in_bounds, jnp.take(dist_field, lin), max_dist)


def mip_config(cfg: OccupancyGridConfig, factor: int) -> OccupancyGridConfig:
    """Config of the ``factor``x-downsampled grid (same extent/translation)."""
    assert cfg.nr_voxels_per_dim % factor == 0
    return dataclasses.replace(cfg, nr_voxels_per_dim=cfg.nr_voxels_per_dim // factor)


def downsample_occupancy(cfg: OccupancyGridConfig, occupancy: jnp.ndarray,
                         factor: int) -> jnp.ndarray:
    """Conservative occupancy mip: a coarse voxel is occupied iff ANY of its
    ``factor^3`` fine voxels is. Row-major [V^3] -> [(V/f)^3].

    Used by the sphere-trace seed: probing a 64^3 mip needs 4x fewer (and
    4x coarser-spaced, equally safe) probes than the 256^3 grid — gathers
    on TPU cost per instance, so the seed is the frame-cost floor
    (PERFORMANCE.md finding 7)."""
    v = cfg.nr_voxels_per_dim
    c = v // factor
    occ = occupancy.reshape(c, factor, c, factor, c, factor)
    return jnp.any(occ, axis=(1, 3, 5)).reshape(-1)


def compute_first_sample_start_of_occupied_regions(
    cfg: OccupancyGridConfig, grid: OccupancyGridState,
    origins, dirs, t_entry, t_exit, nr_probes: int = 512,
):
    """First t inside occupied space per ray (sphere-trace seed) —
    equivalent of ``OccupancyGridGPU.cuh:707-814``.

    Returns (t_first [R], has_occupied [R] bool)."""
    occ, seg_len, t0 = _probe_occupancy(cfg, grid, origins, dirs, t_entry, t_exit,
                                        nr_probes)
    has = jnp.any(occ, axis=-1)
    first = jnp.argmax(occ, axis=-1)  # first True
    t_first = t0 + first.astype(jnp.float32) * seg_len  # segment start
    return jnp.where(has, t_first, t_exit.reshape(-1)), has


def advance_sample_to_next_occupied_voxel(
    cfg: OccupancyGridConfig, grid: OccupancyGridState,
    dirs, pos, max_steps: int = 48,
):
    """If ``pos`` is in unoccupied space, advance along ``dirs`` to the next
    occupied voxel (sphere-trace empty-space skip,
    ``OccupancyGridGPU.cuh:817-895``).

    Static-shape version: probe ``max_steps`` points spaced half a voxel
    apart and jump to the first occupied one. Returns
    (new_pos [N, 3], is_within_grid_bounds [N]).

    NB: kept for API parity with the reference binding; the sphere tracers
    all use :func:`chebyshev_empty_distance` jumps instead — the half-voxel
    probe pitch here can step OVER occupancy regions thinner than half a
    voxel along the ray diagonal, and its 48 probes/ray/step cost 48
    gather instances where the distance field costs one."""
    step = cfg.voxel_size * 0.5
    ts = jnp.arange(max_steps, dtype=jnp.float32) * step  # [K], includes 0
    probes = pos[:, None, :] + ts[None, :, None] * dirs[:, None, :]
    flat = probes.reshape(-1, 3)
    occ = check_occupancy(cfg, grid, flat).reshape(pos.shape[0], max_steps)
    lin, in_bounds = point_to_lin_idx(cfg, flat)
    in_bounds = in_bounds.reshape(pos.shape[0], max_steps)

    found = jnp.any(occ, axis=-1)
    first = jnp.argmax(occ, axis=-1)
    t_jump = jnp.take(ts, first)
    # found: jump to the first occupied probe; not found: advance past the
    # whole probed span so the trace loop keeps making progress
    t_adv = jnp.where(found, t_jump, ts[-1] + step)
    new_pos = pos + t_adv[:, None] * dirs
    # ray is done when nothing occupied was found and the far end of the
    # probed span has left the grid
    within = found | in_bounds[:, -1]
    return new_pos, within
