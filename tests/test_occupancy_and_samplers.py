"""Tests for the occupancy grid and fg/bg ray samplers."""

import numpy as np
import jax
import jax.numpy as jnp

from permuto_sdf_tpu.ops import occupancy_grid as og
from permuto_sdf_tpu.ops.ray_sampler import compute_samples_fg, compute_samples_bg


CFG = og.OccupancyGridConfig(nr_voxels_per_dim=32, grid_extent=1.0)


def test_index_roundtrip():
    grid_cfg = CFG
    lin = jnp.arange(0, grid_cfg.nr_voxels, 97)
    centers = og.lin_idx_to_voxel_center(grid_cfg, lin)
    lin2, inb = og.point_to_lin_idx(grid_cfg, centers)
    assert bool(inb.all())
    np.testing.assert_array_equal(np.asarray(lin2), np.asarray(lin))


def test_out_of_bounds_unoccupied():
    grid = og.make_occupancy_grid(CFG, initial_occupied=True)
    pts = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.49, 0.49, 0.49]])
    occ = np.asarray(og.check_occupancy(CFG, grid, pts))
    assert occ[0] and not occ[1] and occ[2]


def test_update_with_sdf():
    grid = og.make_occupancy_grid(CFG, initial_occupied=True)
    # voxel at center gets sdf 0 -> occupied; far voxel gets sdf 10 -> free
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.4, 0.4, 0.4]])
    lin, _ = og.point_to_lin_idx(CFG, pts)
    sdf = jnp.asarray([[0.0], [10.0]])
    grid = og.update_with_sdf_random_sample(CFG, grid, lin, sdf, inv_s=512.0)
    occ = np.asarray(og.check_occupancy(CFG, grid, pts))
    assert occ[0] and not occ[1]
    vals = np.asarray(jnp.take(grid.values, lin))
    np.testing.assert_allclose(vals, [0.0, 10.0])


def test_update_with_density():
    grid = og.make_occupancy_grid(CFG, initial_occupied=False)
    pts = jnp.asarray([[0.0, 0.0, 0.0]])
    lin, _ = og.point_to_lin_idx(CFG, pts)
    grid = og.update_with_density_random_sample(CFG, grid, lin, jnp.asarray([[5.0]]))
    assert bool(og.check_occupancy(CFG, grid, pts)[0])
    # decay: value should shrink when updated with tiny density
    v0 = float(jnp.take(grid.values, lin)[0])
    grid = og.update_with_density_random_sample(CFG, grid, lin, jnp.asarray([[0.0]]))
    v1 = float(jnp.take(grid.values, lin)[0])
    np.testing.assert_allclose(v1, v0 * 0.7, rtol=1e-5)


def test_random_grid_points_inside_voxels():
    pts, lin = og.compute_random_sample_of_grid_points(
        CFG, jax.random.PRNGKey(0), 1000, jitter=True
    )
    centers = og.lin_idx_to_voxel_center(CFG, lin)
    d = np.abs(np.asarray(pts) - np.asarray(centers))
    assert d.max() <= CFG.voxel_size / 2 + 1e-6


def _slab_grid():
    """Grid occupied only for x in [0.1, 0.2]."""
    grid = og.make_occupancy_grid(CFG, initial_occupied=False)
    lin = jnp.arange(CFG.nr_voxels)
    centers = og.lin_idx_to_voxel_center(CFG, lin)
    occ = (centers[:, 0] > 0.1) & (centers[:, 0] < 0.2)
    return og.OccupancyGridState(values=grid.values, occupancy=occ)


def test_samples_in_occupied_regions_land_in_slab():
    grid = _slab_grid()
    R = 4
    origins = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]), (R, 1))
    dirs = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (R, 1))
    t_entry = jnp.full((R, 1), 0.5)  # enters box at x=-0.5
    t_exit = jnp.full((R, 1), 1.5)
    samples = og.compute_samples_in_occupied_regions(
        CFG, grid, origins, dirs, t_entry, t_exit,
        min_dist_between_samples=0.002, max_nr_samples_per_ray=32,
        key=jax.random.PRNGKey(0), jitter=True,
    )
    nr = np.asarray(samples.nr_samples_per_ray())
    assert (nr > 2).all()
    pos = np.asarray(samples.positions())
    mask = np.asarray(samples.mask)
    x = pos[..., 0][mask]
    # samples must lie in the occupied slab (voxel-size tolerance)
    assert (x > 0.1 - CFG.voxel_size).all() and (x < 0.2 + CFG.voxel_size).all()
    # z sorted and prefix mask
    z = np.asarray(samples.z)
    for r in range(R):
        assert (np.diff(z[r, : nr[r]]) > 0).all()


def test_samples_skip_empty_ray():
    grid = _slab_grid()
    origins = jnp.asarray([[-1.0, 0.45, 0.0]])  # passes above?? no: slab spans all y
    # use a ray that misses the slab in x: travels along y at x=-0.4
    origins = jnp.asarray([[-0.4, -1.0, 0.0]])
    dirs = jnp.asarray([[0.0, 1.0, 0.0]])
    samples = og.compute_samples_in_occupied_regions(
        CFG, grid, origins, dirs, jnp.asarray([[0.5]]), jnp.asarray([[1.5]]),
        0.002, 32,
    )
    assert int(samples.nr_samples_per_ray()[0]) == 0


def test_first_sample_start():
    grid = _slab_grid()
    origins = jnp.asarray([[-1.0, 0.0, 0.0]])
    dirs = jnp.asarray([[1.0, 0.0, 0.0]])
    t_first, has = og.compute_first_sample_start_of_occupied_regions(
        CFG, grid, origins, dirs, jnp.asarray([[0.5]]), jnp.asarray([[1.5]])
    )
    assert bool(has[0])
    x_first = -1.0 + float(t_first[0])
    assert abs(x_first - 0.1) < 2 * CFG.voxel_size


def test_advance_to_next_occupied():
    grid = _slab_grid()
    pos = jnp.asarray([[-0.2, 0.0, 0.0], [0.15, 0.0, 0.0], [0.3, 0.0, 0.0]])
    dirs = jnp.asarray([[1.0, 0.0, 0.0]] * 3)
    new_pos, within = og.advance_sample_to_next_occupied_voxel(CFG, grid, dirs, pos)
    new_pos, within = np.asarray(new_pos), np.asarray(within)
    # ray 0: advances into the slab
    assert 0.1 - CFG.voxel_size < new_pos[0, 0] < 0.2 + CFG.voxel_size
    assert within[0]
    # ray 1: already occupied, stays
    np.testing.assert_allclose(new_pos[1], [0.15, 0, 0], atol=1e-6)
    # ray 2: nothing occupied ahead; eventually exits
    assert not within[2] or new_pos[2, 0] > 0.5


def test_compute_samples_fg_uniform():
    R = 3
    origins = jnp.zeros((R, 3))
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
    t_entry = jnp.asarray([[0.5], [0.5], [0.5]])
    t_exit = jnp.asarray([[1.5], [0.5005], [1.5]])  # ray 1: too short -> 0 samples
    samples = compute_samples_fg(origins, dirs, t_entry, t_exit, 0.01, 64,
                                 key=jax.random.PRNGKey(1), jitter=True)
    nr = np.asarray(samples.nr_samples_per_ray())
    assert nr[0] == 64 and nr[1] == 0 and nr[2] == 64
    z = np.asarray(samples.z)
    assert (z[0, : nr[0]] >= 0.5 - 1e-6).all() and (z[0, : nr[0]] <= 1.5 + 1e-6).all()
    d = np.diff(z[0, : nr[0]])
    np.testing.assert_allclose(d, d[0], rtol=1e-3)  # equal spacing
    # fixed dt
    np.testing.assert_allclose(float(samples.ray_fixed_dt[0]), 1.0 / 64, rtol=1e-5)


def test_compute_samples_bg():
    R = 2
    origins = jnp.zeros((R, 3))
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    t_exit = jnp.full((R, 1), 0.5)
    samples = compute_samples_bg(origins, dirs, t_exit, 32, 0.5, (0, 0, 0),
                                 key=jax.random.PRNGKey(2), jitter=False)
    z = np.asarray(samples.z)
    assert np.allclose(z[:, 0], 0.5)  # starts at sphere surface
    assert (np.diff(z, axis=1) > 0).all()  # increasing depth
    assert z.max() > 100  # reaches near-infinity (t_exit/min_t)
    p4 = np.asarray(samples.pos_4d)
    # 4th channel = radius/r in (0, 1]
    assert (p4[..., 3] > 0).all() and (p4[..., 3] <= 1.0 + 1e-5).all()
    # direction-from-center is unit
    np.testing.assert_allclose(np.linalg.norm(p4[..., :3], axis=-1), 1.0, atol=1e-5)
    # dt: last is 1e10
    assert np.allclose(np.asarray(samples.dt)[:, -1], 1e10)


def test_chebyshev_empty_distance_exact():
    """Distance field vs a brute-force L-inf distance on a tiny grid."""
    import itertools
    from permuto_sdf_tpu.ops import occupancy_grid as og

    cfg = og.OccupancyGridConfig(nr_voxels_per_dim=8)
    occ = np.zeros((8, 8, 8), bool)
    occ[2, 3, 4] = True
    occ[6, 6, 1] = True
    field = np.asarray(
        og.chebyshev_empty_distance(cfg, jnp.asarray(occ.reshape(-1)),
                                    max_dist=5)
    ).reshape(8, 8, 8)
    occ_idx = np.argwhere(occ)
    for p in itertools.product(range(8), repeat=3):
        d = min(np.max(np.abs(np.asarray(p) - o)) for o in occ_idx)
        assert field[p] == min(d, 5), (p, field[p], d)


def test_empty_distance_at_out_of_grid():
    from permuto_sdf_tpu.ops import occupancy_grid as og

    cfg = og.OccupancyGridConfig(nr_voxels_per_dim=8)
    occ = jnp.zeros((512,), bool).at[0].set(True)
    field = og.chebyshev_empty_distance(cfg, occ, max_dist=5)
    pts = jnp.asarray([[10.0, 0.0, 0.0]])  # far outside the grid extent
    d = og.empty_distance_at(cfg, field, pts, max_dist=5)
    assert int(d[0]) == 5


def test_stratified_grid_sampling_covers_every_voxel():
    """The bijective cycling sampler must visit EVERY voxel exactly once
    per nr_voxels/nr_points updates (the reference's iid sampling leaves
    ~exp(-k/ratio) of the grid stale after k updates)."""
    from permuto_sdf_tpu.ops import occupancy_grid as og

    cfg = og.OccupancyGridConfig(nr_voxels_per_dim=16)  # 4096 voxels
    n = 256
    seen = np.zeros((cfg.nr_voxels,), np.int64)
    key = jax.random.PRNGKey(0)
    for k in range(cfg.nr_voxels // n):
        centers, lin = og.compute_stratified_sample_of_grid_points(
            cfg, key, n, jnp.uint32(k), jitter=False
        )
        seen[np.asarray(lin)] += 1
        # jitter=False centers must be the exact voxel centers
        np.testing.assert_allclose(
            np.asarray(centers),
            np.asarray(og.lin_idx_to_voxel_center(cfg, lin)), atol=0)
    assert (seen == 1).all()
    # and the cycle repeats
    _, lin0 = og.compute_stratified_sample_of_grid_points(
        cfg, key, n, jnp.uint32(cfg.nr_voxels // n), jitter=False)
    _, lin_first = og.compute_stratified_sample_of_grid_points(
        cfg, key, n, jnp.uint32(0), jitter=False)
    np.testing.assert_array_equal(np.asarray(lin0), np.asarray(lin_first))
