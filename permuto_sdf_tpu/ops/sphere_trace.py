"""Sphere tracing — the post-training interactive rendering path.

Equivalent of ``sphere_trace`` + ``filter_unconverged_points``
(``/root/reference/permuto_sdf_py/utils/sdf_utils.py:120-231``) and the
``run_net_sphere_traced`` composition (``train_permuto_sdf.py:211-242``):

1. Seed each ray at its bounding-primitive entry (or the first occupied
   voxel when a grid is given, nudged half a voxel in).
2. Iterate ``nr_sphere_traces`` times: evaluate the SDF at unconverged
   positions, step ``pos += dir * sdf * sdf_multiplier``, mark converged
   when ``|sdf| < threshold``; with a grid, skip empty space by advancing
   to the next occupied voxel and kill rays leaving the grid.
3. One final evaluation for SDF + gradient (normals).

TPU-native form: a masked ``lax.fori_loop`` over ALL rays — there is no
boolean-mask gather/compaction (dynamic shapes); converged lanes simply
stop moving. For the chunk sizes used in interactive rendering this keeps
the VPU full, and the whole trace jit-compiles into one graph with the
encoding+MLP evaluations inside.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from permuto_sdf_tpu.ops import occupancy_grid as og


def sphere_trace(
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    ray_origins, ray_dirs, boundary_primitive,
    nr_sphere_traces: int = 15,
    sdf_multiplier: float = 0.9,
    sdf_converged_tresh: float = 2e-4,
    grid_cfg: Optional[og.OccupancyGridConfig] = None,
    grid: Optional[og.OccupancyGridState] = None,
    time_val: Optional[float] = None,
):
    """Returns (pos [R,3], sdf [R], converged_mask [R], within_bounds [R]).

    ``sdf_fn`` maps [N, 3] (or [N, 4] when ``time_val`` is given — the 4D
    trainer's time-sweep visualization) to [N] sdf values.
    """
    p_entry, t_entry, p_exit, t_exit, hit = boundary_primitive.ray_intersection(
        ray_origins, ray_dirs
    )

    if grid is not None and grid_cfg is not None:
        t_first, has_occ = og.compute_first_sample_start_of_occupied_regions(
            grid_cfg, grid, ray_origins, ray_dirs, t_entry, t_exit
        )
        pos = ray_origins + t_first[:, None] * ray_dirs
        # nudge half a voxel inside (sdf_utils.py:131-133)
        pos = pos + ray_dirs * grid_cfg.voxel_size * 0.5
        alive = has_occ & hit[:, 0]
    else:
        pos = p_entry
        alive = hit[:, 0]

    def eval_sdf(p):
        if time_val is not None:
            t = jnp.full((p.shape[0], 1), time_val, p.dtype)
            p = jnp.concatenate([p, t], axis=-1)
        return sdf_fn(p).reshape(-1)

    def body(_, carry):
        pos, converged, alive = carry
        sdf = eval_sdf(pos)
        step = jnp.where((~converged & alive)[:, None],
                         ray_dirs * (sdf * sdf_multiplier)[:, None], 0.0)
        new_pos = pos + step
        newly = jnp.abs(sdf) < sdf_converged_tresh
        converged = converged | (newly & alive)

        if grid is not None and grid_cfg is not None:
            adv_pos, within = og.advance_sample_to_next_occupied_voxel(
                grid_cfg, grid, ray_dirs, new_pos
            )
            move = (~converged & alive)[:, None]
            new_pos = jnp.where(move, adv_pos, new_pos)
            alive = alive & (converged | within)
        else:
            inside = boundary_primitive.check_point_inside_primitive(new_pos)[:, 0]
            alive = alive & (converged | inside)
        return new_pos, converged, alive

    converged = jnp.zeros(pos.shape[0], bool)
    pos, converged, alive = jax.lax.fori_loop(
        0, nr_sphere_traces, body, (pos, converged, alive)
    )
    sdf = eval_sdf(pos)
    return pos, sdf, converged, alive


def filter_unconverged_points(points, sdf, sdf_gradients,
                              sdf_converged_tresh: float = 0.01):
    """Zero out points/gradients whose sdf is above threshold
    (sdf_utils.py:221-231)."""
    ok = (sdf.reshape(-1, 1) < sdf_converged_tresh).astype(points.dtype)
    pts = points * ok
    grads = sdf_gradients * ok if sdf_gradients is not None else None
    return pts, grads, ok
