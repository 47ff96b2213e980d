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

    def body(carry):
        i, pos, converged, alive = carry
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
        return i + 1, new_pos, converged, alive

    def cond(carry):
        # early exit: a chunk whose rays have ALL converged or died stops
        # tracing — the TPU analog of the reference's boolean-mask gather of
        # unconverged rays (sdf_utils.py:149-186). With chunked rendering
        # this recovers most of the compaction win without dynamic shapes.
        i, _, converged, alive = carry
        return (i < nr_sphere_traces) & jnp.any(~converged & alive)

    converged = jnp.zeros(pos.shape[0], bool)
    _, pos, converged, alive = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), pos, converged, alive)
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


def sphere_trace_compacted(
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    ray_origins, ray_dirs, boundary_primitive,
    nr_rounds: int = 5,
    iters_per_round: int = 3,
    sdf_multiplier: float = 0.9,
    sdf_converged_tresh: float = 2e-4,
    grid_cfg: Optional[og.OccupancyGridConfig] = None,
    grid: Optional[og.OccupancyGridState] = None,
    time_val: Optional[float] = None,
    first_bucket_fraction: float = 0.25,
):
    """Sphere tracing with static-shape ray compaction between rounds.

    The reference compacts unconverged rays with boolean-mask indexing every
    iteration (sdf_utils.py:149-186) — dynamic shapes, impossible under jit.
    This is the TPU-native equivalent (BASELINE "hard part #5"): rays are
    re-binned into geometrically shrinking fixed-size buckets with
    ``jnp.nonzero(size=...)`` so each round's SDF evaluations only pay for
    (an upper bound of) the active set:

    1. Seed: rays whose occupancy-grid traversal finds no occupied voxel
       never evaluate the SDF at all — the initial bucket holds only
       potential hits (``first_bucket_fraction`` of all rays; overflow rays
       fall back to background, which only matters for degenerate
       all-foreground views).
    2. Each round runs ``iters_per_round`` masked trace steps on its bucket,
       scatters the state back, then re-bins the still-active rays into a
       bucket of half the size.

    Total trace steps = nr_rounds * iters_per_round. Returns the same
    (pos, sdf, converged, within_bounds) as :func:`sphere_trace`.
    """
    R = ray_origins.shape[0]
    p_entry, t_entry, p_exit, t_exit, hit = boundary_primitive.ray_intersection(
        ray_origins, ray_dirs
    )

    if grid is not None and grid_cfg is not None:
        t_first, has_occ = og.compute_first_sample_start_of_occupied_regions(
            grid_cfg, grid, ray_origins, ray_dirs, t_entry, t_exit
        )
        pos = ray_origins + t_first[:, None] * ray_dirs
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

    # full-size state, padded by one dummy slot that absorbs the writes of
    # unused bucket entries (nonzero fill_value = R)
    def padded(x, fill=0.0):
        pad = jnp.full((1,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad], axis=0)

    pos_f = padded(pos)
    dirs_f = padded(ray_dirs)
    alive_f = padded(alive, False)
    conv_f = jnp.zeros(R + 1, bool)
    sdf_f = jnp.zeros(R + 1, pos.dtype)

    bucket = max(256, int(R * first_bucket_fraction))
    active_f = alive_f & ~conv_f
    for _ in range(nr_rounds):
        bucket = min(bucket, R)
        (idx,) = jnp.nonzero(active_f[:R], size=bucket, fill_value=R)
        sub_pos = pos_f[idx]
        sub_dirs = dirs_f[idx]
        sub_alive = alive_f[idx] & (idx < R)
        sub_conv = conv_f[idx]
        sub_sdf = sdf_f[idx]

        for _ in range(iters_per_round):
            s = eval_sdf(sub_pos)
            act = ~sub_conv & sub_alive
            sub_sdf = jnp.where(act, s, sub_sdf)
            step = jnp.where(act[:, None],
                             sub_dirs * (s * sdf_multiplier)[:, None], 0.0)
            new_pos = sub_pos + step
            sub_conv = sub_conv | ((jnp.abs(s) < sdf_converged_tresh) & sub_alive)
            if grid is not None and grid_cfg is not None:
                adv_pos, within = og.advance_sample_to_next_occupied_voxel(
                    grid_cfg, grid, sub_dirs, new_pos
                )
                move = (~sub_conv & sub_alive)[:, None]
                new_pos = jnp.where(move, adv_pos, new_pos)
                sub_alive = sub_alive & (sub_conv | within)
            else:
                inside = boundary_primitive.check_point_inside_primitive(
                    new_pos
                )[:, 0]
                sub_alive = sub_alive & (sub_conv | inside)
            sub_pos = new_pos

        pos_f = pos_f.at[idx].set(sub_pos)
        alive_f = alive_f.at[idx].set(sub_alive)
        conv_f = conv_f.at[idx].set(sub_conv)
        sdf_f = sdf_f.at[idx].set(sub_sdf)
        active_f = alive_f & ~conv_f
        active_f = active_f.at[R].set(False)
        bucket = bucket // 2

    # final sdf refresh for converged rays (the classic last evaluation);
    # only the converged set needs it — reuse the last bucket machinery
    (idx,) = jnp.nonzero((conv_f & alive_f)[:R], size=min(max(256, int(
        R * first_bucket_fraction)), R), fill_value=R)
    s = eval_sdf(pos_f[idx])
    sdf_f = sdf_f.at[idx].set(jnp.where(idx < R, s, sdf_f[idx]))

    return pos_f[:R], sdf_f[:R], (conv_f & alive_f)[:R], alive_f[:R]
