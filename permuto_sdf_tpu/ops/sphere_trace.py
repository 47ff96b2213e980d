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

import functools
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from permuto_sdf_tpu.ops import occupancy_grid as og


# chebyshev_empty_distance cap: also the max empty-space jump per step, in
# voxels. 63 lets a miss ray cross the whole 256^3 grid in ~4 steps instead
# of ~18 at cap 15 — the first trace round processes EVERY bound-hitting
# ray, so fast miss-exit dominates its cost. Field build is 63 min-pool
# sweeps, once per grid state.
_EMPTY_DIST_CAP = 63


def sphere_trace(
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    ray_origins, ray_dirs, boundary_primitive,
    nr_sphere_traces: int = 15,
    sdf_multiplier: float = 0.9,
    sdf_converged_tresh: float = 2e-4,
    grid_cfg: Optional[og.OccupancyGridConfig] = None,
    grid: Optional[og.OccupancyGridState] = None,
    time_val: Optional[float] = None,
    dist_field=None,
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
        if dist_field is None:
            # empty-space skip reads the grid's Chebyshev distance field
            # (one gather/ray/step) instead of probing at half-voxel pitch,
            # whose 48-step span could step OVER thin diagonal occupancy.
            # Pass a precomputed field to amortize the build across chunks.
            dist_field = og.chebyshev_empty_distance(grid_cfg, grid.occupancy,
                                                     _EMPTY_DIST_CAP)
    else:
        pos = p_entry
        alive = hit[:, 0]
        dist_field = None

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

        if dist_field is not None:
            # a voxel at Chebyshev distance k to occupancy allows a safe
            # (k-1)-voxel advance along any direction (L2 >= L-inf).
            # Jumps gate on sdf > 1 voxel: a ray that slipped inside a
            # mask-trained model's phantom-positive crust must not be
            # catapulted through the unoccupied interior (see
            # _trace_rounds_impl's jump_gate note).
            k = og.empty_distance_at(grid_cfg, dist_field, new_pos,
                                     _EMPTY_DIST_CAP)
            jump = jnp.maximum(k - 1, 0).astype(new_pos.dtype) \
                * grid_cfg.voxel_size
            move = (~converged & alive & (sdf > grid_cfg.voxel_size))[:, None]
            new_pos = jnp.where(move, new_pos + jump[:, None] * ray_dirs,
                                new_pos)
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
    dist_field=None,
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
        if dist_field is None:
            dist_field = og.chebyshev_empty_distance(grid_cfg, grid.occupancy,
                                                     _EMPTY_DIST_CAP)
    else:
        pos = p_entry
        alive = hit[:, 0]
        dist_field = None

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
            if dist_field is not None:
                # jumps gate on sdf > 1 voxel (mask-ckpt tunnel guard —
                # see _trace_rounds_impl's jump_gate note)
                k = og.empty_distance_at(grid_cfg, dist_field, new_pos,
                                         _EMPTY_DIST_CAP)
                jump = jnp.maximum(k - 1, 0).astype(new_pos.dtype) \
                    * grid_cfg.voxel_size
                move = (~sub_conv & sub_alive
                        & (s > grid_cfg.voxel_size))[:, None]
                new_pos = jnp.where(move, new_pos + jump[:, None] * sub_dirs,
                                    new_pos)
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
    # only the converged set needs it — reuse the last bucket machinery.
    # NOTE: if more rays converged than fit this fixed bucket, the overflow
    # rays return their LAST-EVALUATED sdf (one step stale) instead of the
    # final-position value — harmless for shading (weights come from the
    # converged mask). sphere_trace_adaptive sizes this bucket from the
    # true converged count and has no such cap.
    (idx,) = jnp.nonzero((conv_f & alive_f)[:R], size=min(max(256, int(
        R * first_bucket_fraction)), R), fill_value=R)
    s = eval_sdf(pos_f[idx])
    sdf_f = sdf_f.at[idx].set(jnp.where(idx < R, s, sdf_f[idx]))

    return pos_f[:R], sdf_f[:R], (conv_f & alive_f)[:R], alive_f[:R]


# ---------------------------------------------------------------------------
# Host-adaptive compacted tracing (the interactive rendering fast path)
# ---------------------------------------------------------------------------
#
# sphere_trace_compacted above sizes its ray buckets with a static fraction;
# when a view fills the frame with foreground, overflow rays would silently
# render as background. The adaptive driver below keeps every kernel jitted
# with STATIC shapes but lets the HOST pick each round's bucket from the
# measured active-ray count (snapped to powers of two so each size compiles
# once, like the trainer's dynamic ray buckets). It also supports
# render-time LOD: march with a cheap coarse-level SDF, then refine the
# converged hits with the full-resolution SDF.


def pow2_bucket(n: int, lo: int = 256, hi: int = 1 << 22) -> int:
    """Snap n up to the next bucket in the {2^k, 1.5*2^k} ladder (max 1.5x
    overshoot, ~2 compiles per octave)."""
    b = lo
    while b < n and b < hi:
        b = b * 3 // 2 if (b & (b - 1)) == 0 else b * 4 // 3
    return min(b, hi)


def _with_time(p, time_val):
    if time_val is None:
        return p
    t = jnp.full((p.shape[0], 1), time_val, p.dtype)
    return jnp.concatenate([p, t], axis=-1)


@functools.partial(jax.jit, static_argnames=("grid_cfg",))
def _grid_distance_field(grid_cfg, grid):
    return og.chebyshev_empty_distance(grid_cfg, grid.occupancy,
                                       _EMPTY_DIST_CAP)


def _trace_rounds_impl(sdf_eval, ctx, origins_f, dirs_f, texit_f, dist_field,
                       t_f, alive_f, conv_f, sdf_f, grid_cfg,
                       iters: int, bucket: int, sdf_multiplier: float,
                       sdf_converged_tresh: float, time_val,
                       jump_substeps: int = 1, jump_gate: float = 0.0):
    """``iters`` trace steps on a host-sized bucket of active rays; state is
    the per-ray t along the ray. Empty-space skipping reads the grid's
    Chebyshev distance field (og.chebyshev_empty_distance): ONE gather per
    ray per jump, grid-resident, no per-frame precomputation.

    ``jump_substeps`` chains that many distance-field jumps after each SDF
    step (each individually safe: a fresh gather at the jumped-to position
    bounds the next advance). A jump costs 1 gather/ray vs 48-96 for an
    SDF eval, and rays whose path grazes the occupied shell have small
    Chebyshev clearances — with one jump per eval they crawl (measured:
    1.41M of 2.07M rays still active after five LOD6 evals at 1080p);
    chained jumps let them cross the graze in one iteration. Returns the
    updated full-size state + counts (active, converged) — the only values
    the host fetches."""
    R = t_f.shape[0] - 1
    (idx,) = jnp.nonzero((alive_f & ~conv_f)[:R], size=bucket, fill_value=R)
    o = origins_f[idx]
    d = dirs_f[idx]
    t_exit = texit_f[idx]
    t = t_f[idx]
    sub_alive = alive_f[idx] & (idx < R)
    sub_conv = conv_f[idx]
    sub_sdf = sdf_f[idx]

    for _ in range(iters):
        pos = o + t[:, None] * d
        s = sdf_eval(ctx, _with_time(pos, time_val)).reshape(-1)
        act = ~sub_conv & sub_alive
        sub_sdf = jnp.where(act, s, sub_sdf)
        sub_conv = sub_conv | ((jnp.abs(s) < sdf_converged_tresh) & sub_alive)
        act = ~sub_conv & sub_alive
        t_new = t + s * sdf_multiplier
        if grid_cfg is not None and dist_field is not None:
            # a voxel at Chebyshev distance k to occupancy allows a safe
            # (k-1)-voxel advance along any direction (L2 >= L-inf);
            # k <= 1 (at or adjacent to occupancy) advances 0, so extra
            # substeps are idempotent near the shell.
            # ``jump_gate``: jumps fire only while the ray's own SDF says
            # it is clear of the crust (s > gate). A MASK-trained model's
            # interior is unsupervised — often phantom-POSITIVE with an
            # unoccupied grid interior — so a ray that slips through the
            # thin crust sees "empty space" and the chained jumps
            # catapult it out the far side (t > t_exit, killed):
            # 19.4% of fg pixels rendered unshaded on the r5 flagship
            # with_mask ckpt, 23.6 dB vs 40.6 with jumps off
            # (eval_artifacts/st_mask_diag_r5.json). Gating on s keeps
            # the far-field speedup (s and k are both large there) and
            # the prepass (which cannot tunnel: no SDF steps).
            allow = act & (s > jump_gate)

            def _jump(_, t_cur):
                p_new = o + t_cur[:, None] * d
                k = og.empty_distance_at(grid_cfg, dist_field, p_new,
                                         _EMPTY_DIST_CAP)
                jump = jnp.maximum(k - 1, 0).astype(t_cur.dtype) \
                    * grid_cfg.voxel_size
                return jnp.where(allow, t_cur + jump, t_cur)

            t_new = jnp.where(act, t_new, t)
            t_new = jax.lax.fori_loop(0, jump_substeps, _jump, t_new)
        dead = t_new > t_exit
        sub_alive = sub_alive & (sub_conv | ~dead)
        t = jnp.where(act, t_new, t)

    t_f = t_f.at[idx].set(t)
    alive_f = alive_f.at[idx].set(sub_alive)
    conv_f = conv_f.at[idx].set(sub_conv)
    sdf_f = sdf_f.at[idx].set(sub_sdf)
    n_active = jnp.sum((alive_f & ~conv_f)[:R])
    n_hit = jnp.sum((alive_f & conv_f)[:R])
    return t_f, alive_f, conv_f, sdf_f, jnp.stack([n_active, n_hit])


# NB ``time_val`` is a TRACED operand (None -> empty pytree): every distinct
# time value of a 4D time sweep reuses one compiled kernel instead of
# paying a recompile per frame.
_trace_rounds = functools.partial(jax.jit, static_argnames=(
    "sdf_eval", "iters", "bucket", "grid_cfg", "sdf_multiplier",
    "sdf_converged_tresh", "jump_substeps", "jump_gate"))(_trace_rounds_impl)


def _jump_prepass_impl(dist_field, origins_f, dirs_f, texit_f, t_f, alive_f,
                       grid_cfg, jumps: int):
    """``jumps`` chained Chebyshev empty-space jumps on EVERY ray, zero SDF
    evaluations: each ray either parks at the occupied shell (k <= 1, jump
    0 — idempotent) or exits the bound and dies. One gather per ray per
    jump — ~50x cheaper than an SDF eval — so round 0's bucket is sized
    from true shell-parked survivors instead of every bound-hitting ray,
    and pure-miss rays never evaluate the SDF at all (the TPU analog of
    the reference's DDA pre-traversal, RaySamplerGPU.cuh:42-74)."""
    def body(_, t):
        pos = origins_f + t[:, None] * dirs_f
        k = og.empty_distance_at(grid_cfg, dist_field, pos, _EMPTY_DIST_CAP)
        jump = jnp.maximum(k - 1, 0).astype(t.dtype) * grid_cfg.voxel_size
        return jnp.where(alive_f, t + jump, t)

    t_f = jax.lax.fori_loop(0, jumps, body, t_f)
    alive_f = alive_f & (t_f <= texit_f)
    R = t_f.shape[0] - 1
    return t_f, alive_f, jnp.sum(alive_f[:R])


_jump_prepass = functools.partial(jax.jit, static_argnames=(
    "grid_cfg", "jumps"))(_jump_prepass_impl)


def _refresh_sdf_impl(sdf_eval, ctx, pos_f, mask_f, sdf_f, bucket: int,
                      time_val):
    """Re-evaluate the sdf at the final position of the masked rays (bucket
    sized by the host from the true converged count — every ray gets its
    final-position sdf)."""
    R = pos_f.shape[0] - 1
    (idx,) = jnp.nonzero(mask_f[:R], size=bucket, fill_value=R)
    s = sdf_eval(ctx, _with_time(pos_f[idx], time_val)).reshape(-1)
    return sdf_f.at[idx].set(jnp.where(idx < R, s, sdf_f[idx]))


_refresh_sdf = functools.partial(jax.jit, static_argnames=(
    "sdf_eval", "bucket"))(_refresh_sdf_impl)


# ---------------------------------------------------------------------------
# Data-parallel adaptive tracing (rays sharded over the device mesh)
# ---------------------------------------------------------------------------
#
# The same host-adaptive machinery, SPMD over a 1-D "rays" mesh: every
# per-ray state array carries a leading device axis [D, R_local(+1)]
# sharded with PartitionSpec("rays"); each device runs the identical
# _trace_rounds_impl on its local block (params / grid / distance field
# replicated; zero collectives — rays are independent). The host sizes ONE
# shared bucket per round from the max per-device active count; rays are
# pre-interleaved (ray i -> device i % D, parallel/render.py) so the
# per-device counts stay within a few % of each other on real frames.


@functools.lru_cache(maxsize=None)
def _dp_trace_rounds(mesh, sdf_eval, grid_cfg, iters: int, bucket: int,
                     sdf_multiplier: float, sdf_converged_tresh: float,
                     jump_substeps: int = 1, jump_gate: float = 0.0):
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from permuto_sdf_tpu.parallel.mesh import RAY_AXIS

    def body(ctx, origins_f, dirs_f, texit_f, dist_field,
             t_f, alive_f, conv_f, sdf_f, time_val):
        t, alive, conv, sdf, counts = _trace_rounds_impl(
            sdf_eval, ctx, origins_f[0], dirs_f[0], texit_f[0], dist_field,
            t_f[0], alive_f[0], conv_f[0], sdf_f[0], grid_cfg, iters, bucket,
            sdf_multiplier, sdf_converged_tresh, time_val,
            jump_substeps=jump_substeps, jump_gate=jump_gate,
        )
        return t[None], alive[None], conv[None], sdf[None], counts[None]

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(),
                  P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=(P(RAY_AXIS),) * 5,
        check_vma=False,
    )
    return jax.jit(sharded)


@functools.lru_cache(maxsize=None)
def _dp_jump_prepass(mesh, grid_cfg, jumps: int):
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from permuto_sdf_tpu.parallel.mesh import RAY_AXIS

    def body(dist_field, origins_f, dirs_f, texit_f, t_f, alive_f):
        t, alive, n = _jump_prepass_impl(
            dist_field, origins_f[0], dirs_f[0], texit_f[0], t_f[0],
            alive_f[0], grid_cfg, jumps)
        return t[None], alive[None], n[None]

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS),
                  P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=(P(RAY_AXIS),) * 3,
        check_vma=False,
    )
    return jax.jit(sharded)


def sphere_trace_adaptive_dp(
    mesh, sdf_eval, ctx, origins_sh, dirs_sh, boundary_primitive,
    nr_rounds: int = 5, iters_per_round: int = 3,
    sdf_multiplier: float = 0.9, sdf_converged_tresh: float = 2e-4,
    grid_cfg=None, grid=None, time_val=None,
    refine_sdf_eval=None, refine_ctx=None, nr_refine_iters: int = 3,
    min_bucket: int = 256, dist_field=None, round_sdf_evals: tuple = (),
    jump_substeps: int = 1, prepass_jumps: int = 0,
    jump_gate_voxels: float = 1.0,
):
    """:func:`sphere_trace_adaptive` over a device mesh.

    ``origins_sh`` / ``dirs_sh`` are PRE-SHARDED [D, R_local, 3] (use
    parallel.render.interleave_shard). Returns the sharded final state
    ``(t [D,R_local], alive, conv, sdf, n_alive_max)`` — positions are
    ``origins + t*dirs``; callers shade device-side before unsharding
    (fetching full-frame float state would defeat the DP win)."""
    import jax.numpy as jnp

    D, R_local = origins_sh.shape[0], origins_sh.shape[1]
    if time_val is not None:
        time_val = jnp.asarray(time_val, jnp.float32)
    flat = origins_sh.reshape(-1, 3)
    flat_d = dirs_sh.reshape(-1, 3)
    _, t_entry, _, t_exit, hit = boundary_primitive.ray_intersection(flat, flat_d)
    if grid is not None and grid_cfg is not None and dist_field is None:
        dist_field = _grid_distance_field(grid_cfg, grid)
    if grid is None or grid_cfg is None:
        dist_field = None

    def shard_pad(x, fill):
        x = x.reshape(D, R_local, *x.shape[1:])
        pad = jnp.full((D, 1) + x.shape[2:], fill, x.dtype)
        return jnp.concatenate([x, pad], axis=1)

    origins_f = shard_pad(flat, 0.0)
    dirs_f = shard_pad(flat_d, 0.0)
    texit_f = shard_pad(t_exit[:, 0], 0.0)
    t_f = shard_pad(t_entry[:, 0], 0.0)
    alive_f = shard_pad(hit[:, 0], False)
    conv_f = jnp.zeros((D, R_local + 1), bool)
    sdf_f = jnp.zeros((D, R_local + 1), jnp.float32)

    if prepass_jumps > 0 and dist_field is not None:
        t_f, alive_f, per_dev = _dp_jump_prepass(
            mesh, grid_cfg, prepass_jumps)(
            dist_field, origins_f, dirs_f, texit_f, t_f, alive_f)
        per_dev = np.asarray(per_dev)
    else:
        per_dev = jnp.sum(alive_f[:, :R_local], axis=1)
    n_active = int(per_dev.sum())
    max_active = int(per_dev.max())  # sizes the first shared bucket
    n_alive_max = max_active
    jump_gate = (float(jump_gate_voxels) * grid_cfg.voxel_size
                 if grid_cfg is not None else 0.0)
    for rnd in range(nr_rounds):
        if n_active == 0:
            break
        ev = round_sdf_evals[rnd] if rnd < len(round_sdf_evals) else sdf_eval
        bucket = pow2_bucket(max(max_active, 1), lo=min_bucket,
                             hi=max(min_bucket, R_local))
        step = _dp_trace_rounds(mesh, ev, grid_cfg, iters_per_round, bucket,
                                sdf_multiplier, sdf_converged_tresh,
                                jump_substeps, jump_gate)
        t_f, alive_f, conv_f, sdf_f, counts = step(
            ctx, origins_f, dirs_f, texit_f, dist_field,
            t_f, alive_f, conv_f, sdf_f, time_val,
        )
        counts = np.asarray(counts)  # [D, 2]
        n_active = int(counts[:, 0].sum())
        max_active = int(counts[:, 0].max())
        n_alive_max = int((counts[:, 0] + counts[:, 1]).max())

    if refine_sdf_eval is not None and n_alive_max > 0:
        # re-open EVERY alive ray with the full-res field (see the
        # single-device driver: the reference shades unconverged
        # in-bounds finals too, so stragglers need full-res ends)
        open_f = alive_f
        bucket = pow2_bucket(n_alive_max, lo=min_bucket,
                             hi=max(min_bucket, R_local))
        step = _dp_trace_rounds(mesh, refine_sdf_eval, grid_cfg,
                                nr_refine_iters, bucket, sdf_multiplier,
                                sdf_converged_tresh, jump_substeps,
                                jump_gate)
        t_f, alive_ref, conv_ref, sdf_f, counts = step(
            refine_ctx, origins_f, dirs_f, texit_f, dist_field,
            t_f, open_f, jnp.zeros_like(conv_f), sdf_f, time_val,
        )
        conv_f = jnp.where(open_f, conv_ref & alive_ref, conv_f)
        alive_f = jnp.where(open_f, alive_ref, alive_f)
        counts = np.asarray(counts)
        n_alive_max = int((counts[:, 0] + counts[:, 1]).max())

    return (t_f[:, :R_local], alive_f[:, :R_local], conv_f[:, :R_local],
            sdf_f[:, :R_local], n_alive_max)


def _padded(x, fill=0.0):
    pad = jnp.full((1,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def sphere_trace_adaptive(
    sdf_eval,                    # STATIC: (ctx, pts) -> sdf; stable identity!
    ctx,                         # pytree closed over by sdf_eval's params
    ray_origins, ray_dirs, boundary_primitive,
    nr_rounds: int = 5,
    iters_per_round: int = 3,
    sdf_multiplier: float = 0.9,
    sdf_converged_tresh: float = 2e-4,
    grid_cfg: Optional[og.OccupancyGridConfig] = None,
    grid: Optional[og.OccupancyGridState] = None,
    time_val: Optional[float] = None,
    refine_sdf_eval=None,        # STATIC: full-res sdf for LOD refinement
    refine_ctx=None,
    nr_refine_iters: int = 3,
    min_bucket: int = 256,
    dist_field=None,             # precomputed _grid_distance_field(grid_cfg, grid)
    return_n_hit: bool = False,
    round_sdf_evals: tuple = (),  # optional per-round eval override (LOD schedule)
    final_refresh: bool = True,
    jump_substeps: int = 1,      # chained empty-space jumps per SDF eval
    prepass_jumps: int = 0,      # jump-only prepass before round 0
    jump_gate_voxels: float = 1.0,  # jumps only while sdf > this many
                                    # voxels (mask-ckpt tunnel guard; see
                                    # _trace_rounds_impl)
    stats_out: Optional[list] = None,  # appended: per-stage (name, bucket,
                                       # n_active, n_hit) for floor models
):
    """Sphere tracing with HOST-adaptive static-shape compaction.

    Covers the reference's boolean-mask compaction loop
    (``sdf_utils.py:149-186``): every round re-bins the measured active set
    into a bucket from the {2^k, 1.5*2^k} ladder (one compile per size,
    cached), so no ray is ever dropped regardless of how much of the frame
    is foreground. Empty-space skipping reads the occupancy grid's
    Chebyshev distance field — computed ONCE per grid state (pass
    ``dist_field`` to amortize it across frames/chunks), one gather per
    ray per step. The host fetches one tiny count array per round —
    round-trips through the remote-TPU transport cost ~100 ms each and
    dominated earlier designs.

    ``sdf_eval`` / ``refine_sdf_eval`` must be stable function objects
    (module-level or lru-cached) — they are jit static args.

    LOD: pass a cheap coarse-level ``sdf_eval`` for the march and the
    full-resolution field as ``refine_sdf_eval``; converged hits get
    ``nr_refine_iters`` extra full-res steps (same convergence rule),
    removing the coarse bias at a fraction of a full-res march.

    Returns (pos [R,3], sdf [R], converged [R], within_bounds [R])
    (+ the ALIVE count when ``return_n_hit`` — the shadeable-ray upper
    bound: the reference shades every in-bounds final position, converged
    or not — saving the caller a device round-trip).
    """
    R = ray_origins.shape[0]
    if time_val is not None:
        # traced scalar: all time values share one compiled trace kernel
        time_val = jnp.asarray(time_val, jnp.float32)
    p_entry, t_entry_c, _, t_exit_c, hit = boundary_primitive.ray_intersection(
        ray_origins, ray_dirs
    )
    if grid is not None and grid_cfg is not None and dist_field is None:
        dist_field = _grid_distance_field(grid_cfg, grid)
    if grid is None or grid_cfg is None:
        dist_field = None

    origins_f = _padded(ray_origins)
    dirs_f = _padded(ray_dirs)
    texit_f = _padded(t_exit_c[:, 0])
    t_f = _padded(t_entry_c[:, 0])
    alive_f = _padded(hit[:, 0], False)
    conv_f = jnp.zeros(R + 1, bool)
    sdf_f = jnp.zeros(R + 1, jnp.float32)

    if prepass_jumps > 0 and dist_field is not None:
        t_f, alive_f, n_act = _jump_prepass(
            dist_field, origins_f, dirs_f, texit_f, t_f, alive_f,
            grid_cfg, prepass_jumps)
        n_active = int(n_act)
    else:
        n_active = int(jnp.sum(alive_f[:R]))
    n_hit = 0
    jump_gate = (float(jump_gate_voxels) * grid_cfg.voxel_size
                 if grid_cfg is not None else 0.0)
    for rnd in range(nr_rounds):
        if n_active == 0:
            break
        ev = round_sdf_evals[rnd] if rnd < len(round_sdf_evals) else sdf_eval
        bucket = pow2_bucket(n_active, lo=min_bucket, hi=max(min_bucket, R))
        t_f, alive_f, conv_f, sdf_f, counts = _trace_rounds(
            ev, ctx, origins_f, dirs_f, texit_f, dist_field,
            t_f, alive_f, conv_f, sdf_f, grid_cfg, iters_per_round, bucket,
            sdf_multiplier, sdf_converged_tresh, time_val,
            jump_substeps=jump_substeps, jump_gate=jump_gate,
        )
        counts = np.asarray(counts)
        n_active, n_hit = int(counts[0]), int(counts[1])
        if stats_out is not None:
            stats_out.append((f"round{rnd}", bucket, n_active, n_hit))

    n_alive = n_active + n_hit
    if refine_sdf_eval is not None and n_alive > 0:
        # LOD refinement: re-open EVERY still-alive ray (converged hits AND
        # not-yet-converged marchers) and march it with the full-resolution
        # field — hits lose the coarse-LOD bias, stragglers get full-res
        # steps to land. The reference shades every in-bounds final
        # position regardless of convergence (train_permuto_sdf.py:215-222
        # gates weights only on bounds+occupancy), so stragglers must end
        # at full-res positions too.
        open_f = alive_f
        bucket = pow2_bucket(n_alive, lo=min_bucket, hi=max(min_bucket, R))
        t_f, alive_ref, conv_ref, sdf_f, counts = _trace_rounds(
            refine_sdf_eval, refine_ctx, origins_f, dirs_f, texit_f,
            dist_field, t_f, open_f, jnp.zeros_like(conv_f), sdf_f,
            grid_cfg, nr_refine_iters, bucket, sdf_multiplier,
            sdf_converged_tresh, time_val, jump_substeps=jump_substeps,
            jump_gate=jump_gate,
        )
        conv_f = jnp.where(open_f, conv_ref & alive_ref, conv_f)
        alive_f = jnp.where(open_f, alive_ref, alive_f)
        counts = np.asarray(counts)
        n_hit = int(counts[1])
        n_alive = int(counts[0]) + n_hit
        if stats_out is not None:
            stats_out.append(("refine", bucket, int(counts[0]), n_hit))
        final_eval, final_ctx = refine_sdf_eval, refine_ctx
    else:
        final_eval, final_ctx = sdf_eval, ctx

    pos_f = origins_f + t_f[:, None] * dirs_f
    # final_refresh=False skips the last-position sdf re-evaluation — callers
    # that shade the hits immediately afterwards recompute the sdf anyway
    if final_refresh and n_alive > 0:
        bucket = pow2_bucket(n_alive, lo=min_bucket, hi=max(min_bucket, R))
        sdf_f = _refresh_sdf(final_eval, final_ctx, pos_f, alive_f, sdf_f,
                             bucket, time_val)

    out = (pos_f[:R], sdf_f[:R], (conv_f & alive_f)[:R], alive_f[:R])
    return out + (n_alive,) if return_n_hit else out

