"""Foreground and background ray samplers (no occupancy grid).

Equivalents of the reference's ``RaySampler`` CUDA class
(``/root/reference/src/RaySampler.cu``,
``kernels/permuto_sdf/RaySamplerGPU.cuh``):

- ``compute_samples_fg`` (``RaySamplerGPU.cuh:162-335``): uniform samples
  between t_entry/t_exit with spacing max(range/max_samples,
  min_dist_between_samples); only the start is jittered so all dts stay
  equal; the last sample's dt clamps to the remaining distance; rays with
  <= 2 samples are discarded.
- ``compute_samples_bg`` (``RaySamplerGPU.cuh:31-160``): NeRF++-style
  background — fixed nr_samples per ray at inverse-depth
  t in [1 -> min_t=1e-3], z = t_exit / t, with both the (optionally
  mip-nerf-contracted) 3D point and the 4D (direction-from-center,
  radius/r) parameterization; dt in z-space, last dt = 1e10.

Dense masked layout; everything vectorized, no atomics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from permuto_sdf_tpu.ops.ray_samples import RaySamples, prefix_mask


def compute_samples_fg(origins, dirs, t_entry, t_exit,
                       min_dist_between_samples: float,
                       max_nr_samples_per_ray: int,
                       key=None, jitter: bool = False) -> RaySamples:
    R = origins.shape[0]
    S = max_nr_samples_per_ray
    t0 = t_entry.reshape(-1)
    t1 = t_exit.reshape(-1)
    dist = t1 - t0
    nr = jnp.clip((dist / min_dist_between_samples).astype(jnp.int32), 0, S)
    dt_ray = jnp.where(nr > 0, dist / jnp.maximum(nr, 1), 0.0)
    nr = jnp.where(nr <= 2, 0, nr)  # reference discard rule (<=2 -> no samples)

    if jitter and key is not None:
        start = jax.random.uniform(key, (R, 1)) * dt_ray[:, None]
    else:
        start = jnp.zeros((R, 1))
    z = t0[:, None] + start + jnp.arange(S)[None, :] * dt_ray[:, None]
    mask = prefix_mask(nr, S)
    z = jnp.where(mask, jnp.clip(z, t0[:, None], t1[:, None]), 0.0)

    dt = jnp.broadcast_to(dt_ray[:, None], (R, S))
    last_idx = jnp.maximum(nr - 1, 0)
    z_last = jnp.take_along_axis(z, last_idx[:, None], axis=-1)[:, 0]
    rem = jnp.clip(t1 - z_last, 0.0, dt_ray)
    is_last = (jnp.arange(S)[None, :] == last_idx[:, None]) & mask
    dt = jnp.where(is_last, rem[:, None], dt)
    dt = jnp.where(mask, dt, 0.0)

    return RaySamples(
        origins=origins, dirs=dirs, z=z, dt=dt, mask=mask,
        ray_fixed_dt=jnp.where(nr > 0, dt_ray, 0.0),
    )


def compute_samples_bg(origins, dirs, t_exit, nr_samples_bg: int,
                       sphere_radius: float, sphere_center,
                       key=None, jitter: bool = False,
                       contract_3d_samples: bool = False) -> RaySamples:
    R = origins.shape[0]
    S = nr_samples_bg
    t1 = t_exit.reshape(-1, 1)
    center = jnp.asarray(sphere_center, dtype=origins.dtype)

    min_t = 1e-3
    t_between = (1.0 - min_t) / (S - 1)
    t = 1.0 - jnp.arange(S, dtype=jnp.float32)[None, :] * t_between  # [1, S]
    t = jnp.broadcast_to(t, (R, S))
    if jitter and key is not None:
        rand = jax.random.uniform(key, (R, S))
        t = t + (t_between * rand - t_between / 2.0)
    t = jnp.clip(t, min_t, 1.0)

    z = t1 / t  # [R, S], from sphere surface outward to ~infinity
    pos3d = origins[:, None, :] + z[..., None] * dirs[:, None, :]
    if contract_3d_samples:
        t_radius0 = t * sphere_radius
        d = jnp.linalg.norm(pos3d, axis=-1, keepdims=True)
        pos3d = (2 * sphere_radius - t_radius0[..., None]) * pos3d / jnp.maximum(d, 1e-12)

    # 4D NeRF++ parameterization: (dir from sphere center, radius / r)
    rel = pos3d - center
    dist = jnp.linalg.norm(rel, axis=-1, keepdims=True)
    dir_from_center = rel / jnp.maximum(dist, 1e-12)
    t_10 = sphere_radius / jnp.maximum(dist, 1e-6)
    pos_4d = jnp.concatenate([dir_from_center, t_10], axis=-1)  # [R, S, 4]

    dt = jnp.concatenate([z[:, 1:] - z[:, :-1], jnp.full((R, 1), 1e10)], axis=-1)
    mask = jnp.ones((R, S), bool)

    return RaySamples(
        origins=origins, dirs=dirs, z=z, dt=dt, mask=mask,
        ray_fixed_dt=jnp.zeros((R,)), pos_4d=pos_4d,
    )
