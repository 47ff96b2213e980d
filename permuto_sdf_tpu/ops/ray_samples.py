"""Dense masked ray-sample batches — the TPU replacement for RaySamplesPacked.

The reference stores variable-length per-ray samples in a CSR-like packed
buffer allocated with atomicAdd (``/root/reference/src/RaySamplesPacked.cu``,
``kernels/permuto_sdf/RaySamplesPackedGPU.cuh``) and compacts it between
stages. That design is GPU-shaped: dynamic allocation, nondeterministic
ordering, per-ray loops.

On TPU everything is static-shaped: a batch is ``[nr_rays, max_samples]``
with a **prefix validity mask** (all valid samples of a ray occupy slots
``0..n-1``). This removes ``compact_to_valid_samples`` and
``compute_per_sample_ray_idx`` entirely (the latter becomes a broadcast),
keeps allocation deterministic, and lets every per-ray op be a masked
vectorized reduction/cumulation over axis 1 — ideal for the VPU.

The reference's ray-discard rules are mirrored: rays with <= 2 samples get
``nr_samples = 0`` (``RaySamplerGPU.cuh:316-322``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RaySamples:
    """A batch of per-ray samples in dense masked layout.

    Fields (R = nr_rays, S = max samples per ray):
      origins:  [R, 3] ray origins
      dirs:     [R, 3] ray directions (per-ray; per-sample dirs equal these)
      z:        [R, S] sample depth along the ray (invalid slots: arbitrary)
      dt:       [R, S] segment length per sample
      mask:     [R, S] bool prefix mask of valid samples
      ray_fixed_dt: [R] nominal uniform spacing of the ray's samples
                    (0 when spacing varies per sample — bg rays, merged rays)
      sdf:      optional [R, S] cached sdf per sample (importance sampling)
      pos_4d:   optional [R, S, 4] background 4D parameterization
    """

    origins: jnp.ndarray
    dirs: jnp.ndarray
    z: jnp.ndarray
    dt: jnp.ndarray
    mask: jnp.ndarray
    ray_fixed_dt: jnp.ndarray
    sdf: Optional[jnp.ndarray] = None
    pos_4d: Optional[jnp.ndarray] = None

    @property
    def nr_rays(self) -> int:
        return self.z.shape[0]

    @property
    def max_samples(self) -> int:
        return self.z.shape[1]

    def nr_samples_per_ray(self) -> jnp.ndarray:
        return jnp.sum(self.mask, axis=-1)

    def positions(self) -> jnp.ndarray:
        """[R, S, 3] world positions (zero at invalid slots)."""
        p = self.origins[:, None, :] + self.z[..., None] * self.dirs[:, None, :]
        return jnp.where(self.mask[..., None], p, 0.0)

    def flat_positions(self) -> jnp.ndarray:
        return self.positions().reshape(-1, 3)

    def flat_dirs(self) -> jnp.ndarray:
        d = jnp.broadcast_to(self.dirs[:, None, :], (*self.z.shape, 3))
        return d.reshape(-1, 3)

    def per_sample_ray_idx(self) -> jnp.ndarray:
        """[R*S] ray index of each flat sample (RaySamplesPacked
        ``compute_per_sample_ray_idx`` equivalent — here just a broadcast)."""
        r = jnp.arange(self.nr_rays, dtype=jnp.int32)[:, None]
        return jnp.broadcast_to(r, self.z.shape).reshape(-1)

    def flat_mask(self) -> jnp.ndarray:
        return self.mask.reshape(-1)

    def with_sdf(self, sdf_flat) -> "RaySamples":
        return dataclasses.replace(self, sdf=sdf_flat.reshape(self.z.shape))

    def valid_rays(self) -> jnp.ndarray:
        """[R] bool — rays that have at least one valid sample."""
        return jnp.any(self.mask, axis=-1)


def prefix_mask(nr: jnp.ndarray, max_samples: int) -> jnp.ndarray:
    """[R] counts -> [R, max_samples] prefix mask."""
    return jnp.arange(max_samples)[None, :] < nr[:, None]
