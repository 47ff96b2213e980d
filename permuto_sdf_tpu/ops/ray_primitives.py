"""Bounding primitives: Sphere and AABB, with ray intersection + sampling.

TPU-native equivalents of the reference's CUDA ``Sphere``
(``/root/reference/src/Sphere.cu``, kernel ``SphereGPU.cuh:21-96``) and pure
python ``AABB`` (``permuto_sdf_py/utils/aabb.py``). All ops are pure jnp,
batched over rays/points, jit- and vmap-safe.

Semantics matched to the reference:
- Sphere intersection solves the quadratic; on miss both t values are 0 and
  the hit flag is False; ``t_entry`` is clamped to >= 0 so rays starting
  inside the sphere begin at the origin (``SphereGPU.cuh:70-73``).
- ``rand_points_inside`` samples uniformly in the volume via
  (phi, cos theta, u^(1/3)) (``SphereGPU.cuh:99-135``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Sphere:
    radius: float = 0.5
    center: tuple = (0.0, 0.0, 0.0)

    def ray_intersection(self, ray_origins, ray_dirs):
        """-> (points_entry [N,3], t_entry [N,1], points_exit [N,3],
        t_exit [N,1], does_intersect [N,1] bool)."""
        center = jnp.asarray(self.center, dtype=ray_origins.dtype)
        oc = ray_origins - center
        a = jnp.sum(ray_dirs * ray_dirs, axis=-1, keepdims=True)
        b = 2.0 * jnp.sum(oc * ray_dirs, axis=-1, keepdims=True)
        c = jnp.sum(oc * oc, axis=-1, keepdims=True) - self.radius ** 2
        disc = b * b - 4 * a * c
        sq = jnp.sqrt(jnp.abs(disc))
        t0 = (-b - sq) / (2.0 * a)
        t1 = (-b + sq) / (2.0 * a)
        hit = disc >= 0
        t0 = jnp.where(hit, t0, 0.0)
        t1 = jnp.where(hit, t1, 0.0)
        t0 = jnp.maximum(t0, 0.0)  # clamp entry in front of the camera
        p0 = ray_origins + t0 * ray_dirs
        p1 = ray_origins + t1 * ray_dirs
        return p0, t0, p1, t1, hit

    def check_point_inside_primitive(self, points):
        center = jnp.asarray(self.center, dtype=points.dtype)
        d2 = jnp.sum((points - center) ** 2, axis=-1, keepdims=True)
        return d2 < self.radius ** 2

    def rand_points_inside(self, key, nr_points: int):
        k1, k2, k3 = jax.random.split(key, 3)
        phi = jax.random.uniform(k1, (nr_points,), minval=0.0, maxval=2 * jnp.pi)
        costheta = jax.random.uniform(k2, (nr_points,), minval=-1.0, maxval=1.0)
        u = jax.random.uniform(k3, (nr_points,))
        theta = jnp.arccos(costheta)
        r = self.radius * u ** (1.0 / 3.0)
        sin_t = jnp.sin(theta)
        pts = jnp.stack(
            [r * sin_t * jnp.cos(phi), r * sin_t * jnp.sin(phi), r * jnp.cos(theta)],
            axis=-1,
        )
        return pts + jnp.asarray(self.center)


@dataclasses.dataclass(frozen=True)
class AABB:
    """Axis-aligned box, mirroring ``utils/aabb.py:7-134`` (slab method,
    t clamped >= 0)."""

    min_corner: tuple = (-0.5, -0.5, -0.5)
    max_corner: tuple = (0.5, 0.5, 0.5)

    @classmethod
    def from_scaling_and_translation(cls, scaling=1.0, translation=(0, 0, 0)):
        s = scaling
        t = jnp.asarray(translation)
        lo = tuple((jnp.asarray([-0.5, -0.5, -0.5]) * s + t).tolist())
        hi = tuple((jnp.asarray([0.5, 0.5, 0.5]) * s + t).tolist())
        return cls(lo, hi)

    @property
    def radius(self):
        """Half-diagonal stand-in so samplers expecting a sphere still work."""
        import numpy as np

        lo = np.asarray(self.min_corner)
        hi = np.asarray(self.max_corner)
        return float(np.max(hi - lo) / 2.0)

    @property
    def center(self):
        import numpy as np

        return tuple(
            ((np.asarray(self.min_corner) + np.asarray(self.max_corner)) / 2.0).tolist()
        )

    def ray_intersection(self, ray_origins, ray_dirs):
        lo = jnp.asarray(self.min_corner, dtype=ray_origins.dtype)
        hi = jnp.asarray(self.max_corner, dtype=ray_origins.dtype)
        inv_d = 1.0 / jnp.where(jnp.abs(ray_dirs) < 1e-12,
                                jnp.sign(ray_dirs) * 1e-12 + 1e-12, ray_dirs)
        t_lo = (lo - ray_origins) * inv_d
        t_hi = (hi - ray_origins) * inv_d
        t_near = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1, keepdims=True)
        t_far = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1, keepdims=True)
        hit = (t_far >= t_near) & (t_far > 0)
        t_near = jnp.where(hit, jnp.maximum(t_near, 0.0), 0.0)
        t_far = jnp.where(hit, t_far, 0.0)
        p0 = ray_origins + t_near * ray_dirs
        p1 = ray_origins + t_far * ray_dirs
        return p0, t_near, p1, t_far, hit

    def check_point_inside_primitive(self, points):
        lo = jnp.asarray(self.min_corner, dtype=points.dtype)
        hi = jnp.asarray(self.max_corner, dtype=points.dtype)
        inside = jnp.all((points >= lo) & (points <= hi), axis=-1, keepdims=True)
        return inside

    def rand_points_inside(self, key, nr_points: int):
        lo = jnp.asarray(self.min_corner)
        hi = jnp.asarray(self.max_corner)
        u = jax.random.uniform(key, (nr_points, 3))
        return lo + u * (hi - lo)
