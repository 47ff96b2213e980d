"""Loss library — equivalents of the reference's loss helpers.

Sources: ``/root/reference/permuto_sdf_py/utils/sdf_utils.py:16-115``
(SIREN-style SDF fit loss + sphere-init losses) and
``permuto_sdf_py/utils/permuto_sdf_utils.py:43-77`` (rgb / eikonal /
sphere-init dispatch). Weights match the reference defaults.
"""

from __future__ import annotations

import jax.numpy as jnp


def map_range_val(x, in_start, in_end, out_start, out_end):
    """Linear remap with clamping (common_utils.py:156-160). Works on python
    scalars and jnp arrays alike."""
    x = jnp.clip(x, in_start, in_end)
    return out_start + ((out_end - out_start) / (in_end - in_start)) * (x - in_start)


def sdf_loss(surface_sdf, surface_sdf_gradients, offsurface_sdf,
             offsurface_sdf_gradients, gt_normals):
    """SIREN eq. 6 fit loss (sdf_utils.py:16-57): eikonal*5e1 +
    surface-normal-cos*1e2 + |surface sdf|*3e3 + offsurface exp*1e2."""
    all_gradients = jnp.concatenate([surface_sdf_gradients, offsurface_sdf_gradients], 0)
    eikonal = jnp.abs(jnp.linalg.norm(all_gradients, axis=-1) - 1.0)

    loss_surface_sdf = jnp.abs(surface_sdf)
    g = surface_sdf_gradients
    cos = jnp.sum(g * gt_normals, axis=-1) / (
        jnp.linalg.norm(g, axis=-1) * jnp.linalg.norm(gt_normals, axis=-1) + 1e-12
    )
    loss_surface_normal = 1.0 - cos
    loss_offsurface_high_sdf = jnp.exp(-1e2 * jnp.abs(offsurface_sdf))

    return (
        eikonal.mean() * 5e1
        + loss_surface_normal.mean() * 1e2
        + loss_surface_sdf.mean() * 3e3
        + loss_offsurface_high_sdf.mean() * 1e2
    )


def sdf_loss_sphere(points, sdf, sdf_gradients, sphere_radius, sphere_center,
                    distance_scale=1.0):
    """Fit the field to an analytic sphere SDF (sdf_utils.py:60-83) — the
    sphere-init phase. Returns (loss, loss_sdf, loss_eik)."""
    center = jnp.asarray(sphere_center, dtype=points.dtype)
    dist = jnp.linalg.norm(points - center, axis=-1, keepdims=True)
    target = (dist - sphere_radius) * distance_scale
    loss_dists = jnp.mean((sdf - target) ** 2)
    eik = jnp.mean((jnp.linalg.norm(sdf_gradients, axis=-1) - distance_scale) ** 2)
    return loss_dists * 3e3 + eik * 5e1, loss_dists, eik


def sdf_loss_spheres(points, sdf, sdf_gradients, sphere_list, distance_scale=1.0):
    """Union-of-spheres (min-combined) variant (sdf_utils.py:86-115)."""
    dists = None
    for radius, center in sphere_list:
        c = jnp.asarray(center, dtype=points.dtype)
        d = (jnp.linalg.norm(points - c, axis=-1, keepdims=True) - radius) * distance_scale
        dists = d if dists is None else jnp.minimum(dists, d)
    loss_dists = jnp.mean((sdf - dists) ** 2)
    eik = jnp.mean((jnp.linalg.norm(sdf_gradients, axis=-1) - distance_scale) ** 2)
    return loss_dists * 3e3 + eik * 5e1, loss_dists, eik


def rgb_loss(gt_rgb, pred_rgb, does_ray_intersect):
    """Masked L1 (permuto_sdf_utils.py:43-47)."""
    return jnp.mean(jnp.abs(gt_rgb - pred_rgb) * does_ray_intersect)


def eikonal_loss(sdf_gradients):
    """(||grad|| - 1)^2 (permuto_sdf_utils.py:49-51). Gradients may be [N,3]
    or [N,4]-with-spatial-slice already applied by the caller."""
    return jnp.mean(
        (jnp.linalg.norm(sdf_gradients.reshape(sdf_gradients.shape[0], -1), axis=-1) - 1.0)
        ** 2
    )
