"""Synthetic posed multi-view dataset from analytic SDF scenes.

The benchmark/e2e stand-in for DTU in data-less environments: renders posed
images of an analytic SDF scene by sphere tracing the exact SDF, giving a
dataset with *known* ground-truth geometry (for Chamfer) and images (for
PSNR). Serves the same role as the reference's DTU loader + TensorReel
combination in its training pipelines.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from permuto_sdf_tpu.datasets.tensor_reel import TensorReel, look_at_cam_to_world, rays_from_frame


def scene_sdf(p):
    """Analytic test scene: sphere + torus union, inside the r=0.5 bound."""
    sphere = jnp.linalg.norm(p - jnp.asarray([0.12, 0.0, 0.0]), axis=-1) - 0.17
    q = p - jnp.asarray([-0.12, 0.0, 0.0])
    xy = jnp.linalg.norm(q[..., :2], axis=-1)
    torus = jnp.sqrt((xy - 0.14) ** 2 + q[..., 2] ** 2) - 0.06
    return jnp.minimum(sphere, torus)


def scene_normal(p, sdf_fn=scene_sdf):
    g = jax.grad(lambda q: sdf_fn(q).sum())(p)
    return g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-12)


def _sd_sphere(p, c, r):
    return jnp.linalg.norm(p - jnp.asarray(c), axis=-1) - r


def _sd_torus(p, c, R, r, axis=2):
    q = p - jnp.asarray(c)
    ix = [i for i in range(3) if i != axis]
    xy = jnp.linalg.norm(q[..., ix], axis=-1)
    return jnp.sqrt((xy - R) ** 2 + q[..., axis] ** 2) - r


def _sd_box(p, c, b, rad=0.02):
    q = jnp.abs(p - jnp.asarray(c)) - jnp.asarray(b)
    return (jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
            + jnp.minimum(jnp.max(q, axis=-1), 0.0) - rad)


def bench_scene_sdf(p):
    """Busier analytic scene for throughput benchmarking.

    The default ``scene_sdf`` (sphere+torus) settles to ~0.14% occupancy
    at 256^3 — far below the ~2% a DTU scan occupies — so a bench run on
    it measures an unrealistically EMPTY steady state and the per-valid-
    sample throughput normalization collapses for scene reasons
    (PERFORMANCE.md finding 32). This scene (wrinkly central blob, two
    interlocked tori, three satellites, a rounded box; everything inside
    r=0.47) measures ~1.6% band occupancy at a 1-voxel band on the exact
    field — reference-like sample load at steady state.

    Returns a conservative distance LOWER bound (the sine-displaced blob
    term is scaled by its Lipschitz constant) so the GT sphere tracer in
    ``_render_view`` stays convergent.
    """
    blob = _sd_sphere(p, [0.0, 0.0, 0.0], 0.30) + 0.02 * (
        jnp.sin(40 * p[..., 0]) * jnp.sin(40 * p[..., 1])
        * jnp.sin(40 * p[..., 2]))
    blob = blob / 1.9  # Lipschitz bound of the displaced field
    t1 = _sd_torus(p, [0.0, 0.0, 0.0], 0.40, 0.030, axis=2)
    t2 = _sd_torus(p, [0.0, 0.0, 0.0], 0.40, 0.030, axis=0)
    s1 = _sd_sphere(p, [0.28, 0.28, 0.0], 0.06)
    s2 = _sd_sphere(p, [-0.28, 0.28, 0.0], 0.06)
    s3 = _sd_sphere(p, [0.0, -0.33, 0.18], 0.06)
    bx = _sd_box(p, [0.0, 0.28, -0.20], [0.08, 0.035, 0.08])
    return jnp.minimum(blob, jnp.minimum(
        jnp.minimum(t1, t2),
        jnp.minimum(jnp.minimum(s1, s2), jnp.minimum(s3, bx))))


def scene_color(p, n):
    """Position-striped albedo with lambertian shading from a fixed light."""
    albedo = jnp.stack(
        [
            0.5 + 0.45 * jnp.sin(25.0 * p[..., 0]),
            0.5 + 0.45 * jnp.sin(25.0 * p[..., 1] + 1.0),
            0.5 + 0.45 * jnp.sin(25.0 * p[..., 2] + 2.0),
        ],
        axis=-1,
    )
    light = jnp.asarray([0.5, 0.7, -0.5])
    light = light / jnp.linalg.norm(light)
    lam = jnp.clip(jnp.sum(n * light, axis=-1, keepdims=True), 0.0, 1.0)
    return jnp.clip(albedo * (0.25 + 0.75 * lam), 0.0, 1.0)


_BG_COLOR = np.array([0.85, 0.9, 0.95], np.float32)

# Finite-radius sky sphere for the textured background mode: far enough
# outside the r=0.5 foreground bound to be background, close enough that
# cameras at radius 1.3 see real PARALLAX between views — the signal the
# NeRF++ 4D background model needs (the reference trains its bg on real
# DTU backgrounds every run; a constant-color bg gives it zero signal).
_BG_SPHERE_RADIUS = 4.0


def bg_color_at(p):
    """Procedural sky-sphere texture, a smooth function of the 3D hit
    point (NOT of view direction alone) so it is parallax-bearing and
    learnable by the inverse-sphere background field."""
    u = p / _BG_SPHERE_RADIUS
    r = 0.55 + 0.25 * jnp.sin(3.0 * u[..., 0] + 5.0 * u[..., 1])
    g = 0.55 + 0.25 * jnp.sin(4.0 * u[..., 1] + 3.0 * u[..., 2] + 1.3)
    b = 0.60 + 0.25 * jnp.sin(5.0 * u[..., 2] + 4.0 * u[..., 0] + 2.1)
    bands = 0.12 * jnp.sin(9.0 * u[..., 1])
    return jnp.clip(jnp.stack([r + bands, g + bands, b], axis=-1), 0.0, 1.0)


def _bg_sphere_hit(origins, dirs):
    """Second (far) intersection of unit rays with the sky sphere."""
    b = jnp.sum(origins * dirs, axis=-1)
    c = jnp.sum(origins * origins, axis=-1) - _BG_SPHERE_RADIUS ** 2
    t = -b + jnp.sqrt(jnp.maximum(b * b - c, 0.0))
    return origins + t[..., None] * dirs


def _render_view(K, tf, width, height, sdf_fn=scene_sdf, n_steps: int = 96,
                 bg_mode: str = "constant"):
    origins, dirs = rays_from_frame(K, tf, width, height)

    def trace(o, d):
        def body(i, carry):
            t, done = carry
            p = o + t[..., None] * d
            s = sdf_fn(p)
            t = jnp.where(done, t, t + s * 0.9)
            done = done | (jnp.abs(s) < 1e-4) | (t > 3.0)
            return t, done

        t0 = jnp.full(o.shape[:-1], 0.3)
        done = jnp.zeros(o.shape[:-1], bool)
        t, done = jax.lax.fori_loop(0, n_steps, body, (t0, done))
        return t, jnp.abs(sdf_fn(o + t[..., None] * d)) < 1e-3

    t, hit = trace(origins, dirs)
    p = origins + t[..., None] * dirs
    n = scene_normal(p, sdf_fn=sdf_fn)
    rgb = scene_color(p, n)
    if bg_mode == "textured":
        bg = bg_color_at(_bg_sphere_hit(origins, dirs))
    else:
        bg = jnp.asarray(_BG_COLOR)
    rgb = jnp.where(hit[..., None], rgb, bg)
    return (
        np.asarray(rgb).reshape(height, width, 3),
        np.asarray(hit).reshape(height, width, 1).astype(np.float32),
    )


def spiral_camera(i_frac: float, width: int = 200, height: int = 200,
                  radius: float = 1.3, fov_deg: float = 32.0,
                  nr_views: int = 24):
    """The golden-spiral capture camera at (possibly fractional) index
    ``i_frac`` — the ONE source of truth for the synthetic capture
    distribution. Integer indices are the training cameras of
    :func:`make_synthetic_reel`; fractional indices (e.g. 8.5) sit between
    training cameras and are the held-out eval protocol used by the
    eval_artifacts scripts across rounds. Returns ``(K, tf_world_cam)``."""
    f = 0.5 * width / np.tan(np.radians(fov_deg) / 2)
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32)
    golden = np.pi * (3.0 - np.sqrt(5.0))
    # fibonacci hemisphere-ish coverage; 0.8 factor stays away from poles
    zf = 0.8 * (1.0 - 2.0 * (i_frac + 0.5) / nr_views)
    r = np.sqrt(max(1.0 - zf * zf, 1e-6))
    th = golden * i_frac
    eye = radius * np.array([r * np.cos(th), zf, r * np.sin(th)])
    return K, look_at_cam_to_world(eye).astype(np.float32)


def make_synthetic_reel(nr_views: int = 24, width: int = 200, height: int = 200,
                        radius: float = 1.3, fov_deg: float = 32.0,
                        with_mask: bool = True, sdf_fn=scene_sdf,
                        bg_mode: str = "constant") -> TensorReel:
    rgbs, masks, Ks, tfs = [], [], [], []
    for i in range(nr_views):
        K, tf = spiral_camera(i, width, height, radius, fov_deg, nr_views)
        rgb, mask = _render_view(K, tf, width, height, sdf_fn=sdf_fn,
                                 bg_mode=bg_mode)
        rgbs.append(rgb)
        masks.append(mask)
        Ks.append(K)
        tfs.append(tf.astype(np.float32))

    return TensorReel(
        rgb=jnp.asarray(np.stack(rgbs)),
        mask=jnp.asarray(np.stack(masks)) if with_mask else None,
        K=jnp.asarray(np.stack(Ks)),
        tf_world_cam=jnp.asarray(np.stack(tfs)),
    )
