"""Volume-rendering math on dense masked ray batches.

Equivalent of the reference's ``VolumeRendering`` CUDA class
(``/root/reference/src/VolumeRendering.cu``,
``kernels/permuto_sdf/VolumeRenderingGPU.cuh``) and the python autograd
wrappers (``permuto_sdf_py/volume_rendering/volume_rendering_funcs.py``,
``volume_rendering_modules.py``). Each per-ray serial CUDA loop becomes a
masked vectorized reduction/cumsum over the samples axis; JAX autodiff
produces the backward passes (the reference hand-derives them, e.g. the
cumprod backward at ``volume_rendering_funcs.py:79-118``), so there are no
custom VJPs to maintain — XLA fuses these elementwise chains anyway.

All functions assume the **prefix-mask invariant** of
:class:`~permuto_sdf_tpu.ops.ray_samples.RaySamples`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from permuto_sdf_tpu.ops.ray_samples import RaySamples, prefix_mask
from permuto_sdf_tpu.utils.losses import map_range_val


# ---------------------------------------------------------------------------
# Basic per-ray reductions
# ---------------------------------------------------------------------------

def compute_dt(z, mask, t_exit, use_ray_t_exit: bool = True):
    """dt_i = z_{i+1} - z_i; the last valid sample closes against t_exit (or
    1e10 when modeling unbounded space) — ``VolumeRenderingGPU.cuh:307-363``."""
    z_next = jnp.concatenate([z[:, 1:], z[:, -1:]], axis=-1)
    nr = jnp.sum(mask, axis=-1)
    last_idx = jnp.maximum(nr - 1, 0)
    is_last = (jnp.arange(z.shape[1])[None, :] == last_idx[:, None]) & mask
    if use_ray_t_exit:
        last_dt = t_exit.reshape(-1, 1) - z
    else:
        last_dt = jnp.full_like(z, 1e10)
    dt = jnp.where(is_last, last_dt, z_next - z)
    return jnp.where(mask, dt, 0.0)


def cumprod_alpha2transmittance(one_minus_alpha, mask):
    """Exclusive masked cumprod. Returns (transmittance [R, S],
    bg_transmittance [R]).

    Matches ``cumprod_alpha2transmittance_gpu``
    (``VolumeRenderingGPU.cuh:371-422``): T_i = prod_{j<i} input_j over
    valid samples, and bg_transmittance = T_{n-1} (the last *stored* T —
    the last sample's own alpha is NOT multiplied in).
    """
    x = jnp.where(mask, one_minus_alpha, 1.0)
    cp = jnp.cumprod(x, axis=-1)
    T_shifted = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=-1)
    T = jnp.where(mask, T_shifted, 0.0)
    nr = jnp.sum(mask, axis=-1)
    last_idx = jnp.maximum(nr - 1, 0)
    bg_T = jnp.take_along_axis(T_shifted, last_idx[:, None], axis=-1)[:, 0]
    bg_T = jnp.where(nr > 0, bg_T, 1.0)
    return T, bg_T


def integrate_with_weights(values, weights, mask):
    """sum_i w_i * v_i per ray. values [R, S, C], weights [R, S] -> [R, C]
    (``VolumeRenderingGPU.cuh:425-481``)."""
    w = jnp.where(mask, weights, 0.0)
    return jnp.sum(values * w[..., None], axis=1)


def sum_over_each_ray(values, mask):
    """Returns (sum per ray [R, C?], per-sample broadcast of that sum) —
    ``sum_over_each_ray_gpu`` (``VolumeRenderingGPU.cuh:566-629``)."""
    v = jnp.where(mask[..., None] if values.ndim == 3 else mask, values, 0.0)
    s = jnp.sum(v, axis=1)
    if values.ndim == 3:
        per_sample = jnp.broadcast_to(s[:, None, :], values.shape)
    else:
        per_sample = jnp.broadcast_to(s[:, None], values.shape)
    return s, per_sample


def cumsum_over_each_ray(values, mask, inverse: bool = False):
    """Masked inclusive cumsum (or suffix-sum when inverse) per ray
    (``VolumeRenderingGPU.cuh:631-694``)."""
    v = jnp.where(mask, values, 0.0)
    if inverse:
        return jnp.flip(jnp.cumsum(jnp.flip(v, -1), axis=-1), -1)
    return jnp.cumsum(v, axis=-1)


def compute_cdf(weights, mask):
    """Exclusive prefix-sum of weights per ray — ``compute_cdf``
    (``VolumeRenderingGPU.cuh:697-752``). Weights should be normalized to
    sum to 1 per ray before calling."""
    w = jnp.where(mask, weights, 0.0)
    incl = jnp.cumsum(w, axis=-1)
    return jnp.where(mask, incl - w, 0.0)


# ---------------------------------------------------------------------------
# Density/SDF -> alpha
# ---------------------------------------------------------------------------

def alpha_from_density(density, dt, mask):
    """NeRF alpha = 1 - exp(-sigma*dt) (volume_rendering_modules.py:72-75)."""
    return jnp.where(mask, 1.0 - jnp.exp(-density * dt), 0.0)


def sdf2alpha_sectional(samples: RaySamples, sdf, inv_s: float = 512.0,
                        dynamic_inv_s: bool = True, inv_s_multiplier: float = 1.0):
    """NeuS section alpha from consecutive sdf values — ``sdf2alpha_gpu``
    (``VolumeRenderingGPU.cuh:490-564``), used by importance sampling.

    The last valid sample of each ray gets alpha 0 (the CUDA loop stops at
    nr_samples-1). ``dynamic_inv_s`` maps the ray's uniform dt in
    [1e-4, 1e-2] to inv_s in [1024, 64].
    """
    mask = samples.mask
    z = samples.z
    if dynamic_inv_s:
        s = map_range_val(samples.ray_fixed_dt, 0.0001, 0.01, 1024.0, 64.0)
    else:
        s = jnp.full_like(samples.ray_fixed_dt, inv_s)
    s = (s * inv_s_multiplier)[:, None]

    sdf = sdf.reshape(z.shape)
    next_sdf = jnp.concatenate([sdf[:, 1:], sdf[:, -1:]], axis=-1)
    dt = samples.dt
    mid_sdf = (sdf + next_sdf) * 0.5
    cos_val = (next_sdf - sdf) / jnp.maximum(dt, 1e-6)
    cos_val = jnp.clip(cos_val, -1e3, 0.0)
    prev_esti = mid_sdf - cos_val * dt * 0.5
    next_esti = mid_sdf + cos_val * dt * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * s)
    next_cdf = jax.nn.sigmoid(next_esti * s)
    alpha = (prev_cdf - next_cdf + 1e-6) / (prev_cdf + 1e-6)

    nr = jnp.sum(mask, axis=-1)
    not_last = jnp.arange(z.shape[1])[None, :] < (nr - 1)[:, None]
    return jnp.where(mask & not_last, alpha, 0.0)


# ---------------------------------------------------------------------------
# NeuS weights (volume_rendering_modules.py:115-183)
# ---------------------------------------------------------------------------

def neus_compute_weights_from_cos(samples: RaySamples, sdf, true_cos, inv_s,
                                  cos_anneal_ratio):
    """NeuS weights from sdf values and a per-sample directional derivative
    ``true_cos = dir . grad(sdf)`` [R, S] (however estimated — analytic
    gradients, or a finite difference of consecutive sample sdf values for
    samples whose full-resolution gradient was never computed: the
    train-time LOD path). Returns (weights [R, S], weights_sum [R, 1],
    bg_transmittance [R])."""
    mask = samples.mask
    R, S = mask.shape
    sdf = sdf.reshape(R, S)
    dists = samples.dt

    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )  # always non-positive

    est_next = sdf + iter_cos * dists * 0.5
    est_prev = sdf - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)
    alpha = jnp.where(mask, alpha, 0.0)

    T, bg_T = cumprod_alpha2transmittance(1.0 - alpha + 1e-7, mask)
    weights = alpha * T
    weights_sum = jnp.sum(jnp.where(mask, weights, 0.0), axis=-1, keepdims=True)
    return weights, weights_sum, bg_T


def finite_difference_cos(samples: RaySamples, sdf):
    """Estimate ``dir . grad(sdf)`` per sample from consecutive sample sdf
    values along the ray: ``(sdf_{i+1} - sdf_i) / dt_i`` (the same section
    slope the reference's gradient-free ``sdf2alpha`` uses,
    ``VolumeRenderingGPU.cuh:490-564``). The last valid sample reuses a
    zero slope (its alpha contribution is ~0, matching the CUDA loop that
    stops at nr-1)."""
    sdf = sdf.reshape(samples.mask.shape)
    sdf_next = jnp.concatenate([sdf[:, 1:], sdf[:, -1:]], axis=-1)
    return (sdf_next - sdf) / jnp.maximum(samples.dt, 1e-6)


def neus_compute_weights(samples: RaySamples, sdf, sdf_gradients, inv_s,
                         cos_anneal_ratio):
    """Full NeuS weight computation with analytic cos and annealing.

    sdf [R*S or R,S], sdf_gradients [R*S, 3]. Returns
    (weights [R, S], weights_sum [R, 1], bg_transmittance [R]).
    """
    mask = samples.mask
    R, S = mask.shape
    grads = sdf_gradients.reshape(R, S, 3)
    dirs = samples.dirs[:, None, :]
    true_cos = jnp.sum(dirs * grads, axis=-1)  # [R, S]
    return neus_compute_weights_from_cos(samples, sdf, true_cos, inv_s,
                                         cos_anneal_ratio)


def nerf_compute_weights(samples: RaySamples, density):
    """NeRF weights (volume_rendering_modules.py:61-90). density [R*S or R,S].
    Returns (weights [R, S], weights_sum [R, 1], bg_transmittance [R])."""
    mask = samples.mask
    density = density.reshape(mask.shape)
    alpha = alpha_from_density(density, samples.dt, mask)
    T, bg_T = cumprod_alpha2transmittance(1.0 - alpha + 1e-7, mask)
    weights = alpha * T
    weights_sum = jnp.sum(jnp.where(mask, weights, 0.0), axis=-1, keepdims=True)
    return weights, weights_sum, bg_T


# ---------------------------------------------------------------------------
# SingleVarianceNetwork (volume_rendering_modules.py:94-113)
# ---------------------------------------------------------------------------

def init_variance(init_val: float = 0.3):
    # shape (1,), NOT 0-d: a 0-d param leaf alongside the big hash tables
    # makes XLA:TPU's optimizer fusion pathological (~1000x slower adam —
    # see PERFORMANCE.md finding 5)
    return {"variance": jnp.full((1,), init_val)}


def variance_inv_s(params, forced_variance=None):
    v = params["variance"][0] if forced_variance is None else forced_variance
    return jnp.clip(jnp.exp(v * 10.0), 1e-6, 1e6)


# ---------------------------------------------------------------------------
# Importance sampling (VolumeRenderingGPU.cuh:757-946) + merge (:950-1131)
# ---------------------------------------------------------------------------

def importance_sample(samples: RaySamples, cdf, nr_importance_samples: int,
                      key=None, jitter: bool = False) -> RaySamples:
    """Invert the per-ray CDF at stratified uniforms -> new z values.

    Stratified positions (i+1)/(n+1) with optional +-1/(2(n+1)) jitter,
    clamped to [1e-6, 1-1e-5]; z linearly interpolated between the
    bracketing samples by cdf and snapped to within ray_fixed_dt of the
    nearest bracket, exactly as the CUDA kernel does.
    """
    R, S = samples.mask.shape
    n = nr_importance_samples
    strata = (jnp.arange(n, dtype=jnp.float32) + 1.0) / (n + 1)
    u = jnp.broadcast_to(strata[None, :], (R, n))
    if jitter and key is not None:
        mov = 1.0 / (n + 1) / 2.0
        u = u + jax.random.uniform(key, (R, n), minval=-mov, maxval=mov)
    u = jnp.clip(u, 1e-6, 1.0 - 1e-5)

    nr = samples.nr_samples_per_ray()  # [R]
    # make invalid slots' cdf +inf so searchsorted stays within the valid prefix
    cdf_valid = jnp.where(samples.mask, cdf, jnp.inf)
    # compare_all: avoid the serial binary-search while loop on TPU
    # (see occupancy_grid.compute_samples_in_occupied_regions)
    imax = jax.vmap(lambda c, uu: jnp.searchsorted(
        c, uu, side="right", method="compare_all"))(cdf_valid, u)
    imax = jnp.clip(imax, 1, jnp.maximum(nr - 1, 1)[:, None])
    imin = imax - 1

    cdf_min = jnp.take_along_axis(cdf, imin, axis=-1)
    cdf_max = jnp.take_along_axis(cdf, imax, axis=-1)
    z_min = jnp.take_along_axis(samples.z, imin, axis=-1)
    z_max = jnp.take_along_axis(samples.z, imax, axis=-1)
    denom = jnp.where(jnp.abs(cdf_max - cdf_min) < 1e-12, 1e-12, cdf_max - cdf_min)
    z_imp = z_min + (u - cdf_min) / denom * (z_max - z_min)

    # snap within fixed_dt of the nearest bracket
    fixed_dt = samples.ray_fixed_dt[:, None]
    dist_to_zmin = z_imp - z_min
    dist_to_zmax = z_max - z_imp
    snap_lo = z_min + jnp.minimum(dist_to_zmin, fixed_dt)
    snap_hi = z_max - jnp.minimum(dist_to_zmax, fixed_dt)
    z_imp = jnp.where(dist_to_zmin < dist_to_zmax, snap_lo, snap_hi)

    valid = (nr > 0)[:, None] & jnp.ones((R, n), bool)
    z_imp = jnp.where(valid, z_imp, 0.0)
    return RaySamples(
        origins=samples.origins, dirs=samples.dirs,
        z=z_imp, dt=jnp.zeros_like(z_imp), mask=valid,
        ray_fixed_dt=samples.ray_fixed_dt,
    )


def combine_uniform_samples_with_imp(samples: RaySamples, samples_imp: RaySamples,
                                     t_exit) -> RaySamples:
    """Merge two sample sets per ray, sorted by z — dense equivalent of
    ``combine_uniform_samples_with_imp`` (``VolumeRenderingGPU.cuh:950-1131``).

    dt is recomputed as min(z_next - z, fixed_dt); the last sample's dt is
    clamp(t_exit - z_last, 0, fixed_dt). Carries sdf when both inputs have it.
    """
    R = samples.nr_rays
    S = samples.max_samples + samples_imp.max_samples

    z = jnp.concatenate([samples.z, samples_imp.z], axis=-1)
    mask = jnp.concatenate([samples.mask, samples_imp.mask], axis=-1)
    z_sortable = jnp.where(mask, z, jnp.inf)
    order = jnp.argsort(z_sortable, axis=-1)
    z = jnp.take_along_axis(jnp.where(mask, z, 0.0), order, axis=-1)
    mask = jnp.take_along_axis(mask, order, axis=-1)  # prefix mask again

    carry_sdf = samples.sdf is not None and samples_imp.sdf is not None
    sdf = None
    if carry_sdf:
        sdf_cat = jnp.concatenate([samples.sdf, samples_imp.sdf], axis=-1)
        sdf = jnp.take_along_axis(sdf_cat, order, axis=-1)

    fixed_dt = samples.ray_fixed_dt[:, None]
    z_next = jnp.concatenate([z[:, 1:], z[:, -1:]], axis=-1)
    dt = jnp.minimum(z_next - z, fixed_dt)
    nr = jnp.sum(mask, axis=-1)
    last_idx = jnp.maximum(nr - 1, 0)
    is_last = (jnp.arange(S)[None, :] == last_idx[:, None]) & mask
    rem = jnp.clip(t_exit.reshape(-1, 1) - z, 0.0, fixed_dt)
    dt = jnp.where(is_last, rem, dt)
    dt = jnp.where(mask, dt, 0.0)

    return RaySamples(
        origins=samples.origins, dirs=samples.dirs, z=z, dt=dt, mask=mask,
        ray_fixed_dt=samples.ray_fixed_dt, sdf=sdf,
    )
