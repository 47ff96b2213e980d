"""SDF-guided two-round importance sampling.

Equivalent of ``importance_sampling_sdf_model``
(``/root/reference/permuto_sdf_py/utils/sdf_utils.py:383-423``): evaluate
the SDF at the uniform samples, convert to NeuS sectional alphas at
``inv_s = dynamic(512-ish)``, build a normalized CDF, draw 16 importance
samples, merge; repeat once more with ``inv_s_multiplier = 2`` on the
merged set for another 16. Result: 64+16+16 = 96 samples per ray in one
static dense layout (the reference compacts CSR buffers instead).

Runs under ``stop_gradient`` in the trainers, matching the reference's
``torch.no_grad`` region (``train_permuto_sdf.py:112-119``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from permuto_sdf_tpu.ops.ray_samples import RaySamples
from permuto_sdf_tpu.ops import volume_rendering as vr


def _weights_cdf(samples: RaySamples, sdf, inv_s_multiplier: float):
    alpha = vr.sdf2alpha_sectional(
        samples, sdf, dynamic_inv_s=True, inv_s_multiplier=inv_s_multiplier
    )
    alpha = jnp.clip(alpha, 0.0, 1.0)
    T, _ = vr.cumprod_alpha2transmittance(1.0 - alpha + 1e-7, samples.mask)
    weights = alpha * T
    _, w_sum_per_sample = vr.sum_over_each_ray(weights, samples.mask)
    weights = weights / jnp.clip(w_sum_per_sample, min=1e-6)
    return vr.compute_cdf(weights, samples.mask)


def importance_sampling_sdf_model(
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    samples: RaySamples,
    t_exit,
    key,
    nr_imp_samples: int = 16,
    jitter: bool = True,
    masked: bool = False,
    carry_sdf: bool = False,
) -> RaySamples:
    """sdf_fn: flat [N,3] -> [N] or [N,1] sdf. Returns merged samples with
    max_samples = samples.max_samples + 2*nr_imp_samples.

    ``masked=True`` changes the callable contract to
    ``sdf_fn(pts_flat, flat_mask)`` so the caller can evaluate only the
    valid samples (static-budget compaction — see
    train_permuto_sdf.run_net); invalid slots must report far-from-surface
    values.

    ``carry_sdf=True`` evaluates the round-2 importance samples too and
    returns the merged set WITH its proxy sdf values (the reference
    instead calls remove_sdf before the final merge,
    ``sdf_utils.py:414-417``, because its renderer re-evaluates
    everything). The train-time LOD path uses the carried values to rank
    samples per ray without any extra full-resolution evaluation."""
    k1, k2 = jax.random.split(key)
    if masked:
        eval_sdf = sdf_fn
    else:
        eval_sdf = lambda pts, _mask: sdf_fn(pts)

    # round 1: inv_s_multiplier = 1
    sdf = eval_sdf(samples.flat_positions(),
                   samples.flat_mask()).reshape(samples.mask.shape)
    samples = samples.with_sdf(sdf)
    cdf = _weights_cdf(samples, sdf, inv_s_multiplier=1.0)
    imp = vr.importance_sample(samples, cdf, nr_imp_samples, key=k1, jitter=jitter)
    sdf_imp = eval_sdf(imp.flat_positions(),
                       imp.flat_mask()).reshape(imp.mask.shape)
    imp = imp.with_sdf(sdf_imp)
    combined = vr.combine_uniform_samples_with_imp(samples, imp, t_exit)

    # round 2: inv_s_multiplier = 2 on the combined set (sdf already carried)
    cdf2 = _weights_cdf(combined, combined.sdf, inv_s_multiplier=2.0)
    imp2 = vr.importance_sample(combined, cdf2, nr_imp_samples, key=k2, jitter=jitter)
    import dataclasses

    if carry_sdf:
        sdf_imp2 = eval_sdf(imp2.flat_positions(),
                            imp2.flat_mask()).reshape(imp2.mask.shape)
        imp2 = imp2.with_sdf(sdf_imp2)
        return vr.combine_uniform_samples_with_imp(combined, imp2, t_exit)
    # reference drops the sdf before the final merge (remove_sdf) — the final
    # set is re-evaluated by the renderer anyway
    combined = dataclasses.replace(combined, sdf=None)
    imp2 = dataclasses.replace(imp2, sdf=None)
    return vr.combine_uniform_samples_with_imp(combined, imp2, t_exit)
