"""Unit tests for the permutohedral hash encoding.

Covers the SURVEY.md §4 test plan for the encoding: a scalar NumPy reference
implementation of the lattice math (written against the classic algorithm,
independently of the vectorized version), numerical gradient checks w.r.t.
points and tables, and double-backprop (gradient-of-gradient) smoke tests
that mirror the eikonal/curvature use-case.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from permuto_sdf_tpu.ops.permuto_encoding import (
    PermutoEncodingSpec,
    init_encoding_params,
    permuto_encode,
    coarse2fine_window,
    _elevation_matrix,
    _simplex_vertices_and_barycentric,
    _HASH_PRIMES,
)


# ---------------------------------------------------------------------------
# Scalar reference implementation (independent of the vectorized one).
# ---------------------------------------------------------------------------

def _ref_simplex(point, d):
    """Classic scalar permutohedral simplex lookup for one point."""
    sf = (d + 1) / np.sqrt(np.arange(1, d + 1) * (np.arange(1, d + 1) + 1.0))
    elevated = np.zeros(d + 1)
    sm = 0.0
    for i in range(d, 0, -1):
        cf = point[i - 1] * sf[i - 1]
        elevated[i] = sm - i * cf
        sm += cf
    elevated[0] = sm

    rem0 = np.zeros(d + 1)
    total = 0
    for i in range(d + 1):
        v = elevated[i] / (d + 1)
        up = np.ceil(v) * (d + 1)
        down = np.floor(v) * (d + 1)
        rem0[i] = up if (up - elevated[i] < elevated[i] - down) else down
        total += int(rem0[i])
    total //= d + 1

    rank = np.zeros(d + 1, dtype=int)
    for i in range(d):
        di = elevated[i] - rem0[i]
        for j in range(i + 1, d + 1):
            if di < elevated[j] - rem0[j]:
                rank[i] += 1
            else:
                rank[j] += 1

    rem0 = rem0.astype(int)
    for i in range(d + 1):
        rank[i] += total
        if rank[i] < 0:
            rank[i] += d + 1
            rem0[i] += d + 1
        elif rank[i] > d:
            rank[i] -= d + 1
            rem0[i] -= d + 1

    bary = np.zeros(d + 2)
    for i in range(d + 1):
        delta = (elevated[i] - rem0[i]) / (d + 1)
        bary[d - rank[i]] += delta
        bary[d + 1 - rank[i]] -= delta
    bary[0] += 1.0 + bary[d + 1]

    keys = np.zeros((d + 1, d), dtype=int)
    for r in range(d + 1):
        for i in range(d):
            keys[r, i] = rem0[i] + r
            if rank[i] > d - r:
                keys[r, i] -= d + 1
    return keys, bary[: d + 1]


def _is_ambiguous(point, d, tol=1e-3):
    """True when fp noise could legitimately flip the simplex choice
    (point near a rounding tie or a rank tie — both impls are then valid)."""
    E = _elevation_matrix(d).astype(np.float64)
    elevated = E @ point
    v = elevated / (d + 1)
    if np.any(np.abs(v - np.floor(v) - 0.5) < tol):
        return True
    rem0 = np.where(
        np.ceil(v) * (d + 1) - elevated < elevated - np.floor(v) * (d + 1),
        np.ceil(v) * (d + 1),
        np.floor(v) * (d + 1),
    )
    diff = elevated - rem0
    pair = np.abs(diff[:, None] - diff[None, :])
    return bool(np.any(pair[np.triu_indices(d + 1, 1)] < tol))


@pytest.mark.parametrize("d", [2, 3, 4])
def test_simplex_matches_scalar_reference(d):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-20, 20, size=(64, d)).astype(np.float32)
    keys, bary = _simplex_vertices_and_barycentric(jnp.asarray(pts), d)
    keys, bary = np.asarray(keys), np.asarray(bary)
    n_checked = 0
    for n in range(pts.shape[0]):
        if _is_ambiguous(pts[n].astype(np.float64), d):
            continue
        ref_keys, ref_bary = _ref_simplex(pts[n].astype(np.float64), d)
        np.testing.assert_array_equal(keys[n], ref_keys)
        np.testing.assert_allclose(bary[n], ref_bary, atol=1e-4)
        n_checked += 1
    assert n_checked > 32  # most points must be unambiguous


@pytest.mark.parametrize("d", [2, 3, 4])
def test_simplex_reconstruction_invariant(d):
    # The elevated point must equal the barycentric combination of the full
    # (d+1)-coordinate simplex vertices — holds for EVERY point, including
    # tie-broken ones.
    rng = np.random.default_rng(42)
    pts = rng.uniform(-20, 20, size=(256, d)).astype(np.float32)
    keys, bary = _simplex_vertices_and_barycentric(jnp.asarray(pts), d)
    keys, bary = np.asarray(keys), np.asarray(bary)  # [N,d+1,d], [N,d+1]
    full = np.concatenate([keys, -keys.sum(-1, keepdims=True)], axis=-1)
    recon = np.einsum("nr,nrc->nc", bary, full.astype(np.float64))
    E = _elevation_matrix(d).astype(np.float64)
    elevated = pts.astype(np.float64) @ E.T
    np.testing.assert_allclose(recon, elevated, atol=5e-3)


@pytest.mark.parametrize("d", [2, 3, 4])
def test_barycentric_partition_of_unity(d):
    rng = np.random.default_rng(1)
    pts = rng.uniform(-100, 100, size=(256, d)).astype(np.float32)
    _, bary = _simplex_vertices_and_barycentric(jnp.asarray(pts), d)
    np.testing.assert_allclose(np.asarray(bary).sum(-1), 1.0, atol=1e-3)
    assert np.asarray(bary).min() > -1e-3  # inside the simplex


def test_vertex_keys_sum_to_zero_mod_structure(d=3):
    # Full d+1 coords of each simplex vertex must sum to 0 (points live on
    # the hyperplane); we only store the first d, the last is implied.
    rng = np.random.default_rng(2)
    pts = rng.uniform(-10, 10, size=(128, d)).astype(np.float32)
    keys, _ = _simplex_vertices_and_barycentric(jnp.asarray(pts), d)
    keys = np.asarray(keys)  # [N, d+1, d]
    for r in range(d + 1):
        # remainder-r points: each coordinate is congruent to r mod (d+1)
        assert ((keys[:, r, :] - r) % (d + 1) == 0).all()


def test_encode_shapes_and_window():
    spec = PermutoEncodingSpec(pos_dim=3, capacity=2 ** 12, nr_levels=8,
                               concat_points=True, concat_points_scaling=1e-3)
    params = init_encoding_params(jax.random.PRNGKey(0), spec)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.5, maxval=0.5)
    out = permuto_encode(params, pts, spec)
    assert out.shape == (32, spec.output_dims)
    assert spec.output_dims == 8 * 2 + 3

    # zero window kills the lattice features but keeps the concat points
    out0 = permuto_encode(params, pts, spec, window=jnp.zeros(8))
    np.testing.assert_allclose(np.asarray(out0[:, :16]), 0.0)
    np.testing.assert_allclose(np.asarray(out0[:, 16:]), np.asarray(pts) * 1e-3,
                               rtol=1e-6)


def test_encode_continuity():
    # Barycentric interpolation must be continuous across simplex boundaries:
    # tiny steps in input produce tiny steps in output.
    spec = PermutoEncodingSpec(pos_dim=3, capacity=2 ** 12, nr_levels=4,
                               coarsest_scale=1.0, finest_scale=0.1,
                               concat_points=False)
    params = init_encoding_params(jax.random.PRNGKey(3), spec)
    t = jnp.linspace(-0.5, 0.5, 2001)[:, None]
    pts = jnp.concatenate([t, 0.3 * t, -0.2 * t + 0.1], axis=-1)
    out = np.asarray(permuto_encode(params, pts, spec))
    step = np.abs(np.diff(out, axis=0)).max()
    assert step < 5e-4, f"discontinuity detected: {step}"


def test_gradient_wrt_points_matches_finite_difference():
    spec = PermutoEncodingSpec(pos_dim=3, capacity=2 ** 10, nr_levels=4,
                               finest_scale=0.05, concat_points=False)
    params = init_encoding_params(jax.random.PRNGKey(4), spec)
    # scale up table values so gradients are O(1)
    params = {**params, "lattice_values": params["lattice_values"] * 1e4}

    def f(pts):
        return jnp.sum(jnp.sin(permuto_encode(params, pts, spec)))

    pts = jax.random.uniform(jax.random.PRNGKey(5), (8, 3), minval=-0.4, maxval=0.4)
    g = np.asarray(jax.grad(f)(pts))
    eps = 1e-4
    for n, i in [(0, 0), (3, 1), (7, 2)]:
        dp = np.zeros((8, 3), np.float32)
        dp[n, i] = eps
        fd = (f(pts + dp) - f(pts - dp)) / (2 * eps)
        np.testing.assert_allclose(g[n, i], fd, rtol=2e-2, atol=1e-3)


def test_gradient_wrt_table_is_scatter_of_barycentric():
    spec = PermutoEncodingSpec(pos_dim=2, capacity=2 ** 8, nr_levels=1,
                               coarsest_scale=0.7, concat_points=False)
    params = init_encoding_params(jax.random.PRNGKey(6), spec)
    pts = jnp.asarray([[0.13, -0.27]])

    def f(table):
        return jnp.sum(permuto_encode({**params, "lattice_values": table}, pts, spec))

    g = np.asarray(jax.grad(f)(params["lattice_values"]))  # [1, C, F]
    # gradient total mass per feature channel = sum of barycentric = 1
    np.testing.assert_allclose(g.sum(), spec.nr_feat_per_level, atol=1e-4)
    assert (g != 0).sum() <= 3 * spec.nr_feat_per_level  # only d+1 vertices touched


def test_double_backprop_eikonal_style():
    # d(loss)/d(table) where loss depends on d(sdf)/d(points): the exact
    # pattern of the eikonal loss (reference models.py:239-251).
    spec = PermutoEncodingSpec(pos_dim=3, capacity=2 ** 10, nr_levels=4,
                               finest_scale=0.05, concat_points=False)
    params = init_encoding_params(jax.random.PRNGKey(7), spec)
    pts = jax.random.uniform(jax.random.PRNGKey(8), (16, 3), minval=-0.4, maxval=0.4)
    w = jax.random.normal(jax.random.PRNGKey(9), (spec.output_dims, 1)) * 0.1

    def sdf(table, p):
        feats = permuto_encode({**params, "lattice_values": table}, p, spec)
        return jnp.sum(feats @ w)

    def eikonal(table):
        grads = jax.grad(sdf, argnums=1)(table, pts)
        return jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)

    g = jax.grad(eikonal)(params["lattice_values"])
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_coarse2fine_window():
    w0 = np.asarray(coarse2fine_window(0.0, 10))
    w1 = np.asarray(coarse2fine_window(1.0, 10))
    wh = np.asarray(coarse2fine_window(0.5, 10))
    np.testing.assert_allclose(w1, 1.0)
    assert w0.max() == 0.0
    assert wh[:4].min() > 0.99 and wh[6:].max() < 0.01 or wh[5] < 1.0
    # monotone in t for every level
    for lvl in range(10):
        vals = [float(coarse2fine_window(t, 10)[lvl]) for t in np.linspace(0, 1, 7)]
        assert all(b >= a - 1e-7 for a, b in zip(vals, vals[1:]))


def test_jit_and_vmap_compose():
    spec = PermutoEncodingSpec(pos_dim=3, capacity=2 ** 10, nr_levels=4)
    params = init_encoding_params(jax.random.PRNGKey(10), spec)
    pts = jax.random.uniform(jax.random.PRNGKey(11), (4, 8, 3))
    f = jax.jit(lambda p: permuto_encode(params, p, spec))
    batched = jax.vmap(f)(pts)
    assert batched.shape == (4, 8, spec.output_dims)
    single = f(pts[0])
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single),
                               rtol=1e-5, atol=1e-6)


def test_max_levels_matches_zeroed_window():
    """Truncated-level proxy == full encode with a window that zeroes the
    fine levels (the gathers for those levels are simply never issued)."""
    spec = PermutoEncodingSpec(pos_dim=3, capacity=2 ** 10, nr_levels=8)
    params = init_encoding_params(jax.random.PRNGKey(3), spec)
    pts = jax.random.uniform(jax.random.PRNGKey(4), (64, 3), minval=-0.5, maxval=0.5)
    K = 5
    win = jnp.ones(spec.nr_levels).at[K:].set(0.0)
    full = permuto_encode(params, pts, spec, window=win)
    trunc = permuto_encode(params, pts, spec, max_levels=K)
    np.testing.assert_allclose(np.asarray(trunc), np.asarray(full),
                               rtol=1e-6, atol=1e-7)
    # shape is unchanged (zero-filled), and it composes with a window
    assert trunc.shape == (64, spec.output_dims)
    win2 = coarse2fine_window(0.7, spec.nr_levels)
    a = permuto_encode(params, pts, spec, window=win2, max_levels=K)
    b = permuto_encode(params, pts, spec, window=win2 * win)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_max_levels_gradients_flow_only_to_active_levels():
    spec = PermutoEncodingSpec(pos_dim=3, capacity=2 ** 9, nr_levels=6)
    params = init_encoding_params(jax.random.PRNGKey(5), spec)
    pts = jax.random.uniform(jax.random.PRNGKey(6), (32, 3), minval=-0.5, maxval=0.5)

    def loss(table):
        p = {**params, "lattice_values": table}
        return jnp.sum(permuto_encode(p, pts, spec, max_levels=3) ** 2)

    g = np.asarray(jax.grad(loss)(params["lattice_values"]))
    assert np.abs(g[:3]).sum() > 0
    np.testing.assert_allclose(g[3:], 0.0)


# ---------------------------------------------------------------------------
# bf16-pair-packed gather path (packed_bf16=True): value / gradient /
# double-backprop equivalence with the exact per-feature-gather path.
# ---------------------------------------------------------------------------

def _packed_and_exact_specs(d=3):
    kw = dict(pos_dim=d, capacity=2 ** 12, nr_levels=6, nr_feat_per_level=2,
              concat_points=True, concat_points_scaling=1.0)
    return (PermutoEncodingSpec(packed_bf16=True, **kw),
            PermutoEncodingSpec(packed_bf16=False, **kw))


def test_packed_bf16_forward_matches_exact_within_quantization():
    spec_p, spec_e = _packed_and_exact_specs()
    params = init_encoding_params(jax.random.PRNGKey(0), spec_e)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (257, 3), minval=-0.5,
                             maxval=0.5)
    out_p = permuto_encode(params, pts, spec_p)
    out_e = permuto_encode(params, pts, spec_e)
    # tables are init'd in [-1e-4, 1e-4]; bf16 relative error is 2^-9
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_e),
                               rtol=0, atol=1e-6)
    # and with a scaled-up table (training-scale magnitudes)
    params_big = {**params,
                  "lattice_values": params["lattice_values"] * 1e4}
    out_p = permuto_encode(params_big, pts, spec_p)
    out_e = permuto_encode(params_big, pts, spec_e)
    rel = np.max(np.abs(np.asarray(out_p - out_e))) / (
        np.max(np.abs(np.asarray(out_e))) + 1e-12)
    assert rel < 4e-3, f"bf16 rounding error too large: {rel}"


def test_packed_bf16_table_gradient_is_exact_straight_through():
    """The custom VJP scatters f32 cotangents straight into the master
    table — gradients must match the exact path EXACTLY (the linear
    model's gradient does not depend on the quantized values)."""
    spec_p, spec_e = _packed_and_exact_specs()
    params = init_encoding_params(jax.random.PRNGKey(0), spec_e)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.5,
                             maxval=0.5)
    cot = jax.random.normal(jax.random.PRNGKey(2),
                            (64, spec_e.output_dims))

    def loss(p, spec):
        return jnp.sum(permuto_encode(p, pts, spec) * cot)

    g_p = jax.grad(loss)(params, spec_p)["lattice_values"]
    g_e = jax.grad(loss)(params, spec_e)["lattice_values"]
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_e),
                               rtol=1e-6, atol=1e-12)


def test_packed_bf16_gradient_wrt_points_within_quantization():
    spec_p, spec_e = _packed_and_exact_specs()
    params = init_encoding_params(jax.random.PRNGKey(0), spec_e)
    params = {**params, "lattice_values": params["lattice_values"] * 1e4}
    pts = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.4,
                             maxval=0.4)

    def f(p_pts, spec):
        return jnp.sum(jnp.sin(permuto_encode(params, p_pts, spec)))

    g_p = jax.grad(f)(pts, spec_p)
    g_e = jax.grad(f)(pts, spec_e)
    # d/dpoints flows through barycentric weights x (quantized) features
    rel = np.max(np.abs(np.asarray(g_p - g_e))) / (
        np.max(np.abs(np.asarray(g_e))) + 1e-12)
    assert rel < 1e-2, rel


def test_packed_bf16_double_backprop_eikonal_style():
    """grad-wrt-table of an eikonal-style function of the spatial gradient
    must flow through the packed gather (reverse-over-reverse)."""
    spec_p, spec_e = _packed_and_exact_specs()
    params = init_encoding_params(jax.random.PRNGKey(0), spec_e)
    params = {**params, "lattice_values": params["lattice_values"] * 1e4}
    pts = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.4,
                             maxval=0.4)

    def eikonal(p, spec):
        def field(x):
            return jnp.sum(permuto_encode(p, x, spec), axis=-1)

        g = jax.vjp(field, pts)[1](jnp.ones(pts.shape[0]))[0]
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    gt_p = jax.grad(eikonal)(params, spec_p)["lattice_values"]
    gt_e = jax.grad(eikonal)(params, spec_e)["lattice_values"]
    assert np.any(np.asarray(gt_p) != 0.0), "no gradient flowed to the table"
    rel = np.max(np.abs(np.asarray(gt_p - gt_e))) / (
        np.max(np.abs(np.asarray(gt_e))) + 1e-12)
    assert rel < 1e-2, rel


def test_packed_bf16_jit_composes():
    spec_p, _ = _packed_and_exact_specs()
    params = init_encoding_params(jax.random.PRNGKey(0), spec_p)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))

    @jax.jit
    def f(p, x):
        return permuto_encode(p, x, spec_p)

    out = f(params, pts)
    assert out.shape == (128, spec_p.output_dims)
    assert np.all(np.isfinite(np.asarray(out)))


def test_shift_per_level_is_frozen():
    """The per-level random shifts are fixed buffers in the reference
    (decorrelation noise, never trained); gradients must not flow to them."""
    spec = PermutoEncodingSpec(pos_dim=3, capacity=2 ** 10, nr_levels=4)
    params = init_encoding_params(jax.random.PRNGKey(0), spec)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3)) - 0.5

    g = jax.grad(lambda p: permuto_encode(p, pts, spec).sum())(params)
    assert np.all(np.asarray(g["shift_per_level"]) == 0.0)
    assert np.any(np.asarray(g["lattice_values"]) != 0.0)


def test_sorted_scatter_backward_matches_default():
    """`sorted_scatter=True` (one explicit multi-payload sort feeding two
    indices_are_sorted segment-sums in the VJP, finding 18) must be a pure
    performance variant: forward values identical, table gradients equal
    up to f32 summation-order noise, and double backprop intact."""
    kw = dict(pos_dim=3, capacity=2 ** 12, nr_levels=6, nr_feat_per_level=2,
              concat_points=True, concat_points_scaling=1.0,
              packed_bf16=True)
    spec_d = PermutoEncodingSpec(sorted_scatter=False, **kw)
    spec_s = PermutoEncodingSpec(sorted_scatter=True, **kw)
    params = init_encoding_params(jax.random.PRNGKey(0), spec_d)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (513, 3), minval=-0.5,
                             maxval=0.5)
    np.testing.assert_array_equal(
        np.asarray(permuto_encode(params, pts, spec_d)),
        np.asarray(permuto_encode(params, pts, spec_s)))

    cot = jax.random.normal(jax.random.PRNGKey(2), (513, spec_d.output_dims))

    def loss(p, spec):
        return jnp.sum(permuto_encode(p, pts, spec) * cot)

    g_d = jax.grad(loss)(params, spec_d)["lattice_values"]
    g_s = jax.grad(loss)(params, spec_s)["lattice_values"]
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                               rtol=1e-5, atol=1e-10)

    # double backprop (eikonal-style): grad wrt points of a grad-norm loss
    def eik(p, spec):
        def f(x):
            return jnp.sum(permuto_encode(p, x[None], spec))
        g = jax.vmap(jax.grad(f))(pts)
        return jnp.sum(g ** 2)

    gg_d = jax.grad(eik)(params, spec_d)["lattice_values"]
    gg_s = jax.grad(eik)(params, spec_s)["lattice_values"]
    np.testing.assert_allclose(np.asarray(gg_s), np.asarray(gg_d),
                               rtol=1e-4, atol=1e-8)


@pytest.mark.quick
@pytest.mark.parametrize("packed", [False, True])
def test_grad_level_parity_values_and_gradients(packed):
    """Alternating-level table gradients (grad_level_parity): forward
    values are IDENTICAL to the default; table gradients match the default
    at active levels and are exactly zero at frozen levels; gradients wrt
    points are unchanged (bary flows through both halves)."""
    import dataclasses as dc
    from permuto_sdf_tpu.ops.permuto_encoding import (
        PermutoEncodingSpec, init_encoding_params, permuto_encode)

    spec = PermutoEncodingSpec(pos_dim=3, capacity=256, nr_levels=5,
                               packed_bf16=packed)
    params = init_encoding_params(jax.random.PRNGKey(0), spec)
    params["lattice_values"] = params["lattice_values"] * 1e3  # non-trivial
    pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.4,
                             maxval=0.4)
    cot = jax.random.normal(jax.random.PRNGKey(2),
                            (64, spec.output_dims))

    def loss(p, s):
        return jnp.sum(permuto_encode(p, pts, s) * cot)

    for parity in (0, 1):
        spec_p = dc.replace(spec, grad_level_parity=parity)
        # forward identical
        np.testing.assert_allclose(
            np.asarray(permuto_encode(params, pts, spec_p)),
            np.asarray(permuto_encode(params, pts, spec)), rtol=0, atol=0)
        g_full = jax.grad(loss)(params, spec)["lattice_values"]
        g_p = jax.grad(loss)(params, spec_p)["lattice_values"]
        for lvl in range(spec.nr_levels):
            if lvl % 2 == parity:
                np.testing.assert_allclose(np.asarray(g_p[lvl]),
                                           np.asarray(g_full[lvl]),
                                           rtol=1e-6, atol=1e-9)
            else:
                assert float(jnp.abs(g_p[lvl]).max()) == 0.0
        # point gradients unchanged (all levels' values contribute)
        gp_full = jax.grad(lambda x: jnp.sum(
            permuto_encode(params, x, spec) * cot))(pts)
        gp_p = jax.grad(lambda x: jnp.sum(
            permuto_encode(params, x, spec_p) * cot))(pts)
        np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gp_full),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.quick
def test_c2f_active_levels_front():
    """_c2f_active_levels never clips a level whose window weight is
    nonzero, and sdf_apply with active_levels equals the full model while
    the skipped levels' window is 0."""
    from permuto_sdf_tpu.train.train_permuto_sdf import (
        PermutoSDFTrainConfig, _c2f_active_levels)
    from permuto_sdf_tpu.models.fields import (
        SDFConfig, init_sdf, sdf_apply, coarse2fine_window, _c2f_t)
    import dataclasses as dc

    cfg = PermutoSDFTrainConfig(capacity=2 ** 10, nr_levels=8,
                                sdf_nr_iters_for_c2f=100)
    for it in [0, 10, 25, 50, 75, 99, 100, 500]:
        act = _c2f_active_levels(it, cfg)
        w = np.asarray(coarse2fine_window(_c2f_t(it, 100), 8))
        nonzero = int((w > 0).sum())
        if act is not None:
            assert act >= nonzero, (it, act, nonzero)
            assert act % 4 == 0 or act == 8

    sdf_cfg = SDFConfig(capacity=2 ** 10, nr_levels=8, nr_iters_for_c2f=100)
    params = init_sdf(jax.random.PRNGKey(0), sdf_cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.4,
                             maxval=0.4)
    it = 10  # window open for ~first 3 levels; act quantizes to 4
    act = _c2f_active_levels(it, dc.replace(cfg, nr_levels=8))
    full = sdf_apply(params, pts, it, sdf_cfg)[0]
    skip = sdf_apply(params, pts, it,
                     dc.replace(sdf_cfg, active_levels=act))[0]
    np.testing.assert_allclose(np.asarray(skip), np.asarray(full),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.quick
def test_row2_gather_matches_flat_exactly():
    """row_gather=True is a pure lowering change: forward values, table
    gradients and point gradients are EXACT f32 matches of the two-flat
    path (unlike packed_bf16, which rounds)."""
    import dataclasses as dc
    from permuto_sdf_tpu.ops.permuto_encoding import (
        PermutoEncodingSpec, init_encoding_params, permuto_encode)

    spec = PermutoEncodingSpec(pos_dim=3, capacity=512, nr_levels=6)
    spec_r = dc.replace(spec, row_gather=True)
    params = init_encoding_params(jax.random.PRNGKey(0), spec)
    params["lattice_values"] = params["lattice_values"] * 1e3
    pts = jax.random.uniform(jax.random.PRNGKey(1), (128, 3), minval=-0.4,
                             maxval=0.4)
    cot = jax.random.normal(jax.random.PRNGKey(2), (128, spec.output_dims))

    np.testing.assert_array_equal(
        np.asarray(permuto_encode(params, pts, spec_r)),
        np.asarray(permuto_encode(params, pts, spec)))

    def loss(p, s):
        return jnp.sum(permuto_encode(p, pts, s) * cot)

    g = jax.grad(loss)(params, spec)["lattice_values"]
    g_r = jax.grad(loss)(params, spec_r)["lattice_values"]
    np.testing.assert_allclose(np.asarray(g_r), np.asarray(g), rtol=1e-6,
                               atol=1e-9)

    gp = jax.grad(lambda x: jnp.sum(permuto_encode(params, x, spec) * cot))(pts)
    gp_r = jax.grad(lambda x: jnp.sum(permuto_encode(params, x, spec_r) * cot))(pts)
    np.testing.assert_allclose(np.asarray(gp_r), np.asarray(gp), rtol=1e-6,
                               atol=1e-8)

    # double backprop (the eikonal/curvature pattern) composes
    def eik(p, s):
        def f(x):
            return jnp.sum(permuto_encode(p, x[None], s))
        gg = jax.vmap(jax.grad(f))(pts)
        return jnp.sum(gg ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(eik)(params, spec_r)["lattice_values"]),
        np.asarray(jax.grad(eik)(params, spec)["lattice_values"]),
        rtol=1e-5, atol=1e-8)


@pytest.mark.quick
@pytest.mark.parametrize("period", [3, 4])
def test_grad_level_period_generalization(period):
    """grad_level_period > 2: forward identical; table grads match the
    default exactly on levels == parity (mod period) and are zero
    elsewhere; cycling parity over a full period covers every level."""
    import dataclasses as dc
    from permuto_sdf_tpu.ops.permuto_encoding import (
        PermutoEncodingSpec, init_encoding_params, permuto_encode)

    spec = PermutoEncodingSpec(pos_dim=3, capacity=256, nr_levels=7,
                               row_gather=True)
    params = init_encoding_params(jax.random.PRNGKey(0), spec)
    params["lattice_values"] = params["lattice_values"] * 1e3
    pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.4,
                             maxval=0.4)
    cot = jax.random.normal(jax.random.PRNGKey(2), (64, spec.output_dims))

    def loss(p, s):
        return jnp.sum(permuto_encode(p, pts, s) * cot)

    g_full = jax.grad(loss)(params, spec)["lattice_values"]
    covered = set()
    for parity in range(period):
        spec_p = dc.replace(spec, grad_level_parity=parity,
                            grad_level_period=period)
        np.testing.assert_allclose(
            np.asarray(permuto_encode(params, pts, spec_p)),
            np.asarray(permuto_encode(params, pts, spec)), rtol=0, atol=0)
        g_p = jax.grad(loss)(params, spec_p)["lattice_values"]
        for lvl in range(spec.nr_levels):
            if lvl % period == parity:
                covered.add(lvl)
                np.testing.assert_allclose(np.asarray(g_p[lvl]),
                                           np.asarray(g_full[lvl]),
                                           rtol=1e-6, atol=1e-9)
            else:
                assert float(jnp.abs(g_p[lvl]).max()) == 0.0
    assert covered == set(range(spec.nr_levels))
