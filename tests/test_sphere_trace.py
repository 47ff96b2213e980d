"""Tests for sphere tracing (ops/sphere_trace.py), incl. the compacted
static-shape re-binning variant (BASELINE "hard part #5")."""

import numpy as np
import jax
import jax.numpy as jnp

from permuto_sdf_tpu.ops.sphere_trace import sphere_trace, sphere_trace_compacted
from permuto_sdf_tpu.ops.ray_primitives import Sphere
from permuto_sdf_tpu.ops import occupancy_grid as og

BOUND = Sphere(0.5, (0.0, 0.0, 0.0))
RADIUS = 0.25


def _sdf(p):
    return jnp.linalg.norm(p, axis=-1) - RADIUS


def _rays(n=512):
    ang_x = jnp.linspace(-0.45, 0.45, n)
    dirs = jnp.stack([jnp.sin(ang_x), jnp.zeros(n), jnp.cos(ang_x)], -1)
    origins = jnp.tile(jnp.asarray([[0.0, 0.0, -1.2]]), (n, 1))
    return origins, dirs


def _grid_for_sphere(n=64):
    cfg = og.OccupancyGridConfig(nr_voxels_per_dim=n)
    xs = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n - 0.5
    X, Y, Z = jnp.meshgrid(xs, xs, xs, indexing="ij")
    r = jnp.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    occ = (jnp.abs(r - RADIUS) < 3.0 / n).reshape(-1)
    grid = og.OccupancyGridState(values=jnp.zeros(n ** 3), occupancy=occ)
    return cfg, grid


def test_sphere_trace_converges_to_analytic_surface():
    origins, dirs = _rays()
    pos, sdf, conv, within = sphere_trace(_sdf, origins, dirs, BOUND,
                                          nr_sphere_traces=20)
    conv = np.asarray(conv)
    assert conv.mean() > 0.3  # central rays hit
    r = np.linalg.norm(np.asarray(pos)[conv], axis=-1)
    np.testing.assert_allclose(r, RADIUS, atol=5e-4)


def test_compacted_matches_plain_trace():
    origins, dirs = _rays()
    cfg, grid = _grid_for_sphere()
    pos_a, sdf_a, conv_a, within_a = sphere_trace(
        _sdf, origins, dirs, BOUND, nr_sphere_traces=15,
        grid_cfg=cfg, grid=grid,
    )
    pos_b, sdf_b, conv_b, within_b = sphere_trace_compacted(
        _sdf, origins, dirs, BOUND, nr_rounds=5, iters_per_round=3,
        grid_cfg=cfg, grid=grid, first_bucket_fraction=1.0,
    )
    conv_a = np.asarray(conv_a); conv_b = np.asarray(conv_b)
    # the compacted tracer may NOT converge a handful of grazing rays: its
    # buckets shrink geometrically between rounds, so rays that converge
    # slower than geometrically (silhouette grazers) can lose a step or two
    # to bucket overflow (they remain near-surface, just above threshold —
    # the adaptive tracer sizes buckets from measured counts and is exact).
    # It must never converge a ray the plain tracer does not.
    assert not (conv_b & ~conv_a).any()
    disagree = (conv_a != conv_b).sum()
    assert disagree <= max(2, int(0.01 * conv_a.size)), (
        f"{disagree} rays disagree — more than grazing-ray slack")
    hit = conv_a & conv_b
    np.testing.assert_allclose(np.asarray(pos_a)[hit], np.asarray(pos_b)[hit],
                               atol=1e-5)
    r = np.linalg.norm(np.asarray(pos_b)[hit], axis=-1)
    np.testing.assert_allclose(r, RADIUS, atol=5e-4)


def test_compacted_small_bucket_degrades_gracefully():
    origins, dirs = _rays()
    cfg, grid = _grid_for_sphere()
    pos, sdf, conv, within = sphere_trace_compacted(
        _sdf, origins, dirs, BOUND, nr_rounds=5, iters_per_round=3,
        grid_cfg=cfg, grid=grid, first_bucket_fraction=0.05,
    )
    conv = np.asarray(conv)
    # some rays converge, none produce garbage positions
    assert conv.sum() > 0
    r = np.linalg.norm(np.asarray(pos)[conv], axis=-1)
    np.testing.assert_allclose(r, RADIUS, atol=5e-4)
    assert np.isfinite(np.asarray(pos)).all()


def test_compacted_jits():
    origins, dirs = _rays(256)
    cfg, grid = _grid_for_sphere(32)
    f = jax.jit(lambda o, d: sphere_trace_compacted(
        _sdf, o, d, BOUND, nr_rounds=3, iters_per_round=3,
        grid_cfg=cfg, grid=grid))
    pos, sdf, conv, within = f(origins, dirs)
    assert np.isfinite(np.asarray(pos)).all()


def test_render_rays_sphere_traced_compacted_pipeline():
    """End-to-end compacted renderer on a tiny trained-free model: shapes,
    finiteness, and zero rgb outside hits."""
    from permuto_sdf_tpu.train import train_permuto_sdf as tps
    from permuto_sdf_tpu.ops import occupancy_grid as og_mod

    cfg = tps.PermutoSDFTrainConfig(
        capacity=2 ** 10, nr_levels=4, grid_nr_voxels_per_dim=32,
        nr_samples_bg=4, max_nr_samples_per_ray=8, nr_samples_imp_sampling=4,
    )
    params = tps.init_params(jax.random.PRNGKey(0), cfg, nr_cams=2)
    n = cfg.grid_nr_voxels_per_dim
    xs = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n - 0.5
    X, Y, Z = jnp.meshgrid(xs, xs, xs, indexing="ij")
    occ = (jnp.sqrt(X ** 2 + Y ** 2 + Z ** 2) < 0.3).reshape(-1)
    grid = og_mod.OccupancyGridState(values=jnp.zeros(n ** 3), occupancy=occ)

    origins, dirs = _rays(256)
    rgb, nrm, w = tps.render_rays_sphere_traced_compacted(
        params, grid, origins, dirs, jnp.asarray(100), cfg,
        nr_rounds=3, iters_per_round=3,
    )
    assert rgb.shape == (256, 3) and w.shape == (256, 1)
    assert np.isfinite(np.asarray(rgb)).all()
    w_np = np.asarray(w)[:, 0]
    assert (np.abs(np.asarray(rgb)[w_np == 0]).sum() == 0)


# ---------------------------------------------------------------------------
# Host-adaptive tracer
# ---------------------------------------------------------------------------

def _sdf_eval_ctx(ctx, p):
    """Module-level sdf_eval (stable identity for jit static arg)."""
    return jnp.linalg.norm(p, axis=-1) - ctx["radius"]


def test_adaptive_matches_plain_trace():
    from permuto_sdf_tpu.ops.sphere_trace import sphere_trace_adaptive

    origins, dirs = _rays()
    cfg, grid = _grid_for_sphere()
    ctx = {"radius": jnp.asarray(RADIUS)}
    pos_a, sdf_a, conv_a, within_a = sphere_trace(
        _sdf, origins, dirs, BOUND, nr_sphere_traces=15,
        grid_cfg=cfg, grid=grid,
    )
    pos_b, sdf_b, conv_b, within_b = sphere_trace_adaptive(
        _sdf_eval_ctx, ctx, origins, dirs, BOUND, nr_rounds=5,
        iters_per_round=3, grid_cfg=cfg, grid=grid, min_bucket=64,
    )
    conv_a, conv_b = np.asarray(conv_a), np.asarray(conv_b)
    assert conv_b.mean() > 0.3
    # every ray converged by BOTH paths must land on the analytic surface
    both = conv_a & conv_b
    r = np.linalg.norm(np.asarray(pos_b)[both], axis=-1)
    np.testing.assert_allclose(r, RADIUS, atol=5e-4)
    # final sdf refresh covers ALL converged rays (no fraction cap)
    np.testing.assert_allclose(np.asarray(sdf_b)[conv_b], 0.0, atol=5e-4)


def test_adaptive_all_foreground_view_no_dropped_rays():
    """A view fully covered by the object — the fraction-capped variant's
    failure mode. Every ray must converge (nothing silently backgrounds)."""
    from permuto_sdf_tpu.ops.sphere_trace import sphere_trace_adaptive

    n = 256
    ang = jnp.linspace(-0.15, 0.15, n)  # narrow fov: all rays hit the sphere
    dirs = jnp.stack([jnp.sin(ang), jnp.zeros(n), jnp.cos(ang)], -1)
    origins = jnp.tile(jnp.asarray([[0.0, 0.0, -1.2]]), (n, 1))
    cfg, grid = _grid_for_sphere()
    ctx = {"radius": jnp.asarray(RADIUS)}
    pos, sdf, conv, within = sphere_trace_adaptive(
        _sdf_eval_ctx, ctx, origins, dirs, BOUND, nr_rounds=6,
        iters_per_round=3, grid_cfg=cfg, grid=grid, min_bucket=32,
    )
    conv = np.asarray(conv)
    assert conv.mean() > 0.99, f"dropped rays: {1 - conv.mean():.3f}"
    r = np.linalg.norm(np.asarray(pos)[conv], axis=-1)
    np.testing.assert_allclose(r, RADIUS, atol=5e-4)


def test_adaptive_lod_refinement():
    """March with a biased coarse sdf, refine with the true one — hits must
    land on the TRUE surface after refinement."""
    from permuto_sdf_tpu.ops.sphere_trace import sphere_trace_adaptive

    origins, dirs = _rays(256)
    cfg, grid = _grid_for_sphere()
    coarse_ctx = {"radius": jnp.asarray(RADIUS * 1.02)}  # biased proxy
    fine_ctx = {"radius": jnp.asarray(RADIUS)}
    pos, sdf, conv, within = sphere_trace_adaptive(
        _sdf_eval_ctx, coarse_ctx, origins, dirs, BOUND, nr_rounds=5,
        iters_per_round=3, grid_cfg=cfg, grid=grid, min_bucket=64,
        refine_sdf_eval=_sdf_eval_ctx, refine_ctx=fine_ctx,
        nr_refine_iters=4,
    )
    conv = np.asarray(conv)
    assert conv.mean() > 0.3
    r = np.linalg.norm(np.asarray(pos)[conv], axis=-1)
    np.testing.assert_allclose(r, RADIUS, atol=5e-4)


def test_render_image_sphere_traced_fast_pipeline():
    from permuto_sdf_tpu.train import train_permuto_sdf as tps
    from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel
    from permuto_sdf_tpu.ops import occupancy_grid as og_mod

    reel = make_synthetic_reel(nr_views=2, width=24, height=24)
    cfg = tps.PermutoSDFTrainConfig(
        capacity=2 ** 10, nr_levels=8, nr_rays=32,
        grid_nr_voxels_per_dim=16, max_nr_samples_per_ray=8,
        nr_samples_imp_sampling=4, nr_samples_bg=4,
    )
    params = tps.init_params(jax.random.PRNGKey(0), cfg, reel.nr_images)
    grid = og_mod.make_occupancy_grid(cfg.grid)
    rgb, nrm, alpha = tps.render_image_sphere_traced_fast(
        params, grid, reel.K[0], reel.tf_world_cam[0], 24, 24, 1000, cfg,
        chunk=256, lod_levels=4,
    )
    assert rgb.shape == (24, 24, 3) and np.isfinite(rgb).all()
    assert alpha.shape == (24, 24, 1) and np.isfinite(nrm).all()


def test_adaptive_jump_substeps_and_prepass_match_baseline():
    """Chained empty-space jumps (jump_substeps>1) and the jump-only
    prepass are pure accelerations: each jump is individually bounded by a
    fresh Chebyshev gather, so hit/miss classification and the converged
    surface must match the single-jump tracer."""
    from permuto_sdf_tpu.ops.sphere_trace import sphere_trace_adaptive

    origins, dirs = _rays()
    cfg, grid = _grid_for_sphere()
    ctx = {"radius": jnp.asarray(RADIUS)}
    base = sphere_trace_adaptive(
        _sdf_eval_ctx, ctx, origins, dirs, BOUND, nr_rounds=5,
        iters_per_round=3, grid_cfg=cfg, grid=grid, min_bucket=64,
    )
    fast = sphere_trace_adaptive(
        _sdf_eval_ctx, ctx, origins, dirs, BOUND, nr_rounds=5,
        iters_per_round=3, grid_cfg=cfg, grid=grid, min_bucket=64,
        jump_substeps=4, prepass_jumps=16,
    )
    conv_a, conv_b = np.asarray(base[2]), np.asarray(fast[2])
    assert conv_b.mean() >= conv_a.mean() - 1e-9  # jumps never lose hits
    both = conv_a & conv_b
    assert both.mean() > 0.3
    r = np.linalg.norm(np.asarray(fast[0])[both], axis=-1)
    np.testing.assert_allclose(r, RADIUS, atol=5e-4)
    # jumps are bounded by fresh Chebyshev gathers, so they can only change
    # WHEN a miss ray dies, never turn a clean miss into a hit: any ray the
    # baseline saw exit without converging must not be converged here
    # (exact `alive` equality is too strict — a grazing ray may exit in 15
    # iters under chained jumps but still be mid-march in the baseline)
    clean_miss = ~np.asarray(base[3]) & ~conv_a
    assert not conv_b[clean_miss].any()
