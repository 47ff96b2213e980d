"""Skipped-by-default toolchain canaries (run with ``pytest -m canary``).

Each test asserts the condition under which a load-bearing XLA:TPU
workaround can be RETIRED. On the toolchain where the workaround was
introduced the test FAILS (that is the point); after a jax / jaxlib /
libtpu update, run ``pytest tests/test_xla_canaries.py -m canary`` on the
real chip — a pass means the corresponding workaround is dead weight:

1. ``test_fused_optimizer_not_pathological`` — PERFORMANCE.md finding 5:
   an Adam update compiled into the same XLA program as the
   gather/scatter-heavy gradient graph runs ~6-80x slower than the same
   math as two programs. Workarounds to retire on pass: the two-dispatch
   ``train_step`` (train_permuto_sdf.py) and ``ManualAdam`` in place of
   optax. Standalone repro: eval_artifacts/xla_repros/fusion_slow_optimizer.py.

2. ``test_fused_lod_render_compiles`` — PERFORMANCE.md finding 20: the
   fused coarse+fine LOD eval render SIGILLs the XLA:TPU priority-fusion
   pass. Workarounds to retire on pass: the two-program split
   (``render_rays_eval_lod``) plus the failure memoization in
   ``render_image``. Standalone repro:
   eval_artifacts/xla_repros/lod_sigill_isolate.py.

3. ``test_lod_stage1_params_as_args_compiles`` — the narrower stage-1
   trigger: even the SPLIT coarse-select program SIGILLs priority fusion
   when the small SDF MLP arrives as a program PARAMETER; the identical
   graph with the MLP constant-folded compiles in ~50 s (bisection:
   eval_artifacts/xla_repros/lod_sigill_isolate{4,5,6}.py). Workaround to
   retire on pass: ``_lod_coarse_mlpconst_jit`` / ``_make_dp_lod_stage1``
   constant capture + ``_LOD_MLPCONST_CACHE`` (train_permuto_sdf.py).

These are intentionally heavy (minutes of compile each on a cold cache)
and TPU-specific: on CPU both fused forms are fine, so the tests skip
unless a TPU backend is present.
"""
import time

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.canary


def _require_tpu():
    if jax.default_backend() in ("cpu",):
        pytest.skip("canary is TPU-toolchain-specific (CPU compiles fine)")


def test_fused_optimizer_not_pathological():
    """Fused grads+Adam program within 1.5x of the split dispatch."""
    _require_tpu()
    L, C, N = 24, 2 ** 18, 200_000
    k = jax.random.PRNGKey(0)
    params = {
        "table": jax.random.uniform(k, (L, 2, C)) * 1e-2,
        "w": jax.random.normal(jax.random.fold_in(k, 1), (48, 32)) * 0.1,
        "scale": jnp.ones((1,)),
    }
    idx = jax.random.randint(jax.random.fold_in(k, 2), (L, 4, N), 0, L * C)
    bary = jax.random.uniform(jax.random.fold_in(k, 3), (L, 4, N))

    def loss_fn(p, idx, bary):
        f0 = jnp.take(p["table"][:, 0, :].reshape(-1), idx)
        f1 = jnp.take(p["table"][:, 1, :].reshape(-1), idx)
        lv = jnp.stack([jnp.sum(bary * f0, 1), jnp.sum(bary * f1, 1)], 1)
        feat = lv.transpose(2, 0, 1).reshape(N, 2 * L) * p["scale"]
        pad = jnp.concatenate([feat, feat], axis=1)[:, :48]
        return jnp.sum((pad @ p["w"]) ** 2) / N

    def adam(p, m, v, g):
        m = jax.tree.map(lambda m_, g_: 0.9 * m_ + 0.1 * g_, m, g)
        v = jax.tree.map(lambda v_, g_: 0.999 * v_ + 0.001 * g_ ** 2, v, g)
        p = jax.tree.map(lambda p_, m_, v_: p_ - 1e-3 * m_ /
                         (jnp.sqrt(v_) + 1e-8), p, m, v)
        return p, m, v

    zeros = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def fused(p, m, v, idx, bary):
        g = jax.grad(loss_fn)(p, idx, bary)
        return adam(p, m, v, g)

    grads_j = jax.jit(jax.grad(loss_fn))
    adam_j = jax.jit(adam)

    def split(p, m, v, idx, bary):
        return adam_j(p, m, v, grads_j(p, idx, bary))

    def timeit(fn):
        out = fn(params, zeros, zeros, idx, bary)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(params, zeros, zeros, idx, bary)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / 5

    ratio = timeit(fused) / timeit(split)
    assert ratio < 1.5, (
        f"fused/split = {ratio:.2f} — optimizer-fusion pathology still "
        "present; keep the two-dispatch train_step + ManualAdam")


def test_fused_lod_render_compiles():
    """The single-graph LOD eval render compiles and runs (no SIGILL)."""
    _require_tpu()
    from permuto_sdf_tpu.train import train_permuto_sdf as tps

    from permuto_sdf_tpu.ops import occupancy_grid as og

    cfg = tps.PermutoSDFTrainConfig(render_sample_budget=None)
    key = jax.random.PRNGKey(0)
    params = tps.init_params(key, cfg, nr_cams=4)
    grid = og.make_occupancy_grid(cfg.grid)
    n = 2048
    origins = jnp.stack([jnp.zeros((n,)), jnp.zeros((n,)),
                         jnp.full((n,), -2.0)], axis=-1)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))

    fused = jax.jit(
        lambda p, g, o, d: tps._eval_render_fn_lod(
            p, g, None, o, d, 9_999_999, 1.0, 0.8, cfg=cfg,
            coarse_levels=12, top_k=32))
    # On the broken toolchain this raises JaxRuntimeError (the SIGILL is
    # surfaced by the compile-helper subprocess) — i.e. the test FAILS,
    # meaning: keep the two-program split.
    out = fused(params, grid, origins, dirs)
    jax.block_until_ready(out[0])


def test_lod_stage1_params_as_args_compiles():
    """Stage-1 coarse-select compiles with the SDF MLP as a program arg."""
    _require_tpu()
    from permuto_sdf_tpu.train import train_permuto_sdf as tps
    from permuto_sdf_tpu.ops import occupancy_grid as og

    cfg = tps.PermutoSDFTrainConfig(render_sample_budget=None)
    key = jax.random.PRNGKey(0)
    params = tps.init_params(key, cfg, nr_cams=4)
    grid = og.make_occupancy_grid(cfg.grid)
    n = 2048
    origins = jnp.stack([jnp.zeros((n,)), jnp.zeros((n,)),
                         jnp.full((n,), -2.0)], axis=-1)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))

    # The pre-workaround dispatch: everything (incl. the SDF MLP) arrives
    # as a program parameter. On the broken toolchain the compile helper
    # dies with SIGILL and this raises JaxRuntimeError — the test FAILS,
    # meaning: keep the mlp-const capture. On a pass, retire
    # _lod_coarse_mlpconst_jit / _make_dp_lod_stage1 / _LOD_MLPCONST_CACHE.
    out = tps._lod_coarse_jit(params, grid, origins, dirs, 9_999_999, 1.0,
                              0.8, cfg, 12, 32)
    jax.block_until_ready(jax.tree.leaves(out)[0])
