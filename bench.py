"""Benchmark: volumetric training throughput (rays/sec/chip) on real hardware.

Measures STEADY-STATE flagship training (reference-scale models: capacity
2^18, 24 levels), the way both frameworks actually run:

1. Abbreviated sphere-init, then a warmup stretch of real training during
   which the occupancy grid sparsifies and the dynamic ray rebalancer
   (the reference's target_nr_of_samples trick, train_permuto_sdf.py:394-397)
   settles on a ray bucket that keeps ~49k VALID samples per step.
2. A measured window of further training iterations at the settled bucket —
   wall-clock INCLUSIVE of the every-8-iters occupancy update and all host
   overheads. rays/s = rays processed / elapsed.

Baseline: the reference runs its 512-ray step in ~62 ms on the author's GPU
(train_permuto_sdf.py:429 comment) => 512/0.062 ~= 8258 rays/sec.
``vs_baseline`` = ours / reference (higher is better).
"""

import json
import os
import sys
import time

import jax

# Persistent compilation cache: the full train-step graph takes minutes to
# compile through the TPU tunnel; cache hits make repeated bench runs fast.
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import numpy as np

import jax.numpy as jnp


REFERENCE_RAYS_PER_SEC = 512.0 / 0.062  # ~8258 rays/s (62 ms for 512 rays)


REFERENCE_VALID_SAMPLES_PER_SEC = 49152.0 / 0.062  # ~793k samples/s


def main():
    quick = "--quick" in sys.argv
    steps = None
    for i, a in enumerate(sys.argv):
        if a == "--steps" and i + 1 < len(sys.argv):
            steps = int(sys.argv[i + 1])

    # fail fast instead of silently benchmarking the host CPU: this
    # environment's TPU lives behind a tunnel relay that can die
    # (observed 2026-08-17) — a CPU fallback number recorded as the TPU
    # benchmark would be worse than no number. Backend init itself can
    # HANG (not error) on a dead tunnel, so bound it with an alarm.
    # (a SIGALRM handler cannot run while the main thread is blocked
    # inside the plugin's C init — a watchdog THREAD fires regardless)
    import threading

    def _init_timeout():
        print(json.dumps({
            "metric": "rays_per_sec_per_chip", "value": 0, "unit": "rays/s",
            "vs_baseline": 0,
            "error": "TPU backend init hung >300 s (tunnel down?) — "
                     "refusing to report a fallback number",
        }), flush=True)
        os._exit(2)

    watchdog = threading.Timer(300.0, _init_timeout)
    watchdog.daemon = True
    watchdog.start()
    platform = jax.devices()[0].platform
    watchdog.cancel()
    if platform == "cpu" and "--cpu-ok" not in sys.argv:
        print(json.dumps({
            "metric": "rays_per_sec_per_chip", "value": 0, "unit": "rays/s",
            "vs_baseline": 0,
            "error": "no TPU backend visible (tunnel down?) — refusing to "
                     "report CPU throughput as the chip benchmark; pass "
                     "--cpu-ok to override",
        }))
        sys.exit(2)

    from permuto_sdf_tpu.train import train_permuto_sdf as tps
    from permuto_sdf_tpu.ops import occupancy_grid as og
    from permuto_sdf_tpu.datasets.synthetic import (bench_scene_sdf,
                                                    make_synthetic_reel)

    sphere_iters = 100 if quick else 300
    warmup_iters = 60 if quick else 1100
    measure_iters = steps or (20 if quick else 100)
    nr_windows = 1 if quick else 3

    # ``forced_variance_finish_iter`` is compressed (35000 -> 600) so the
    # warmup actually REACHES the steady-state operating point both
    # frameworks quote numbers at: with inv_s annealed (~e^8), the SDF
    # occupancy band is ~2 voxels thin, the grid is sparse (~1-2%
    # occupied), and the dynamic ray rebalancer grows the ray bucket to
    # hold the fixed ~49k VALID-sample budget. The reference's ~62 ms
    # figure is likewise a mid-training measurement on a sparsified scene
    # (train_permuto_sdf.py:429 comment). At the un-annealed early state
    # (inv_s ~ 20 => occupancy band +-0.58 => dense grid) the bucket pins
    # at 512 rays and rays/s understates steady-state throughput ~3x;
    # --quick reports that dense-grid lower bound.
    # sdf_nr_iters_for_c2f is compressed (10000 -> 400) for the same
    # reason as the variance anneal: the measured window must sit at the
    # POST-c2f steady state (every encoding level open). The c2f-front
    # level skipping (c2f_level_skip) therefore does NOT flatter this
    # number — it only accelerates the (unmeasured) early phase, exactly
    # as in a real run.
    # The r4 throughput levers are ON by default — they are the
    # recommended training profile: quality-guarded at equal iterations
    # (-1.0 dB, eval_artifacts/quality_ab_r4.json) and BETTER at equal
    # wall-clock (+4.1 dB, quality_ab_r4_timematched.json; flagship
    # on-chip run in mask_quality_run.json). --no-levers benchmarks the
    # reference-behavior step (every sample full-res, every level's
    # table updated every step).
    levers = (
        {}
        if "--no-levers" in sys.argv
        else dict(train_lod_top_k=24, train_lod_rand_extra=8,
                  table_grad_alternate=True,
                  # hit-ray compaction, driven from the measured hit
                  # fraction exactly like train() does (starts dense;
                  # tightens as the grid sparsifies) — r5 lever
                  hit_ray_frac=1.0)
    )
    cfg = tps.PermutoSDFTrainConfig(  # full reference scale
        nr_iter_sphere_fit=sphere_iters,
        sphere_init_points=30000,
        warmup_iters=100,
        forced_variance_finish_iter=60 if quick else 600,
        sdf_nr_iters_for_c2f=50 if quick else 400,
        **levers,
    )
    # bench scene: ~1.6% steady-state band occupancy at 256^3, the sample
    # load of a DTU scan (the reference's 62 ms was measured there). The
    # default sphere+torus scene settles to 0.14% occupied — an empty
    # scene whose per-valid-sample throughput says little about the step
    # (PERFORMANCE.md finding 32).
    reel = make_synthetic_reel(nr_views=4, width=100, height=100,
                               sdf_fn=bench_scene_sdf, fov_deg=45.0)
    target_nr_samples = cfg.nr_rays * (
        cfg.max_nr_samples_per_ray + 2 * cfg.nr_samples_imp_sampling
    )

    params = tps.init_params(jax.random.PRNGKey(0), cfg, reel.nr_images)
    optimizer = tps.make_optimizer(cfg)
    opt_state = optimizer.init(params)
    grid = og.make_occupancy_grid(cfg.grid)
    key = jax.random.PRNGKey(1)
    last_inv_s = jnp.asarray(jnp.exp(0.3 * 10.0), jnp.float32)

    # background AOT precompilation of predicted step graphs (VERDICT r4
    # item 2): the first train graphs compile during sphere init; ladder
    # moves compile one rung ahead of the rebalancer
    from permuto_sdf_tpu.utils.precompile import StepPrecompiler

    pre = StepPrecompiler()
    # seed the workers with the PREDICTED TERMINAL operating point as
    # well as the first graphs: the settled bench point is known up
    # front (fully-open c2f front; ray bucket near the 49k-valid-sample
    # budget; hit-frac rung near the measured DTU-occupancy hit
    # fraction), and its 2048-ray graphs are the slowest compiles
    # (40-100 s each, BENCH r5 preview iters 1026-1301). Submitting
    # them at t=0 gives the 3 workers the whole warmup to finish, so
    # the rebalancer's arrival at the terminal rungs deserializes from
    # the persistent cache instead of blocking the loop.
    act_term = tps._c2f_active_levels(10 ** 9, cfg)
    terminals = []
    for R in (1536, 2048):
        for F in ((0.5, 0.625) if cfg.hit_ray_frac is not None else (None,)):
            terminals.append(dataclasses.replace(
                cfg, nr_rays=R, hit_ray_frac=F,
                sdf_active_levels=act_term))
    # pre-gate phase runs the EXACT step (levers stripped); its first
    # graphs are what the loop needs right after sphere init — submit
    # them NOW, and stagger the terminal seeds 60 s so the workers
    # serve near-term graphs first (cold run: the terminal backlog
    # starved the first train graphs and the loop stalled 80-110 s at
    # iters 300-320)
    cfg_exact = dataclasses.replace(cfg, train_lod_top_k=None,
                                    table_grad_alternate=False)
    tps._precompile_ahead(pre, params, opt_state, grid, reel, optimizer,
                          cfg_exact, 0)
    import threading

    threading.Timer(60.0, lambda: tps._precompile_ahead(
        pre, params, opt_state, grid, reel, optimizer, cfg_exact, 0,
        extra_cfgs=tuple(terminals))).start()

    compile_events = []  # (iter, seconds) for slow (compiling) dispatches

    def one_iter(it, cfg, params, opt_state, grid, last_inv_s):
        k_step, k_grid = jax.random.split(jax.random.fold_in(key, it + 1))
        if it < cfg.nr_iter_sphere_fit:
            params, opt_state, _ = tps.sphere_init_step(
                params, opt_state, k_step, it, cfg, optimizer
            )
            return params, opt_state, grid, last_inv_s, None
        it_anneal = it - cfg.nr_iter_sphere_fit
        if it % cfg.grid_update_every == 0:
            grid = tps.occupancy_update(params, grid, k_grid,
                                        jnp.asarray(it_anneal), last_inv_s, cfg)
        # per-step static switches, exactly as train() drives them —
        # including the no-mask lever-start gate (levers exact through
        # the cos/variance anneal, nomask_bisect_r5.json; the measured
        # windows sit far past the gate either way)
        step_cfg = cfg
        if it_anneal < cfg.forced_variance_finish_iter:
            step_cfg = dataclasses.replace(
                step_cfg, train_lod_top_k=None, table_grad_alternate=False)
        if step_cfg.table_grad_alternate:
            step_cfg = dataclasses.replace(
                step_cfg, table_grad_parity=it % cfg.table_grad_period)
        params, opt_state, loss, aux = tps.train_step(
            params, opt_state, grid, reel, k_step, jnp.asarray(it), step_cfg,
            optimizer
        )
        return params, opt_state, grid, aux["inv_s"], aux

    # ---- warmup: sphere init + training until the ray bucket settles ----
    # A dense-grid lower-bound window is timed mid-warmup (grid still dense,
    # bucket pinned at 512) so BOTH operating points appear in one JSON —
    # the steady-state headline cannot silently flatter via the operating
    # point (ADVICE r2).
    it = 0
    dense_window = None
    dense_start = sphere_iters + 120  # past cfg.warmup_iters, anneal ~20% in
    t0 = time.perf_counter()
    for it in range(sphere_iters + warmup_iters):
        if it == dense_start:
            jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
            td = time.perf_counter()
            dense_rays = cfg.nr_rays
        if it == dense_start + 20 and cfg.nr_rays == dense_rays:
            # discarded if the rebalancer resized the bucket mid-window
            jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
            dense_window = (dense_rays * 20) / (time.perf_counter() - td)
        if cfg.c2f_level_skip and it >= sphere_iters:
            act = tps._c2f_active_levels(it - sphere_iters, cfg)
            if act != cfg.sdf_active_levels:
                cfg = dataclasses.replace(cfg, sdf_active_levels=act)
        t_it = time.perf_counter()
        params, opt_state, grid, last_inv_s, aux = one_iter(
            it, cfg, params, opt_state, grid, last_inv_s
        )
        dt_it = time.perf_counter() - t_it
        if dt_it > 2.0:  # async dispatch: only compiles block the host
            compile_events.append((it, round(dt_it, 1)))
        # dynamic ray rebalancing toward the fixed VALID-sample budget,
        # snapped to power-of-2 buckets (one compile per bucket)
        if aux is not None and (it % 25) == 0:
            cur = max(float(aux["nr_samples"]), 1.0)
            prev_rays = cfg.nr_rays
            want = int(cfg.nr_rays * target_nr_samples / cur)
            bucket = tps._ray_bucket(want, lo=512, hi=4096, current=cfg.nr_rays)
            if bucket != cfg.nr_rays:
                cfg = dataclasses.replace(cfg, nr_rays=bucket)
            if cfg.hit_ray_frac is not None and "nr_hit_rays" in aux:
                hf = float(aux["nr_hit_rays"]) / max(prev_rays, 1)
                frac = tps._hit_frac_bucket(hf, cfg.hit_ray_frac)
                if frac != cfg.hit_ray_frac:
                    cfg = dataclasses.replace(cfg, hit_ray_frac=frac)
            # predict for the phase the loop is IN (exact pre-gate,
            # levers post-gate), plus the lever graphs as the gate nears
            it_ann = it - cfg.nr_iter_sphere_fit
            if it_ann < cfg.forced_variance_finish_iter:
                base = dataclasses.replace(cfg, train_lod_top_k=None,
                                           table_grad_alternate=False)
                extra = ((cfg,) if cfg.forced_variance_finish_iter
                         - it_ann <= 200 else ())
            else:
                base, extra = cfg, ()
            tps._precompile_ahead(pre, params, opt_state, grid, reel,
                                  optimizer, base, it, extra_cfgs=extra)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    warm_s = time.perf_counter() - t0

    # ---- measured windows: bucket frozen, grid updates included ----
    # >=3 independent windows so the headline carries a spread instead of
    # one point estimate (VERDICT r2 item 2).
    start = sphere_iters + warmup_iters
    window_rays_s = []
    window_samples_s = []
    valid_samples_total = 0.0
    elapsed_total = 0.0
    hit_rays_log = []
    for w in range(nr_windows):
        # the grid keeps sparsifying during the measured stretch; between
        # windows, let the rebalancer track the valid-sample budget the way
        # train() does (the reference rebalances every step), then run a few
        # unmeasured settle iters so a re-jit never lands inside a window
        if w > 0 and aux is not None:
            cur = max(float(aux["nr_samples"]), 1.0)
            prev_rays = cfg.nr_rays
            want = int(cfg.nr_rays * target_nr_samples / cur)
            bucket = tps._ray_bucket(want, lo=512, hi=4096, current=cfg.nr_rays)
            changed = bucket != cfg.nr_rays
            if changed:
                cfg = dataclasses.replace(cfg, nr_rays=bucket)
            if cfg.hit_ray_frac is not None and "nr_hit_rays" in aux:
                hf = float(aux["nr_hit_rays"]) / max(prev_rays, 1)
                frac = tps._hit_frac_bucket(hf, cfg.hit_ray_frac)
                if frac != cfg.hit_ray_frac:
                    cfg = dataclasses.replace(cfg, hit_ray_frac=frac)
                    changed = True
            if changed:
                for it in range(start, start + 3):
                    params, opt_state, grid, last_inv_s, aux = one_iter(
                        it, cfg, params, opt_state, grid, last_inv_s
                    )
                jax.block_until_ready(aux["nr_samples"])
                start += 3
        nr_samples_log = []
        t0 = time.perf_counter()
        for it in range(start, start + measure_iters):
            params, opt_state, grid, last_inv_s, aux = one_iter(
                it, cfg, params, opt_state, grid, last_inv_s
            )
            # rendered = what the step actually carried through the
            # transmittance chain (== total valid unless a compaction
            # budget overflowed); fetched after the window
            nr_samples_log.append(aux.get("nr_samples_rendered",
                                          aux["nr_samples"]))
            hit_rays_log.append(aux.get("nr_hit_rays"))
        jax.block_until_ready(nr_samples_log[-1])
        elapsed = time.perf_counter() - t0
        start += measure_iters
        valid = sum(float(a) for a in nr_samples_log)
        window_rays_s.append(cfg.nr_rays * measure_iters / elapsed)
        window_samples_s.append(valid / elapsed)
        valid_samples_total += valid
        elapsed_total += elapsed

    # FLOPs/bytes of the compiled gradient graph (XLA cost analysis) ->
    # MFU and achieved-HBM lines against the MEASURED chip roofline
    # (eval_artifacts/roofline.json: 337 TF bf16 matmul, 1007 GB/s copy)
    mfu = hbm_frac = None
    try:
        k_cost = jax.random.PRNGKey(9)
        step_cfg = cfg
        if cfg.table_grad_alternate:
            step_cfg = dataclasses.replace(cfg, table_grad_parity=0)
        lowered = tps._grads_step.lower(
            params, grid, reel, k_cost, jnp.asarray(start), step_cfg)
        ca = lowered.compile().cost_analysis()
        step_s = elapsed_total / (measure_iters * nr_windows)
        if ca and ca.get("flops"):
            mfu = float(ca["flops"]) / step_s / 337e12
        if ca and ca.get("bytes accessed"):
            hbm_frac = float(ca["bytes accessed"]) / step_s / 1007e9
    except Exception as e:  # cost analysis is best-effort on this plugin
        print(f"cost_analysis unavailable: {e!r}", flush=True)

    rays_per_sec = sum(window_rays_s) / len(window_rays_s)
    samples_per_sec = sum(window_samples_s) / len(window_samples_s)
    vs_rays = rays_per_sec / REFERENCE_RAYS_PER_SEC
    vs_samples = samples_per_sec / REFERENCE_VALID_SAMPLES_PER_SEC
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        # headline = the HONEST min of the two normalizations: per-ray and
        # per-valid-sample (the reference renders 49152 valid samples in its
        # 62 ms step; our settled bucket may carry fewer samples per ray)
        "vs_baseline": round(min(vs_rays, vs_samples), 3),
        # both normalizations at top level (VERDICT r4 item 7): rays/s vs
        # the reference's 512 rays / 62 ms; valid-samples/s vs its 49152
        # valid samples / 62 ms. The headline is min() of the two so a
        # settled operating point that carries fewer valid samples per ray
        # than the reference cannot flatter the number.
        "vs_baseline_rays": round(vs_rays, 3),
        "vs_baseline_samples": round(vs_samples, 3),
        "detail": {
            "lever_profile": ("row+lod24+par" if levers else
                              "row only (--no-levers)"),
            "vs_baseline_rays": round(vs_rays, 3),
            "vs_baseline_samples": round(vs_samples, 3),
            "windows_rays_per_sec": [round(r, 1) for r in window_rays_s],
            "windows_valid_samples_per_sec": [round(s) for s in window_samples_s],
            "ms_per_iter_incl_grid_updates": round(
                elapsed_total / (measure_iters * nr_windows) * 1e3, 1),
            "settled_nr_rays": cfg.nr_rays,
            "settled_hit_ray_frac": cfg.hit_ray_frac,
            "mean_valid_samples_per_iter": round(
                valid_samples_total / (measure_iters * nr_windows)),
            "valid_samples_per_sec": round(samples_per_sec),
            # budget utilization (VERDICT r4 weak #1): hit rays carry the
            # full ~96-valid-sample budget (finding 35); the rays- vs
            # samples-normalized gap is the scene's hit fraction, not
            # under-filled rays
            "mean_hit_rays_per_iter": (
                round(float(np.mean([float(h) for h in hit_rays_log
                                     if h is not None])), 1)
                if any(h is not None for h in hit_rays_log) else None),
            "valid_samples_per_hit_ray": (
                round(valid_samples_total / (measure_iters * nr_windows)
                      / max(float(np.mean([float(h) for h in hit_rays_log
                                           if h is not None])), 1.0), 1)
                if any(h is not None for h in hit_rays_log) else None),
            "dense_grid_rays_per_sec": (
                round(dense_window, 1) if dense_window else None),
            "grid_occupancy_frac": round(float(jnp.mean(grid.occupancy)), 4),
            "warmup_s": round(warm_s, 1),
            # compile-time accounting (VERDICT r3 item 7): every dispatch
            # that blocked the host >2 s during warmup is a compile (the
            # step itself is async); cold runs pay these, warm runs hit
            # the persistent cache in .jax_cache
            "compile_events": compile_events,
            "compile_s_total": round(sum(s for _, s in compile_events), 1),
            "n_compiles": len(compile_events),
            # background AOT precompiler accounting (predicted graphs
            # compiled off the main thread into the persistent cache)
            "precompile": pre.stats(),
            # utilization of the measured chip matmul roofline: the step
            # is gather/scatter INSTANCE-bound (roofline.json), so this is
            # far below 1 by design — it quantifies how far
            "mfu_vs_measured_peak": round(mfu, 4) if mfu else None,
            # HLO cost-analysis "bytes accessed" rate. NOT an HBM-traffic
            # fraction: the cost model counts logical operand bytes
            # including on-chip reuse, so this can legitimately exceed the
            # measured 1007 GB/s copy bandwidth (it did in r4; the r4
            # "hbm_frac" label was wrong — VERDICT r4 weak #5)
            "hlo_bytes_accessed_GB_per_s": (round(hbm_frac * 1007, 1)
                                            if hbm_frac else None),
        },
    }))


if __name__ == "__main__":
    main()
