"""Train-step floor model (r5): decompose the shipped step into isolated
sub-graphs and compare against the v5e issue-rate floor.

Mirrors eval_artifacts/st_floor_model_r5.py for the TRAIN step (VERDICT
r4 item 1's closure clause: "vs_baseline >= 1 or a measured hardware
floor proves v5e can't"). Protocol:

1. warm up to the bench operating point (finding-32 scene, 1500 iters,
   ~2.6% grid occupancy), shipping lever profile (lod24+8, period-2
   alternating table grads, early hit-ray compaction);
2. time the FULL step (grads+update dispatch pair, parity-averaged) at
   the settled 2048-ray bucket;
3. time each stage ISOLATED under jit at the step's true shapes:
     sampler   - _create_fg_samples (uniform + occupancy probe +
                 importance + early compaction; stop-grad)
     fg_core   - sdf_with_gradient + rgb_apply + eikonal on the
                 compacted LOD point set [hitB*(K+E)], value_and_grad
                 wrt {sdf, rgb} (the double-backprop encode/VJP core)
     bg_core   - nerf_hash_apply + NeRF weights + integrate on
                 [R*nr_samples_bg] 4D points, value_and_grad wrt bg
     offsurface- 1024-point sdf_apply + grad (tiny)
     update    - optimizer update pair
   The residual (full - sum) is the NeuS chain + losses + per-ray
   scatters + orchestration that has no isolated measurement.
4. analytic issue-rate floor for the encode/VJP cores from the measured
   per-instance costs (roofline2/3: row-2 gather 4.36 ns, two-flat
   scatter 10.07 ns per instance = 20.13 ns per vertex-row):
     fg sdf : pts*L*4 gather rows fwd, x2 for the eikonal
              double-backprop re-gather, + pts*(L/period)*4 scatter rows
     fg rgb : pts*L*4 gather rows + pts*(L/period)*4 scatter rows
     bg     : ptsb*L*5 gather rows (4D simplex = 5 vertices) +
              ptsb*(L/period... bg tables do not alternate: L)*5 scatter
   This is the floor of the table traffic alone — MLPs, chain math and
   samplers are on top, so actual/floor > 1 always; the question is by
   how much.

Writes eval_artifacts/step_floor_model_r5.json (PP_SMOKE -> *_smoke).
Reference bar for context: 62 ms / 49152 valid samples
(/root/reference/permuto_sdf_py/train_permuto_sdf.py:429,104).
"""
import sys, os, time, json, dataclasses
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets.synthetic import (bench_scene_sdf,
                                                make_synthetic_reel)

OUT = "/root/repo/eval_artifacts"
SMOKE = bool(os.environ.get("PP_SMOKE"))
OUT_JSON = os.path.join(
    OUT, "step_floor_model_r5_smoke.json" if SMOKE
    else "step_floor_model_r5.json")

NR_RAYS = 128 if SMOKE else 2048
levers = dict(train_lod_top_k=24, train_lod_rand_extra=8,
              table_grad_alternate=True, table_grad_period=2,
              hit_ray_frac=1.0, hit_ray_compact_early=True)
small = {}
if SMOKE:
    small = dict(capacity=2 ** 12, nr_levels=8, nr_rays=128,
                 render_sample_budget=4096, curvature_sample_budget=512,
                 grid_nr_random_samples=4096, grid_update_max_levels=6,
                 train_lod_top_k=8, sphere_init_points=512)

NWARM = 60 if SMOKE else 1500
cfg = tps.PermutoSDFTrainConfig(
    nr_iter_sphere_fit=20 if SMOKE else 300,
    forced_variance_finish_iter=30 if SMOKE else 600,
    sdf_nr_iters_for_c2f=20 if SMOKE else 400,
    iter_finish_training=NWARM,
    warmup_iters=20 if SMOKE else 100,
    **{**levers, **small},
)
reel = make_synthetic_reel(nr_views=4, width=100, height=100,
                           sdf_fn=bench_scene_sdf, fov_deg=45.0)

t0 = time.perf_counter()
params, grid, _ = tps.train(reel, cfg, nr_iters=NWARM, log_every=200)
occ = float(jnp.mean(grid.occupancy))
print(f"warmup {time.perf_counter()-t0:.0f}s, occ {occ:.4f}", flush=True)

optimizer = tps.make_optimizer(cfg)
opt_state = optimizer.init(params)
key = jax.random.PRNGKey(2)
it = jnp.asarray(NWARM * 4)  # past every anneal
it_anneal = it - cfg.nr_iter_sphere_fit
cfg = dataclasses.replace(cfg, nr_rays=NR_RAYS)


def timeit(fn, n=10, reps=3):
    o = fn(); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


# --- settle the hit fraction from a measured step, like train() does ---
probe = dataclasses.replace(cfg, table_grad_parity=0)
_, aux, _ = tps._grads_step(params, grid, reel, key, it, probe)
hit = float(aux["nr_hit_rays"])
frac = tps._hit_frac_bucket(hit / NR_RAYS, 1.0)
cfg = dataclasses.replace(cfg, hit_ray_frac=frac)
hitB = tps._hit_ray_budget(NR_RAYS, frac)
print(f"hit rays {hit:.0f}/{NR_RAYS} -> frac {frac} bucket {hitB}",
      flush=True)

# --- full step, parity-averaged -----------------------------------------
full_ms = []
for parity in range(cfg.table_grad_period):
    cp = dataclasses.replace(cfg, table_grad_parity=parity)

    def one(cp=cp):
        _, aux, grads = tps._grads_step(params, grid, reel, key, it, cp)
        p2, o2 = tps._update_step(params, opt_state, grads, it, cp,
                                  optimizer)
        return aux["nr_samples"], p2
    full_ms.append(timeit(one))
full = sum(full_ms) / len(full_ms)
valid_samples = float(aux["nr_samples"])

# --- stage shapes --------------------------------------------------------
S_lod = min(cfg.train_lod_top_k, cfg.max_nr_samples_per_ray
            + 2 * cfg.nr_samples_imp_sampling) + cfg.train_lod_rand_extra
PTS = hitB * S_lod
Sb = cfg.nr_samples_bg
PTSB = NR_RAYS * Sb
L = cfg.nr_levels
print(f"fg pts {PTS} ({hitB}x{S_lod}), bg pts {PTSB}, L {L}", flush=True)

# --- sampler isolated ----------------------------------------------------
origins, dirs, gt_rgb, gt_mask, img_idx = tps.random_rays_from_reel(
    reel, jax.random.PRNGKey(3), NR_RAYS, apply_mask=cfg.with_mask)
_, t_entry, _, t_exit, does_intersect = tps.BOUND.ray_intersection(
    origins, dirs)


def _sampler(params, grid, k):
    return tps._create_fg_samples(params, grid, k, origins, dirs, t_entry,
                                  t_exit, it_anneal, cfg, True)


sampler_jit = jax.jit(_sampler)
t_sampler = timeit(lambda: sampler_jit(params, grid, key))
samples, ray_idx, ray_valid, pre = sampler_jit(params, grid, key)

# --- fg core isolated (parity-averaged) ---------------------------------
# point set: the sampler's own positions, first S_lod slots of each
# kept ray (content realism for gather locality; shapes are exact)
pos_c = np.asarray(samples.flat_positions()).reshape(
    samples.mask.shape[0], -1, 3)[:hitB, :S_lod].reshape(-1, 3)
dirs_c = np.asarray(samples.flat_dirs()).reshape(
    samples.mask.shape[0], -1, 3)[:hitB, :S_lod].reshape(-1, 3)
pos_c = jnp.asarray(pos_c); dirs_c = jnp.asarray(dirs_c)

fg_ms = []
for parity in range(cfg.table_grad_period):
    cp = dataclasses.replace(cfg, table_grad_parity=parity)
    sdf_cfg, rgb_cfg = cp.sdf_model, cp.rgb_model

    @jax.jit
    def fg_loss(p_sub):
        sdf_c, grads_c, geom_c = tps.sdf_with_gradient(
            p_sub["sdf"], pos_c, it_anneal, sdf_cfg)
        rgb_c = tps.rgb_apply(p_sub["rgb"], pos_c, dirs_c, grads_c, geom_c,
                              it_anneal, rgb_cfg)
        gnorm = jnp.linalg.norm(grads_c, axis=-1)
        return jnp.mean(jnp.abs(rgb_c)) + jnp.mean((gnorm - 1.0) ** 2)

    fg_grad = jax.jit(jax.value_and_grad(fg_loss))
    p_sub = {"sdf": params["sdf"], "rgb": params["rgb"]}
    fg_ms.append(timeit(lambda: fg_grad(p_sub)))
t_fg = sum(fg_ms) / len(fg_ms)

# --- bg core isolated ----------------------------------------------------
t_bg = 0.0
if not cfg.with_mask:
    bg_samples = tps.compute_samples_bg(
        origins, dirs, t_exit, cfg.nr_samples_bg, tps.BOUND.radius,
        tps.BOUND.center, key=key, jitter=True)
    bg_samples = jax.tree_util.tree_map(jax.lax.stop_gradient, bg_samples)
    bg_cfg = cfg.bg_model

    @jax.jit
    def bg_loss(p_bg):
        rgb_bg, dens_bg = tps.nerf_hash_apply(
            p_bg, bg_samples.pos_4d.reshape(-1, 4), bg_samples.flat_dirs(),
            it_anneal, bg_cfg)
        w_bg, _, _ = tps.vr.nerf_compute_weights(bg_samples, dens_bg)
        Rb, Sb_ = bg_samples.mask.shape
        out = tps.vr.integrate_with_weights(
            rgb_bg.reshape(Rb, Sb_, 3), w_bg, bg_samples.mask)
        return jnp.mean(jnp.abs(out))

    bg_grad = jax.jit(jax.value_and_grad(bg_loss))
    t_bg = timeit(lambda: bg_grad(params["bg"]))

# --- offsurface isolated -------------------------------------------------
off_pts = tps.BOUND.rand_points_inside(jax.random.PRNGKey(5), 1024)
sdf_cfg0 = dataclasses.replace(cfg, table_grad_parity=0).sdf_model


@jax.jit
def off_loss(p_sdf):
    sdf_rand, _ = tps.sdf_apply(p_sdf, off_pts, it_anneal, sdf_cfg0)
    return jnp.mean(jnp.exp(-1e2 * jnp.abs(sdf_rand)))


off_grad = jax.jit(jax.value_and_grad(off_loss))
t_off = timeit(lambda: off_grad(params["sdf"]))

# --- optimizer update isolated ------------------------------------------
cp0 = dataclasses.replace(cfg, table_grad_parity=0)
_, _, grads0 = tps._grads_step(params, grid, reel, key, it, cp0)
t_upd = timeit(lambda: tps._update_step(params, opt_state, grads0, it, cp0,
                                        optimizer))

# --- occupancy update (amortized /8), reported separately ---------------
inv_s = tps.vr.variance_inv_s(params["variance"], None)
t_occ = timeit(lambda: tps.occupancy_update(params, grid, key, it_anneal,
                                            inv_s, cfg))

# --- analytic issue-rate floor ------------------------------------------
NS_GATHER = 4.36e-6   # ms per row-2 gather instance (roofline2/3)
NS_SCATTER = 10.07e-6  # ms per two-flat scatter instance (= per vertex-row
                       # pair half; 20.13 ns per vertex-row total)
per = cfg.table_grad_period
fg_gather_rows = PTS * L * 4 * (2 + 1)   # sdf fwd + double-bp re-gather + rgb
fg_scatter_rows = PTS * (L / per) * 4 * 2  # sdf + rgb tables, alternating
bg_gather_rows = PTSB * L * 5
bg_scatter_rows = PTSB * L * 5
floor_fg = fg_gather_rows * NS_GATHER + fg_scatter_rows * 2 * NS_SCATTER
floor_bg = bg_gather_rows * NS_GATHER + bg_scatter_rows * 2 * NS_SCATTER

parts = {"sampler": t_sampler, "fg_core": t_fg, "bg_core": t_bg,
         "offsurface": t_off, "update": t_upd}
t_sum = sum(parts.values())
out = {
    "smoke": SMOKE, "levers": levers, "small": small,
    "warmup_iters": NWARM, "grid_occupancy_frac": round(occ, 4),
    "nr_rays": NR_RAYS, "hit_frac_bucket": frac, "hit_bucket": hitB,
    "fg_pts": PTS, "bg_pts": PTSB, "valid_samples_per_step": valid_samples,
    "full_step_ms": round(full, 1),
    "full_step_ms_per_parity": [round(m, 1) for m in full_ms],
    "isolated_ms": {k: round(v, 1) for k, v in parts.items()},
    "isolated_sum_ms": round(t_sum, 1),
    "residual_ms": round(full - t_sum, 1),
    "occupancy_update_ms_raw": round(t_occ, 1),
    "occupancy_update_ms_amortized": round(t_occ / 8, 2),
    "issue_rate_floor_ms": {"fg_core": round(floor_fg, 1),
                            "bg_core": round(floor_bg, 1)},
    "fg_core_over_floor": round(t_fg / max(floor_fg, 1e-9), 2),
    "bg_core_over_floor": round(t_bg / max(floor_bg, 1e-9), 2),
    "full_over_table_floor": round(full / (floor_fg + floor_bg), 2),
    "reference_context": {
        "step_ms": 62.0, "valid_samples": 49152.0,
        "ours_samples_per_sec": round(valid_samples / (full / 1e3)),
        "ref_samples_per_sec": round(49152 / 0.062),
    },
    "notes": ("isolated stages are jitted alone at the step's true shapes; "
              "residual = NeuS chain + losses + per-ray scatters + "
              "fusion-boundary costs with no isolated measurement. "
              "issue_rate_floor = table gather/scatter rows x measured "
              "per-instance ns (roofline2/3); MLP + chain math excluded, "
              "so core/floor > 1 means orchestration+math headroom, "
              "core/floor ~ 1 means the core IS table traffic."),
}
print(json.dumps(out, indent=1), flush=True)
with open(OUT_JSON, "w") as f:
    json.dump(out, f, indent=1)
