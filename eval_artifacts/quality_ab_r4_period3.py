"""Flagship-scale chip A/B: table-grad alternation period 2 vs 3.

The finding-33 device trace shows the six table-grad scatter-adds are
42% of the lever step (89 of 213 ms). grad_level_period=3 emits
backward scatters for 8 of 24 levels per step instead of 12 (each
level's table updates every 3rd step) — expected ~30 ms off the step.
The quality question is whether the extra staleness hurts at equal
iterations; period 2 cost -1.0 dB equal-iters and won +4.1 dB
time-matched (ROUND4.md item 1).

Also times the step at both periods in-session first, so the JSON
carries speed AND quality. Writes eval_artifacts/quality_ab_r4_period3.json.

Smoke: QAB_SMOKE=1 QAB_ITERS=200 QAB_WID=64 env -u PALLAS_AXON_POOL_IPS
JAX_PLATFORMS='' python eval_artifacts/quality_ab_r4_period3.py
"""
import sys, os, time, json, dataclasses
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

OUT = "/root/repo/eval_artifacts"
SMOKE = bool(os.environ.get("QAB_SMOKE"))
NR = int(os.environ.get("QAB_ITERS", "2500"))
base = dict(
    nr_iter_sphere_fit=int(NR * 0.17),
    forced_variance_finish_iter=int(NR * 0.375),
    iter_start_reduce_curv=int(NR * 0.46),
    lr_milestones=(int(NR * 0.54), int(NR * 0.71), int(NR * 0.83),
                   int(NR * 0.92)),
    iter_finish_training=NR,
    sdf_nr_iters_for_c2f=int(NR * 0.375),
    with_mask=True, table_grad_alternate=True, train_lod_top_k=24,
    train_lod_rand_extra=8,
)
if SMOKE:  # CPU end-to-end validation scale
    base.update(capacity=2 ** 14, nr_levels=12)
variants = {"period2": {}, "period3": dict(table_grad_period=3)}

out = {"iters": NR, "per_variant": {}}

# ---- in-session step timing at both periods (trained sparse ckpt) ----
CKPT = os.path.join(OUT, "full_run_ckpt", "full", "30000", "models")
if not SMOKE and os.path.isdir(CKPT):
    tcfg = tps.PermutoSDFTrainConfig(
        train_lod_top_k=24, train_lod_rand_extra=8, table_grad_alternate=True,
        nr_rays=1024)
    treel = make_synthetic_reel(nr_views=4, width=100, height=100)
    tparams = tps.init_params(jax.random.PRNGKey(0), tcfg, treel.nr_images)
    _, tgrid = tps.load_from_checkpoint(CKPT, tcfg)
    it = jnp.asarray(100000)
    key = jax.random.PRNGKey(2)

    def timeit(fn, n=10, reps=3):
        o = fn(); jax.block_until_ready(o)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                o = fn()
            jax.block_until_ready(o)
            best = min(best, (time.perf_counter() - t0) / n)
        return best * 1e3

    for period in (2, 3):
        ms = []
        for parity in range(period):
            c = dataclasses.replace(tcfg, table_grad_period=period,
                                    table_grad_parity=parity)
            ms.append(timeit(
                lambda: tps._grads_step(tparams, tgrid, treel, key, it, c)[0]))
        out[f"step_ms_period{period}"] = round(sum(ms) / len(ms), 1)
        print(f"step @1024 rays, period {period}: "
              f"{out[f'step_ms_period{period}']} ms", flush=True)

# ---- equal-iteration quality A/B ----
W = int(os.environ.get("QAB_WID", "200"))
reel = make_synthetic_reel(nr_views=24, width=W, height=W)
test = make_synthetic_reel(nr_views=2, width=W, height=W, radius=1.25,
                           fov_deg=33.0)

for name, kw in variants.items():
    cfg = tps.PermutoSDFTrainConfig(**base, **kw)
    t0 = time.perf_counter()
    params, grid, hist = tps.train(reel, cfg, nr_iters=NR, log_every=1000)
    train_s = time.perf_counter() - t0
    rows = []
    for i in range(test.nr_images):
        rgb, _, alpha = tps.render_image(
            params, grid, test.K[i], test.tf_world_cam[i], W, W, NR, cfg)
        gt = np.asarray(test.rgb[i])
        m = np.asarray(test.mask[i]).astype(bool).reshape(W, W)
        mse_fg = float(np.mean((rgb[m] - gt[m]) ** 2))
        pm = np.asarray(alpha).reshape(W, W) > 0.5
        iou = float(np.logical_and(pm, m).sum()
                    / max(np.logical_or(pm, m).sum(), 1))
        rows.append({"view": i,
                     "psnr_fg": round(10 * np.log10(1 / max(mse_fg, 1e-12)), 2),
                     "mask_iou": round(iou, 4)})
    res = {
        "train_minutes": round(train_s / 60, 1),
        "per_view": rows,
        "psnr_fg_mean": round(float(np.mean([r["psnr_fg"] for r in rows])), 2),
        "mask_iou_mean": round(float(np.mean([r["mask_iou"] for r in rows])), 4),
    }
    out["per_variant"][name] = res
    print(name, json.dumps(res), flush=True)
    with open(os.path.join(OUT, "quality_ab_r4_period3.json"), "w") as f:
        json.dump(out, f, indent=1)

a, b = out["per_variant"]["period2"], out["per_variant"]["period3"]
out["psnr_delta_p3_vs_p2"] = round(b["psnr_fg_mean"] - a["psnr_fg_mean"], 2)
out["iou_delta_p3_vs_p2"] = round(b["mask_iou_mean"] - a["mask_iou_mean"], 4)
with open(os.path.join(OUT, "quality_ab_r4_period3.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
