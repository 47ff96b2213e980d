"""Background-model validation run (VERDICT r2 items 4 + 8).

Trains the FLAGSHIP config (capacity 2^18, 24 levels, no mask => NeRF++
background model active) on the synthetic scene with a TEXTURED,
PARALLAX-BEARING background (procedural sky sphere at radius 4 — finite,
so different views see genuinely different background, the signal the
reference's bg model gets from real DTU backgrounds every run,
RaySamplerGPU.cuh:103-131 / models.py:425-563).

Schedule: proportionally compressed 200k -> 20k (compression stated in the
output JSON), exercising at scale ALL the late-schedule events the r2
review flagged as smoke-only: LR milestones (x0.3 each), curvature
shutoff at iter_start_reduce_curv, rgb weight-decay flip. A schedule
AUDIT block in the JSON records the lr / curvature-weight / wd-factor
values straddling each event so firing is verifiable, not assumed.

End metrics: full-image PSNR (bg composited), foreground PSNR,
BACKGROUND-ONLY PSNR (the direct bg-model metric) on held-out views.
Artifacts: eval_artifacts/bg_quality_run.json + PNGs.
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

OUT = os.environ.get("EVAL_OUT", "/root/repo/eval_artifacts")
os.makedirs(OUT, exist_ok=True)
CKPT = os.path.join(OUT, "bg_run_ckpt")
# schedule points are FRACTIONS of the run length so the run can be
# right-sized to available hardware time (BG_ITERS env); compression vs
# the reference 200k schedule is stated in the output JSON
NR_ITERS = int(os.environ.get("BG_ITERS", "20000"))
COMPRESSION = (f"reference 200k-iter schedule x{NR_ITERS/200000:.3f} "
               f"(sphere-init 4000->{int(NR_ITERS*0.15)})")

cfg = tps.PermutoSDFTrainConfig(
    nr_iter_sphere_fit=int(NR_ITERS * 0.15),
    forced_variance_finish_iter=int(NR_ITERS * 0.35),
    iter_start_reduce_curv=int(NR_ITERS * 0.45),
    lr_milestones=(int(NR_ITERS * 0.55), int(NR_ITERS * 0.725),
                   int(NR_ITERS * 0.825), int(NR_ITERS * 0.9)),
    iter_finish_training=NR_ITERS,
    sdf_nr_iters_for_c2f=int(NR_ITERS * 0.35),
    with_mask=False,
)

reel = make_synthetic_reel(nr_views=24, width=200, height=200,
                           bg_mode="textured")
test_reel = make_synthetic_reel(nr_views=4, width=200, height=200,
                                radius=1.25, fov_deg=33.0,
                                bg_mode="textured")

# ---- schedule audit: values straddling every late-schedule event ----
def _audit():
    rows = {}
    s0 = cfg.nr_iter_sphere_fit
    # factor out the warmup ramp so the check is exact even when a
    # (smoke-scale) run puts milestones inside the warmup window
    import dataclasses as _dc
    cfg_flat = _dc.replace(cfg, lr_milestones=())
    for m in cfg.lr_milestones:
        lo = float(tps.lr_schedule(cfg, s0 + m - 1))
        hi = float(tps.lr_schedule(cfg, s0 + m))
        ramp = (float(tps.lr_schedule(cfg_flat, s0 + m)) /
                float(tps.lr_schedule(cfg_flat, s0 + m - 1)))
        rows[f"lr_at_milestone_{m}"] = {"before": lo, "after": hi,
                                        "ratio": hi / lo}
        assert abs(hi / lo - cfg.lr_decay_gamma * ramp) < 1e-5, (m, lo, hi)
    c_before = float(tps.map_range_val(
        jnp.asarray(cfg.iter_start_reduce_curv - 1, jnp.float32),
        cfg.iter_start_reduce_curv, cfg.iter_finish_reduce_curv, 1.0, 0.0))
    c_after = float(tps.map_range_val(
        jnp.asarray(cfg.iter_finish_reduce_curv + 1, jnp.float32),
        cfg.iter_start_reduce_curv, cfg.iter_finish_reduce_curv, 1.0, 0.0))
    rows["curvature_weight"] = {
        "at_start_reduce-1": c_before, "after_finish_reduce": c_after}
    assert c_after == 0.0
    # wd flip: rgb lattice decay factor switches from 1.0 to 1 - lr at
    # iter_start_reduce_curv (post-sphere-init iters)
    p = {"rgb": {"encoding": {"lattice_values": jnp.ones((4, 2))}}}
    lr = jnp.asarray(1e-3)
    before = tps._apply_weight_decay(
        p, lr, jnp.asarray(s0 + cfg.iter_start_reduce_curv - 1), cfg)
    after = tps._apply_weight_decay(
        p, lr, jnp.asarray(s0 + cfg.iter_start_reduce_curv), cfg)
    rows["rgb_wd_factor"] = {
        "before": float(before["rgb"]["encoding"]["lattice_values"][0, 0]),
        "after": float(after["rgb"]["encoding"]["lattice_values"][0, 0])}
    assert rows["rgb_wd_factor"]["before"] == 1.0
    assert rows["rgb_wd_factor"]["after"] < 1.0
    return rows


audit = _audit()
print("schedule audit OK:", json.dumps(audit), flush=True)

t0 = time.perf_counter()
params, grid, history = tps.train(
    reel, cfg, nr_iters=NR_ITERS, log_every=1000,
    checkpoint_path=CKPT, experiment_name="bg", save_every=10000,
)
train_s = time.perf_counter() - t0
print(f"training done in {train_s/60:.1f} min", flush=True)

from permuto_sdf_tpu.eval.metrics import psnr, ssim
import imageio.v2 as imageio

it_anneal = NR_ITERS
rows = []
for i in range(int(os.environ.get("BG_EVAL_VIEWS", test_reel.nr_images))):
    rgb, nrm, alpha = tps.render_image(
        params, grid, test_reel.K[i], test_reel.tf_world_cam[i],
        test_reel.width, test_reel.height, it_anneal, cfg,
    )
    gt = np.asarray(test_reel.rgb[i])
    m = np.asarray(test_reel.mask[i]).astype(bool).reshape(gt.shape[:2])
    def _masked_psnr(sel):
        mse = float(np.mean((rgb[sel] - gt[sel]) ** 2))
        return float(10 * np.log10(1.0 / max(mse, 1e-12)))
    rows.append({
        "view": i,
        "psnr_full": float(psnr(rgb, gt)),
        "ssim_full": float(ssim(rgb, gt)),
        "psnr_foreground": _masked_psnr(m),
        "psnr_background": _masked_psnr(~m),
    })
    if i == 0:
        imageio.imwrite(os.path.join(OUT, "bg_run_view0.png"),
                        (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
        imageio.imwrite(os.path.join(OUT, "bg_run_view0_gt.png"),
                        (np.clip(gt, 0, 1) * 255).astype(np.uint8))
    print(json.dumps(rows[-1]), flush=True)

result = {
    "config": "flagship 2^18/24 levels, textured parallax background, "
              "no mask; schedule " + COMPRESSION,
    "train_minutes": round(train_s / 60, 1),
    "nr_iters": NR_ITERS,
    "schedule_audit": audit,
    "image_metrics_per_view": rows,
    "psnr_full_mean": float(np.mean([r["psnr_full"] for r in rows])),
    "psnr_foreground_mean": float(np.mean([r["psnr_foreground"] for r in rows])),
    "psnr_background_mean": float(np.mean([r["psnr_background"] for r in rows])),
    "ssim_full_mean": float(np.mean([r["ssim_full"] for r in rows])),
}
with open(os.path.join(OUT, "bg_quality_run.json"), "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps(result), flush=True)
