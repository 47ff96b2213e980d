"""Time-matched quality comparison for the round-4 throughput levers.

quality_ab_r4.py compared equal ITERATION counts (2500): levers cost
-1.01 dB fg PSNR / -0.010 IoU while training 2.7x faster. The decision
users actually face is equal WALL-CLOCK: reference behavior trained 2500
iters in 54.4 min; here the lever config (row gather + train-time LOD +
alternating table grads) trains for the same wall-clock budget (~6600
iters via its 2.7x speedup, full milestone schedule compressed to that
length) and is evaluated identically. Writes
eval_artifacts/quality_ab_r4_timematched.json.
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

OUT = "/root/repo/eval_artifacts"
NR = int(os.environ.get("QAB_ITERS", "6600"))
base = dict(
    capacity=2 ** 14, nr_levels=12, nr_rays=256,
    nr_iter_sphere_fit=int(NR * 0.15),
    forced_variance_finish_iter=int(NR * 0.35),
    iter_start_reduce_curv=int(NR * 0.45),
    lr_milestones=(int(NR * 0.55), int(NR * 0.725), int(NR * 0.825),
                   int(NR * 0.9)),
    iter_finish_training=NR,
    sdf_nr_iters_for_c2f=int(NR * 0.35),
    grid_nr_voxels_per_dim=32, grid_nr_random_samples=4096,
    max_nr_samples_per_ray=32, nr_samples_imp_sampling=8,
    nr_samples_bg=16, with_mask=True,
    table_row_gather=True, train_lod_top_k=12, train_lod_rand_extra=4,
    table_grad_alternate=True,
)

reel = make_synthetic_reel(nr_views=8, width=64, height=64)
test = make_synthetic_reel(nr_views=2, width=64, height=64, radius=1.27,
                           fov_deg=33.0)

cfg = tps.PermutoSDFTrainConfig(**base)
t0 = time.perf_counter()
params, grid, hist = tps.train(reel, cfg, nr_iters=NR, log_every=1000)
train_s = time.perf_counter() - t0
rows = []
for i in range(test.nr_images):
    rgb, _, alpha = tps.render_image(
        params, grid, test.K[i], test.tf_world_cam[i], 64, 64, NR, cfg,
        chunk=1024)
    gt = np.asarray(test.rgb[i])
    m = np.asarray(test.mask[i]).astype(bool).reshape(64, 64)
    mse_fg = float(np.mean((rgb[m] - gt[m]) ** 2))
    pm = np.asarray(alpha).reshape(64, 64) > 0.5
    iou = float(np.logical_and(pm, m).sum()
                / max(np.logical_or(pm, m).sum(), 1))
    rows.append({"view": i,
                 "psnr_fg": round(10 * np.log10(1 / max(mse_fg, 1e-12)), 2),
                 "mask_iou": round(iou, 4)})

ref = json.load(open(os.path.join(OUT, "quality_ab_r4.json")))
out = {
    "iters": NR,
    "train_minutes": round(train_s / 60, 1),
    "per_view": rows,
    "psnr_fg_mean": round(float(np.mean([r["psnr_fg"] for r in rows])), 2),
    "mask_iou_mean": round(float(np.mean([r["mask_iou"] for r in rows])), 4),
    "reference_behavior_2500it": ref["per_variant"]["reference_behavior"],
}
out["psnr_delta_timematched"] = round(
    out["psnr_fg_mean"]
    - out["reference_behavior_2500it"]["psnr_fg_mean"], 2)
out["iou_delta_timematched"] = round(
    out["mask_iou_mean"]
    - out["reference_behavior_2500it"]["mask_iou_mean"], 4)
with open(os.path.join(OUT, "quality_ab_r4_timematched.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
