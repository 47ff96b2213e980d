"""Quality A/B for a more aggressive train-LOD K (CPU-scale screen).

perf_ab_r4.json: flagship top_k 24 -> 16 saves 136.1 -> 118.0 ms/step.
At the CPU screen scale (max 32 samples/ray vs the flagship's 96) the
proportional K is 12 -> 8. Trains both for the same 2500 iters with the
same seeds/schedule as quality_ab_r4.py and reports the fg PSNR / IoU
delta; a small delta justifies a flagship-scale chip A/B before
adopting K=16.
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

OUT = "/root/repo/eval_artifacts"
NR = int(os.environ.get("QAB_ITERS", "2500"))
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
    table_row_gather=True, table_grad_alternate=True,
)
VARIANTS = {
    "lod12": dict(train_lod_top_k=12, train_lod_rand_extra=4),
    "lod8": dict(train_lod_top_k=8, train_lod_rand_extra=4),
}

reel = make_synthetic_reel(nr_views=8, width=64, height=64)
test = make_synthetic_reel(nr_views=2, width=64, height=64, radius=1.27,
                           fov_deg=33.0)

out = {"iters": NR, "per_variant": {}}
for name, kw in VARIANTS.items():
    cfg = tps.PermutoSDFTrainConfig(**base, **kw)
    t0 = time.perf_counter()
    params, grid, _ = tps.train(reel, cfg, nr_iters=NR, log_every=1000,
                                experiment_name=None)
    mins = (time.perf_counter() - t0) / 60
    rows = []
    for i in range(test.nr_images):
        rgb, _, alpha = tps.render_image(
            params, grid, test.K[i], test.tf_world_cam[i], test.width,
            test.height, NR, cfg)
        gt = np.asarray(test.rgb[i])
        m = np.asarray(test.mask[i]).astype(bool).reshape(gt.shape[:2])
        mse = float(np.mean((rgb[m] - gt[m]) ** 2))
        pred_m = np.asarray(alpha).reshape(gt.shape[:2]) > 0.5
        iou = (np.logical_and(pred_m, m).sum()
               / max(np.logical_or(pred_m, m).sum(), 1.0))
        rows.append({"view": i,
                     "psnr_fg": round(10 * np.log10(1 / max(mse, 1e-12)), 2),
                     "mask_iou": round(float(iou), 4)})
    out["per_variant"][name] = {
        "train_minutes": round(mins, 1), "per_view": rows,
        "psnr_fg_mean": round(float(np.mean([r["psnr_fg"] for r in rows])), 2),
        "mask_iou_mean": round(float(np.mean([r["mask_iou"] for r in rows])), 4),
    }
    print(name, json.dumps(out["per_variant"][name]), flush=True)
    with open(os.path.join(OUT, "quality_ab_r4_lodk.json"), "w") as f:
        json.dump(out, f, indent=1)

a, b = (out["per_variant"][k] for k in ("lod12", "lod8"))
out["psnr_delta_lod8_vs_lod12"] = round(b["psnr_fg_mean"] - a["psnr_fg_mean"], 2)
out["iou_delta_lod8_vs_lod12"] = round(b["mask_iou_mean"] - a["mask_iou_mean"], 4)
with open(os.path.join(OUT, "quality_ab_r4_lodk.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
