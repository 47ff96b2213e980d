"""Flagship-scale chip A/B: r4 lever defaults vs +isp12 +curv8192.

Two candidate levers that only touch regularization/sample PLACEMENT
(unlike lod16, which cut the rendered band itself and collapsed):

- imp_sampling_max_levels=12: the importance-sampling proxy SDF reads
  only the 12 coarsest levels; the rendered samples are still evaluated
  at full resolution (perf_ab_r4.json: 136.1 -> 127.2 ms/step).
- curvature_sample_budget 16384 -> 8192: the curvature term is a pure
  regularizer estimated on a random ray prefix; halving its budget
  halves its second sdf_with_gradient evaluation.

Both variants train the same compressed 2500-iter with_mask schedule,
same seeds, compared on held-out fg PSNR / mask IoU. Writes
eval_artifacts/quality_ab_r4_isp.json.
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

OUT = "/root/repo/eval_artifacts"
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
if os.environ.get("QAB_SMOKE"):  # CPU end-to-end validation scale
    base.update(capacity=2 ** 14, nr_levels=12)
variants = {"defaults": {},
            "perf_pack": dict(imp_sampling_max_levels=12,
                              curvature_sample_budget=8192)}

W = int(os.environ.get("QAB_WID", "200"))
reel = make_synthetic_reel(nr_views=24, width=W, height=W)
test = make_synthetic_reel(nr_views=2, width=W, height=W, radius=1.25,
                           fov_deg=33.0)

out = {"iters": NR, "per_variant": {}}
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
    with open(os.path.join(OUT, "quality_ab_r4_isp.json"), "w") as f:
        json.dump(out, f, indent=1)

a, b = out["per_variant"]["defaults"], out["per_variant"]["perf_pack"]
out["psnr_delta_pack_vs_defaults"] = round(
    b["psnr_fg_mean"] - a["psnr_fg_mean"], 2)
out["iou_delta_pack_vs_defaults"] = round(
    b["mask_iou_mean"] - a["mask_iou_mean"], 4)
with open(os.path.join(OUT, "quality_ab_r4_isp.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
