"""Flagship-scale chip A/B (equal ITERATIONS): r4 shipping levers (p2)
vs table-grad period 3 (p3) vs period 3 + hit-ray compaction (p3hc).

Lands the r4 queue-7 debt (VERDICT r4 items 1/4, weak #2/#3): the
period-3 quality question at flagship scale, plus the r5 hit-ray
compaction lever under the same guard. Hit-ray compaction is
exactness-tested (bit-identical grads while hits fit the bucket,
tests/test_pipelines.py), so its arm mainly guards the adaptive-fraction
driving + overflow transients; period 3 is the real staleness question
(each table level updates every 3rd step instead of every 2nd).

Protocol identical to quality_ab_r4.json (2500 iters, with_mask, W=200
synthetic, 2 held-out views) so deltas are comparable across rounds.

Smoke: QAB_SMOKE=1 QAB_ITERS=200 QAB_WID=64 env -u PALLAS_AXON_POOL_IPS \
    JAX_PLATFORMS=cpu python eval_artifacts/quality_ab_r5.py
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
OUT_JSON = os.path.join(
    OUT, "quality_ab_r5_smoke.json" if SMOKE else "quality_ab_r5.json")

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
variants = {
    "p2": {},
    "p3": dict(table_grad_period=3),
    "p3hc": dict(table_grad_period=3, hit_ray_frac=1.0),  # driven down
}

out = {"smoke": SMOKE, "iters": NR, "base": {k: str(v) for k, v in base.items()},
       "per_variant": {}}

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
    with open(OUT_JSON, "w") as f:
        json.dump(out, f, indent=1)

p2 = out["per_variant"]["p2"]
for name in ("p3", "p3hc"):
    v = out["per_variant"][name]
    out[f"psnr_delta_{name}_vs_p2"] = round(
        v["psnr_fg_mean"] - p2["psnr_fg_mean"], 2)
    out[f"iou_delta_{name}_vs_p2"] = round(
        v["mask_iou_mean"] - p2["mask_iou_mean"], 4)
with open(OUT_JSON, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
