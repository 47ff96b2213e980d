"""Flagship with_mask run, r5 SHIPPING-DEFAULTS refresh (VERDICT r4 item 4).

Same protocol as mask_quality_run.py (whose 69-min result predates the
finding-30/33 defaults: isp12, curv8192, grid-lvl14, compare_all
searchsorted); separate artifact so both points stay comparable.

The reference's mask-supervised mode (train_permuto_sdf.py:87-105: mask
BCE loss, no background model contribution) had only been exercised by
smoke tests. This trains the FLAGSHIP config with with_mask=True on the
synthetic scene (GT masks exist by construction) on a proportionally
compressed schedule (200k -> 12k) and reports foreground PSNR, mask IoU
of the rendered alpha, and DTUeval-form Chamfer against the analytic
surface.

Artifacts: eval_artifacts/mask_quality_run.json + PNG.
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets import synthetic as syn
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

OUT = os.environ.get("EVAL_OUT", "/root/repo/eval_artifacts")
os.makedirs(OUT, exist_ok=True)
NR_ITERS = int(os.environ.get("MASK_ITERS", "12000"))

# MASK_LEVERS=1 turns on the round-4 throughput levers at their flagship
# A/B values (perf_ab_r4.json "row+lod+par": 136.1 ms/step vs 408.8
# baseline; time-matched quality A/B quality_ab_r4_timematched.json:
# +4.1 dB fg PSNR at equal wall-clock).
# r5 shipping profile: r4 levers + table-grad period (env MASK_PERIOD,
# default 3 pending quality_ab_r5) + hit-ray compaction (adaptive)
LEVERS = dict(train_lod_top_k=24, train_lod_rand_extra=8,
              table_grad_alternate=True,
              table_grad_period=int(os.environ.get("MASK_PERIOD", "3")),
              hit_ray_frac=1.0)

cfg = tps.PermutoSDFTrainConfig(
    nr_iter_sphere_fit=int(NR_ITERS * 0.17),
    forced_variance_finish_iter=int(NR_ITERS * 0.375),
    iter_start_reduce_curv=int(NR_ITERS * 0.46),
    lr_milestones=(int(NR_ITERS * 0.54), int(NR_ITERS * 0.71),
                   int(NR_ITERS * 0.83), int(NR_ITERS * 0.92)),
    iter_finish_training=NR_ITERS,
    sdf_nr_iters_for_c2f=int(NR_ITERS * 0.375),
    with_mask=True,
    **LEVERS,
)

reel = make_synthetic_reel(nr_views=24, width=200, height=200)
test_reel = make_synthetic_reel(nr_views=4, width=200, height=200,
                                radius=1.25, fov_deg=33.0)

t0 = time.perf_counter()
params, grid, history = tps.train(
    reel, cfg, nr_iters=NR_ITERS, log_every=1000,
    experiment_name="flagship",
    precompile_ahead=True,
    checkpoint_path=os.path.join(OUT, "flagship_r5_ckpt"),
    save_every=10 ** 9,
)
train_s = time.perf_counter() - t0
print(f"training done in {train_s/60:.1f} min", flush=True)

from permuto_sdf_tpu.eval.metrics import psnr
import imageio.v2 as imageio

it_anneal = NR_ITERS
rows = []
for i in range(int(os.environ.get("MASK_EVAL_VIEWS", test_reel.nr_images))):
    rgb, nrm, alpha = tps.render_image(
        params, grid, test_reel.K[i], test_reel.tf_world_cam[i],
        test_reel.width, test_reel.height, it_anneal, cfg,
    )
    gt = np.asarray(test_reel.rgb[i])
    m = np.asarray(test_reel.mask[i]).astype(bool).reshape(gt.shape[:2])
    mse_fg = float(np.mean((rgb[m] - gt[m]) ** 2))
    pred_m = np.asarray(alpha).reshape(gt.shape[:2]) > 0.5
    inter = float(np.logical_and(pred_m, m).sum())
    union = float(np.logical_or(pred_m, m).sum())
    rows.append({
        "view": i,
        "psnr_foreground": float(10 * np.log10(1.0 / max(mse_fg, 1e-12))),
        "mask_iou": inter / max(union, 1.0),
    })
    if i == 0:
        imageio.imwrite(os.path.join(OUT, "mask_run_r5_view0.png"),
                        (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
    print(json.dumps(rows[-1]), flush=True)

from permuto_sdf_tpu.ops.marching_cubes import extract_mesh_from_sdf_fn
from permuto_sdf_tpu.eval.chamfer import dtu_chamfer, dtueval_sample_mesh
from permuto_sdf_tpu.models.fields import sdf_apply


@jax.jit
def sdf_fn(pts):
    return sdf_apply(params["sdf"], pts, it_anneal, cfg.sdf_model)[0]


MESH_RES = int(os.environ.get("MASK_MESH_RES", "400"))
V_pred, F_pred = extract_mesh_from_sdf_fn(sdf_fn, MESH_RES, -0.5, 0.5)
V_gt, F_gt = extract_mesh_from_sdf_fn(jax.jit(syn.scene_sdf), MESH_RES, -0.5, 0.5)
gt_points = dtueval_sample_mesh(V_gt, F_gt, density=0.002)
overall, d2s, s2d = dtu_chamfer(V_pred, F_pred, gt_points,
                                downsample_density=0.002, max_dist=0.05)

result = {
    "config": ("flagship 2^18/24 levels, with_mask=True (mask BCE, no "
               f"bg model in the loss); schedule reference 200k "
               f"x{NR_ITERS/200000:.3f} -> {NR_ITERS}"
               + ("; r5 levers row+lod24+par%d+hc" % cfg.table_grad_period)),
    "levers": LEVERS,
    "train_minutes": round(train_s / 60, 1),
    "nr_iters": NR_ITERS,
    "image_metrics_per_view": rows,
    "psnr_foreground_mean": float(np.mean([r["psnr_foreground"] for r in rows])),
    "mask_iou_mean": float(np.mean([r["mask_iou"] for r in rows])),
    "chamfer_scene_units": overall,
    "chamfer_d2s": d2s, "chamfer_s2d": s2d,
    "pred_mesh": {"V": len(V_pred), "F": len(F_pred)},
}
with open(os.path.join(OUT, "mask_quality_run_r5.json"), "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps(result), flush=True)
