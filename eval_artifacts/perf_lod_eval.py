"""A/B: per-sample level-LOD volumetric eval rendering (finding 20,
VERDICT r2 item 3c) on the trained flagship checkpoint.

Exact path: every valid sample pays full-resolution encode + gradient +
RGB. LOD path: coarse-level weights pick top-K samples per ray; only
those get full resolution (render_rays_eval_lod). A CPU diag on the
trained flagship showed coarse_levels=10 misplaces the crossing
(fg 22.8 vs 35.1 dB on a train view) — top_k is the binding knob (K=32 is 48 dB vs exact; K=16 loses ~9 dB). Measures warm seconds
per 200^2 view and PSNR (vs GT and vs the exact render) for a settings
matrix; writes perf_lod_eval.json.
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets import synthetic as syn
from permuto_sdf_tpu.datasets.tensor_reel import look_at_cam_to_world

OUT = os.environ.get("EVAL_OUT", "/root/repo/eval_artifacts")
os.makedirs(OUT, exist_ok=True)
CKPT = os.path.join("/root/repo/eval_artifacts", "full_run_ckpt", "full", "30000", "models")
cfg = tps.PermutoSDFTrainConfig()
params, grid = tps.load_from_checkpoint(CKPT, cfg)

WID = int(os.environ.get("LOD_WID", "200"))


def heldout_view(i_frac, width=WID, height=WID, radius=1.3, fov_deg=32.0,
                 nr_views=24):
    # canonical capture-distribution camera (one source of truth)
    return syn.spiral_camera(i_frac, width, height, radius, fov_deg, nr_views)


Kv, tfv = heldout_view(8.5)
gt, mask = syn._render_view(Kv, tfv, WID, WID)
m = mask.astype(bool).reshape(WID, WID)


def fg_psnr(rgb, ref):
    mse = float(np.mean((rgb[m] - np.asarray(ref)[m]) ** 2))
    return round(float(10 * np.log10(1.0 / max(mse, 1e-12))), 2)


def timed(kw, n=3):
    ts = []
    for _ in range(n + 1):
        t0 = time.perf_counter()
        out = tps.render_image(params, grid, Kv, tfv, WID, WID, 9_999_999,
                               cfg, **kw)
        ts.append(time.perf_counter() - t0)
    return out, round(float(np.median(ts[1:])), 2)


(exact, _, _), t_exact = timed({})
rows = {"exact": {"seconds_per_view": t_exact,
                  "psnr_fg_vs_gt": fg_psnr(exact, gt)}}
print("exact", json.dumps(rows["exact"]), flush=True)

MATRIX = ([(12, 32)] if os.environ.get("LOD_SMOKE") else
          [(12, 32), (16, 32), (12, 24), (8, 32), (12, 48)])
for cl, k in MATRIX:
    fb0 = tps.LOD_FALLBACK_COUNT
    (img, _, _), t_lod = timed({"lod": (cl, k)})
    row = {
        "seconds_per_view": t_lod,
        "psnr_fg_vs_gt": fg_psnr(img, gt),
        "psnr_fg_vs_exact": fg_psnr(img, exact),
        "speedup": round(t_exact / t_lod, 2),
    }
    if tps.LOD_FALLBACK_COUNT > fb0:
        # compile crash -> render_image substituted the exact path; the
        # timing is NOT a LOD measurement, mark it so
        row = {"compile_fallback": True, "note": "XLA:TPU fusion crash; "
               "exact path was substituted — no LOD number at this point"}
    rows[f"lod_c{cl}_k{k}"] = row
    print(f"lod_c{cl}_k{k}", json.dumps(row), flush=True)

with open(os.path.join(OUT, "perf_lod_eval.json"), "w") as f:
    json.dump(rows, f, indent=1)
print(json.dumps(rows), flush=True)
