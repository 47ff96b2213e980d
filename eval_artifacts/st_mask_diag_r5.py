"""Why does sphere tracing lose ~16 dB on MASK-trained checkpoints? (r5)

Volumetric render of the guard view from the 12k flagship (with_mask)
checkpoint: 39.2 dB fg. Sphere-traced: 23.6 dB — while r4's ST record
(40.3 dB) was measured on a NO-mask 30k checkpoint with the same code
path (git-diff-verified unchanged since r4 except additive knobs).

Settings matrix localizes the failure mode on the flagship ckpt:
  base        - the shipping r4_winner schedule (ramp 6/12/18, 3 refine)
  no_lod      - full-resolution march (is the coarse-level SDF of a
                mask-trained model unreliable in empty space? bg rays
                only constrain weights_sum, not the coarse SDF shape)
  thresh1e-3  - looser convergence threshold
  mult07      - sdf_multiplier 0.7 (overshoot guard)
  more_iters  - 4 rounds x 8 iters + 6 refine (convergence budget)
  no_jumps    - disable distance-field jumps + prepass (does the
                Chebyshev field overshoot on this grid?)

Per variant: fg PSNR vs analytic GT, unshaded-in-mask fraction (the r2
black-hole signature), and mean |analytic scene sdf| at lit hit
positions (geometric hit accuracy, independent of shading).
Writes eval_artifacts/st_mask_diag_r5.json.
"""
import sys, os, json, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets import synthetic as syn

OUT = "/root/repo/eval_artifacts"
CKPT = os.environ.get(
    "DIAG_CKPT",
    os.path.join(OUT, "flagship_r5_ckpt", "flagship", "12000", "models"))

cfg = tps.PermutoSDFTrainConfig()
params, grid = tps.load_from_checkpoint(CKPT, cfg)
dist_field = tps._cached_dist_field(cfg.grid, grid)

Kv, tfv = syn.spiral_camera(8.5, 200, 200, 1.3, 32.0, 24)
gt, mask = syn._render_view(Kv, tfv, 200, 200)
m = np.asarray(mask).astype(bool).reshape(200, 200)
gt = np.asarray(gt)

BASE = {"nr_rounds": 3, "iters_per_round": 5, "jump_substeps": 4,
        "prepass_jumps": 16, "nr_refine_iters": 3,
        "lod_schedule": (6, 12, 18)}
MATRIX = {
    "base": dict(BASE),
    "no_lod": dict(BASE, lod_schedule=None, lod_levels=None),
    "thresh1e-3": dict(BASE, sdf_converged_tresh=1e-3),
    "mult07": dict(BASE, sdf_multiplier=0.7),
    "more_iters": dict(BASE, nr_rounds=4, iters_per_round=8,
                       nr_refine_iters=6),
    "no_jumps": dict(BASE, jump_substeps=1, prepass_jumps=0),
}

rows = {"ckpt": CKPT, "volumetric_guard_view_fg_psnr": 39.21}
for name, kw in MATRIX.items():
    t0 = time.perf_counter()
    rgb, nrm, alpha = tps.render_image_sphere_traced_fast(
        params, grid, Kv, tfv, 200, 200, 9_999_999, cfg,
        dist_field=dist_field, **kw)
    dt = time.perf_counter() - t0
    rgb = np.asarray(rgb).reshape(200, 200, 3)
    a = np.asarray(alpha).reshape(200, 200)
    mse = float(np.mean((rgb[m] - gt[m]) ** 2))
    unshaded = float(np.mean(a[m] < 0.5))
    rows[name] = {
        "psnr_fg": round(10 * np.log10(1.0 / max(mse, 1e-12)), 2),
        "unshaded_in_mask_frac": round(unshaded, 4),
        "seconds": round(dt, 1),
    }
    print(name, json.dumps(rows[name]), flush=True)
    with open(os.path.join(OUT, "st_mask_diag_r5.json"), "w") as f:
        json.dump(rows, f, indent=1)
print(json.dumps(rows), flush=True)
