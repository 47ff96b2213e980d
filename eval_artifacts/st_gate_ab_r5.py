"""Chip A/B for the jump-gate tunnel fix (st_mask_diag_r5 follow-up).

Arms on the 12k flagship (with_mask) checkpoint, shipping ST schedule
(ramp 6/12/18, 3 rounds x 5 iters, 3 refine, substeps 4, prepass 16):
  gate0 - jump_gate_voxels=0 (the pre-fix behavior: 23.6 dB, 19.4%
          of fg pixels killed by interior jump tunneling)
  gate1 - jump_gate_voxels=1 (the fix, now the default)

Per arm: 200^2 guard fg PSNR + unshaded-in-mask fraction, and 1080p
frame times (1 cold + 3 warm). Writes eval_artifacts/st_gate_ab_r5.json.
"""
import sys, os, json, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets import synthetic as syn
from permuto_sdf_tpu.datasets.tensor_reel import look_at_cam_to_world

OUT = "/root/repo/eval_artifacts"
CKPT = os.path.join(OUT, "flagship_r5_ckpt", "flagship", "12000", "models")
cfg = tps.PermutoSDFTrainConfig()
params, grid = tps.load_from_checkpoint(CKPT, cfg)
dist_field = tps._cached_dist_field(cfg.grid, grid)

Kv, tfv = syn.spiral_camera(8.5, 200, 200, 1.3, 32.0, 24)
gt, mask = syn._render_view(Kv, tfv, 200, 200)
m = np.asarray(mask).astype(bool).reshape(200, 200)
gt = np.asarray(gt)

W, H = 1920, 1080
f = 0.5 * W / np.tan(np.radians(32.0) / 2)
K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

BASE = {"nr_rounds": 3, "iters_per_round": 5, "jump_substeps": 4,
        "prepass_jumps": 16, "nr_refine_iters": 3,
        "lod_schedule": (6, 12, 18)}
rows = {"ckpt": CKPT}
for name, gv in (("gate0", 0.0), ("gate1", 1.0)):
    rgb, nrm, alpha = tps.render_image_sphere_traced_fast(
        params, grid, Kv, tfv, 200, 200, 9_999_999, cfg,
        dist_field=dist_field, jump_gate_voxels=gv, **BASE)
    rgb = np.asarray(rgb).reshape(200, 200, 3)
    a = np.asarray(alpha).reshape(200, 200)
    mse = float(np.mean((rgb[m] - gt[m]) ** 2))
    times = []
    for i in range(4):
        eye = 1.3 * np.array([np.cos(0.1 * i), 0.35, np.sin(0.1 * i)])
        tf = look_at_cam_to_world(eye).astype(np.float32)
        t0 = time.perf_counter()
        tps.render_image_sphere_traced_fast(
            params, grid, K, tf, W, H, 9_999_999, cfg,
            dist_field=dist_field, jump_gate_voxels=gv, **BASE)
        times.append(round(time.perf_counter() - t0, 2))
    rows[name] = {
        "psnr_fg_200sq": round(10 * np.log10(1.0 / max(mse, 1e-12)), 2),
        "unshaded_in_mask_frac": round(float(np.mean(a[m] < 0.5)), 4),
        "frame_1080p_s": times,
        "warm_1080p_s": round(float(np.median(times[1:])), 2),
    }
    print(name, json.dumps(rows[name]), flush=True)
    with open(os.path.join(OUT, "st_gate_ab_r5.json"), "w") as fj:
        json.dump(rows, fj, indent=1)
print(json.dumps(rows), flush=True)
