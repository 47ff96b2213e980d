"""400^2 interactive-frame A/B: r3 defaults vs the finding-28 operating
point (LOD ramp 6/12/18 + 3 refine iters), in one session.

The r3 record is 0.83 s warm (bench_interactive.json). The viewer's
sphere mode now uses the ramp settings measured best at 1080p; this
re-measures at the viewer's 400^2 resolution with an in-session
baseline (finding 27: cross-session eval absolutes are not comparable).
Writes eval_artifacts/bench_interactive_r4.json.
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

OUT = "/root/repo/eval_artifacts"
CKPT = os.path.join(OUT, "full_run_ckpt", "full", "30000", "models")
cfg = tps.PermutoSDFTrainConfig()
params, grid = tps.load_from_checkpoint(CKPT, cfg)
dist_field = tps._cached_dist_field(cfg.grid, grid)

W = H = 400
f = 0.5 * W / np.tan(np.radians(32.0) / 2)
K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

Kv, tfv = syn.spiral_camera(8.5, 200, 200, 1.3, 32.0, 24)
gt, mask = syn._render_view(Kv, tfv, 200, 200)
m = mask.astype(bool).reshape(200, 200)

VARIANTS = {
    # function defaults = what the viewer used before this round
    "r3_defaults": {},
    # finding-28 operating point (the viewer's sphere mode now)
    "ramp_6_12_18_refine3": dict(nr_rounds=3, iters_per_round=5,
                                 nr_refine_iters=3,
                                 lod_schedule=(6, 12, 18)),
}

rows = {}
for name, kw in VARIANTS.items():
    frames = []
    for i in range(6):
        eye = 1.3 * np.array([np.cos(0.1 * i), 0.35, np.sin(0.1 * i)])
        tf = look_at_cam_to_world(eye).astype(np.float32)
        t0 = time.perf_counter()
        tps.render_image_sphere_traced_fast(
            params, grid, K, tf, W, H, 9_999_999, cfg,
            dist_field=dist_field, **kw)
        frames.append(round(time.perf_counter() - t0, 3))
    rgb_q, _, _ = tps.render_image_sphere_traced_fast(
        params, grid, Kv, tfv, 200, 200, 9_999_999, cfg,
        dist_field=dist_field, **kw)
    mse = float(np.mean((rgb_q[m] - np.asarray(gt)[m]) ** 2))
    rows[name] = {
        "warm_frame_seconds": float(np.median(frames[2:])),
        "frames": frames,
        "psnr_fg_200sq": round(float(10 * np.log10(1.0 / max(mse, 1e-12))), 2),
    }
    print(name, json.dumps(rows[name]), flush=True)
    with open(os.path.join(OUT, "bench_interactive_r4.json"), "w") as fj:
        json.dump(rows, fj, indent=1)
print(json.dumps(rows), flush=True)
