"""Sphere-traced 1080p frame time on the TRAINED flagship checkpoint
(VERDICT r2 item 6: 9.4 s -> target <= 3 s single-chip).

Renders warm 1920x1080 frames (small camera motion between frames, like
the viewer) under a settings matrix:
- v0 defaults (5 rounds x 3 iters, round0 LOD6, march LOD12, refine 4)
- v1 fewer host syncs (3 rounds x 5 iters — each round's count fetch is a
  ~113 ms transport round-trip + pipeline bubble)
- v2 LOD ramp (4,6,8,12) — early rounds carry most rays, so their
  per-point encode cost dominates; fine levels only once the survivors
  are near the surface
- v3 = v1 + v2 combined

Each variant renders 3 warm frames; the winner's settings + time go into
bench_st_1080p.json, and its 200^2 fg PSNR on the held-out view is
checked against the diagnosis number so speed never silently buys quality.
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

W, H = 1920, 1080
f = 0.5 * W / np.tan(np.radians(32.0) / 2)
K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

variants = {
    "v0_defaults": {},
    "v1_3x5_rounds": {"nr_rounds": 3, "iters_per_round": 5},
    "v2_lod_ramp": {"lod_schedule": (4, 6, 8, 12)},
    "v3_ramp_3x5": {"nr_rounds": 3, "iters_per_round": 5,
                    "lod_schedule": (4, 8, 12)},
}

results = {}
for name, kw in variants.items():
    times = []
    for i in range(4):
        eye = 1.3 * np.array([np.cos(0.1 * i), 0.35, np.sin(0.1 * i)])
        tf = look_at_cam_to_world(eye).astype(np.float32)
        t0 = time.perf_counter()
        rgb, nrm, a = tps.render_image_sphere_traced_fast(
            params, grid, K, tf, W, H, 9_999_999, cfg,
            dist_field=dist_field, **kw)
        times.append(round(time.perf_counter() - t0, 2))
    warm = float(np.median(times[1:]))
    results[name] = {"frame_seconds": times, "warm": warm,
                     "hit_frac": round(float(np.asarray(a).mean()), 4)}
    print(name, json.dumps(results[name]), flush=True)

best = min(results, key=lambda k: results[k]["warm"])

# quality check of the winner at 200^2 on the held-out view i8.5
def heldout_view(i_frac, width=200, height=200, radius=1.3, fov_deg=32.0,
                 nr_views=24):
    fv = 0.5 * width / np.tan(np.radians(fov_deg) / 2)
    Kv = np.array([[fv, 0, width / 2], [0, fv, height / 2], [0, 0, 1]],
                  np.float32)
    golden = np.pi * (3.0 - np.sqrt(5.0))
    zf = 0.8 * (1.0 - 2.0 * (i_frac + 0.5) / nr_views)
    r = np.sqrt(max(1.0 - zf * zf, 1e-6))
    th = golden * i_frac
    eye = radius * np.array([r * np.cos(th), zf, r * np.sin(th)])
    return Kv, look_at_cam_to_world(eye).astype(np.float32)


Kv, tfv = heldout_view(8.5)
gt, mask = syn._render_view(Kv, tfv, 200, 200)
m = mask.astype(bool).reshape(200, 200)
rgb_q, _, _ = tps.render_image_sphere_traced_fast(
    params, grid, Kv, tfv, 200, 200, 9_999_999, cfg,
    dist_field=dist_field, **variants[best])
mse = float(np.mean((rgb_q[m] - np.asarray(gt)[m]) ** 2))
psnr_best = float(10 * np.log10(1.0 / max(mse, 1e-12)))

out = {
    "resolution": f"{W}x{H}",
    "checkpoint": "full_run 30k (trained flagship)",
    "variants": results,
    "winner": best,
    "winner_settings": variants[best],
    "warm_frame_seconds": results[best]["warm"],
    "winner_psnr_foreground_200sq_i8.5": round(psnr_best, 2),
    "r2_reference_point": 9.4,
}
with open(os.path.join(OUT, "bench_st_1080p.json"), "w") as fj:
    json.dump(out, fj, indent=1)
print(json.dumps(out), flush=True)
