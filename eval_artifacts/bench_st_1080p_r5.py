"""ST 1080p ladder, round 5 (VERDICT r4 item 5: push < 5 s or prove the
gather floor).

In ONE session (finding 27: cross-session dispatch overhead varies):
- ``r4_winner``       — ramp (6,12,18) + 3 refine iters, the r4 record
                        (7.89 s / 40.7 dB on the r4 30k ckpt), as the
                        in-session anchor on THIS round's checkpoint
- ``shade_lod18``     — winner + shading gradient/geom_feat at 18 levels
                        (the gradient vjp is the instance-heaviest
                        shading stage; quality must hold)
- ``shade_lod12``     — coarser probe of the same lever
- ``ipr4_shade18``    — 4 march iters/round + shade 18 (compound)

Quality guard: 200^2 held-out fg PSNR (must stay >= 40 dB vs this
checkpoint's own volumetric render baseline is NOT required — the guard
is absolute PSNR vs GT, reported per variant).

Checkpoint: newest of flagship_r5_ckpt / q20_ckpt.
Writes eval_artifacts/bench_st_1080p_r5.json.
"""
import sys, os, time, json, glob
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets import synthetic as syn
from permuto_sdf_tpu.datasets.tensor_reel import look_at_cam_to_world

OUT = "/root/repo/eval_artifacts"
cands = sorted(glob.glob(os.path.join(OUT, "flagship_r5_ckpt", "*", "*",
                                      "models"))
               + glob.glob(os.path.join(OUT, "q20_ckpt", "*", "*", "models")),
               key=lambda p: (("flagship_r5_ckpt" in p),
                              int(p.split(os.sep)[-2])))
assert cands, "no r5 checkpoint found"
# prefer the flagship (most-trained) checkpoint: the 2026-08-20 morning
# runs lexicographically picked q20/8000, whose half-trained SDF floors
# the ST quality guard at ~20.5 dB regardless of shading variant
CKPT = os.environ.get("ST_CKPT", cands[-1])
print("ckpt:", CKPT, flush=True)
cfg = tps.PermutoSDFTrainConfig()
params, grid = tps.load_from_checkpoint(CKPT, cfg)
dist_field = tps._cached_dist_field(cfg.grid, grid)

W, H = 1920, 1080
f = 0.5 * W / np.tan(np.radians(32.0) / 2)
K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

BASE = {"nr_rounds": 3, "iters_per_round": 5, "jump_substeps": 4,
        "prepass_jumps": 16, "nr_refine_iters": 3,
        "lod_schedule": (6, 12, 18)}
VARIANTS = {
    "r4_winner": dict(BASE),
    "shade_lod18": dict(BASE, shade_sdf_levels=18),
    "shade_lod12": dict(BASE, shade_sdf_levels=12),
    "ipr4_shade18": dict(BASE, iters_per_round=4, shade_sdf_levels=18),
}

Kv, tfv = syn.spiral_camera(8.5, 200, 200, 1.3, 32.0, 24)
gt, mask = syn._render_view(Kv, tfv, 200, 200)
m = mask.astype(bool).reshape(200, 200)

path = os.path.join(OUT, "bench_st_1080p_r5.json")
rows = {"ckpt": CKPT}
for name, kw in VARIANTS.items():
    passes = []
    for p in range(2):
        times = []
        for i in range(4):
            eye = 1.3 * np.array([np.cos(0.1 * i), 0.35, np.sin(0.1 * i)])
            tf = look_at_cam_to_world(eye).astype(np.float32)
            t0 = time.perf_counter()
            rgb, nrm, a = tps.render_image_sphere_traced_fast(
                params, grid, K, tf, W, H, 9_999_999, cfg,
                dist_field=dist_field, **kw)
            times.append(round(time.perf_counter() - t0, 2))
        passes.append(times)
    rgb_q, _, _ = tps.render_image_sphere_traced_fast(
        params, grid, Kv, tfv, 200, 200, 9_999_999, cfg,
        dist_field=dist_field, **kw)
    mse = float(np.mean((rgb_q[m] - np.asarray(gt)[m]) ** 2))
    rows[name] = {
        "warm_frame_seconds": float(np.median(passes[1])),
        "passes": passes,
        "psnr_fg_200sq": round(float(10 * np.log10(1.0 / max(mse, 1e-12))), 2),
    }
    print(name, json.dumps(rows[name]), flush=True)
    with open(path, "w") as fj:
        json.dump(rows, fj, indent=1)
print(json.dumps(rows), flush=True)
