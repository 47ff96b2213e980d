"""ST 1080p A/B round 4b: finish the interrupted r4 sweep + <8 s candidates.

The r4 sweep (bench_st_1080p_r4.py) died after 4 of 5 variants; its
record shows the (6,12,18) per-round LOD ramp at 8.36 s / 41.0 dB vs the
in-session packed baseline 10.68 s / 40.33 dB.  This follow-up runs, in
ONE session (finding 27: cross-session dispatch overhead varies ~5x):

- ``lod_sched_6_12_18``    -- the prior winner, as the in-session anchor
- ``lod_sched_4_6_8_12_4r``-- the variant the interrupted sweep missed
- ``6_12_18_ipr4``         -- winner schedule, 4 march iters/round (12 vs 15)
- ``6_12_18_refine3``      -- winner schedule, 3 refine iters (vs 4)

Quality guard: 200^2 held-out fg PSNR vs the synthetic GT (must stay
>= 40 dB to count).  Results are merged into bench_st_1080p_r4.json.
"""
import sys, os, time, json, dataclasses
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

BASE = {"nr_rounds": 3, "iters_per_round": 5, "jump_substeps": 4,
        "prepass_jumps": 16}

VARIANTS = {
    "lod_sched_6_12_18_b": dict(BASE, lod_schedule=(6, 12, 18)),
    "lod_sched_4_6_8_12_4r": dict(BASE, nr_rounds=4, iters_per_round=4,
                                  lod_schedule=(4, 6, 8, 12)),
    "6_12_18_ipr4": dict(BASE, iters_per_round=4,
                         lod_schedule=(6, 12, 18)),
    "6_12_18_refine3": dict(BASE, nr_refine_iters=3,
                            lod_schedule=(6, 12, 18)),
}

Kv, tfv = syn.spiral_camera(8.5, 200, 200, 1.3, 32.0, 24)
gt, mask = syn._render_view(Kv, tfv, 200, 200)
m = mask.astype(bool).reshape(200, 200)

path = os.path.join(OUT, "bench_st_1080p_r4.json")
with open(path) as fj:
    rows = json.load(fj)

for name, kw in VARIANTS.items():
    kw = dict(kw)
    vcfg = cfg
    passes = []
    for p in range(2):
        times = []
        for i in range(4):
            eye = 1.3 * np.array([np.cos(0.1 * i), 0.35, np.sin(0.1 * i)])
            tf = look_at_cam_to_world(eye).astype(np.float32)
            t0 = time.perf_counter()
            rgb, nrm, a = tps.render_image_sphere_traced_fast(
                params, grid, K, tf, W, H, 9_999_999, vcfg,
                dist_field=dist_field, **kw)
            times.append(round(time.perf_counter() - t0, 2))
        passes.append(times)
    rgb_q, _, _ = tps.render_image_sphere_traced_fast(
        params, grid, Kv, tfv, 200, 200, 9_999_999, vcfg,
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

rows["r3_reference_point"] = {"warm_frame_seconds": 10.62,
                              "psnr_fg_200sq": 40.33,
                              "note": "bf16-packed gathers, fixed lod 12"}
with open(path, "w") as fj:
    json.dump(rows, fj, indent=1)
print(json.dumps(rows), flush=True)
