"""Round-4 sphere-traced 1080p A/B (VERDICT r3 item 6).

The r3 warm frame was 10.6 s at 40.3 dB (bench_st_1080p.json) — measured
with the bf16-pair-packed gathers. Two r4 levers were never A/B'd on the
chip:

1. row-2 f32 table gathers (finding 23, 4.29 vs 7.12 ns/instance) are
   now the default encode path — the march/refine/shade stages are all
   gather-instance-bound, so the frame should shrink ~proportionally.
2. ``lod_schedule`` per-round LOD ramps (built r3, never chip-A/B'd):
   early rounds march at very coarse LOD (cheap, every ray), later
   rounds sharpen; refine stays full-res.

Protocol matches bench_st_1080p.py: per variant, two 4-eye orbit passes
(pass 2 = warm number), 200^2 held-out fg PSNR as the quality guard.
Writes eval_artifacts/bench_st_1080p_r4.json and, if a variant beats the
r3 winner at >= its PSNR, updates the headline in bench_st_1080p.json is
left alone — the r4 file is the record.
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

W = int(os.environ.get("ST_W", "1920"))
H = int(os.environ.get("ST_H", "1080"))
f = 0.5 * W / np.tan(np.radians(32.0) / 2)
K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

BASE = {"nr_rounds": 3, "iters_per_round": 5, "jump_substeps": 4,
        "prepass_jumps": 16}

VARIANTS = {
    # the r3 winner EXACTLY (bf16-packed gathers) — the in-session
    # baseline: transport-session overhead varies ~5x across sessions
    # (finding 27), so the r3 absolute 10.6 s is only comparable to this
    "r3_packed_baseline": dict(BASE, packed=True),
    # r3 winner settings re-measured on the r4 (row-gather) encode path
    "r4_row_default": dict(BASE),
    # per-round LOD ramps: march most rays at very coarse LOD
    "lod_sched_4_8_12": dict(BASE, lod_schedule=(4, 8, 12)),
    "lod_sched_6_12_18": dict(BASE, lod_schedule=(6, 12, 18)),
    # spend the saved time on one extra round at the coarse end
    "lod_sched_4_6_8_12_4r": dict(BASE, nr_rounds=4, iters_per_round=4,
                                  lod_schedule=(4, 6, 8, 12)),
}
if os.environ.get("ST_SMOKE"):
    VARIANTS = {"r4_row_default": dict(BASE),
                "r3_packed_baseline": dict(BASE, packed=True),
                "lod_sched_4_8_12": dict(BASE, lod_schedule=(4, 8, 12))}

Kv, tfv = syn.spiral_camera(8.5, 200, 200, 1.3, 32.0, 24)
gt, mask = syn._render_view(Kv, tfv, 200, 200)
m = mask.astype(bool).reshape(200, 200)

import dataclasses

rows = {}
for name, kw in VARIANTS.items():
    kw = dict(kw)
    vcfg = (dataclasses.replace(cfg, table_row_gather=False)
            if kw.pop("packed", False) else cfg)
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
    with open(os.path.join(OUT, "bench_st_1080p_r4.json"), "w") as fj:
        json.dump(rows, fj, indent=1)

rows["r3_reference_point"] = {"warm_frame_seconds": 10.62,
                              "psnr_fg_200sq": 40.33,
                              "note": "bf16-packed gathers, fixed lod 12"}
with open(os.path.join(OUT, "bench_st_1080p_r4.json"), "w") as fj:
    json.dump(rows, fj, indent=1)
print(json.dumps(rows), flush=True)
