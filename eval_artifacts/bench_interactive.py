"""Warm interactive frame rate of the sphere-traced viewer path.

The first sphere-traced frame of a session pays one-off costs (Chebyshev
distance field build, per-bucket compiles — cached persistently); the
VIEWER experience is the warm frame time. Renders one 400^2 view from the
full-run checkpoint three times and reports each frame's wall time; the
steady-state number goes in the README.

r3: runs at the DEFAULT settings (reference shading semantics, converge
threshold 2e-4, jump_substeps=4, prepass_jumps=16) — the r2 1.28 s number
used the loose 1e-3 threshold AND predates the shading-semantics fix.
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets.tensor_reel import look_at_cam_to_world

OUT = os.environ.get("EVAL_OUT", "/root/repo/eval_artifacts")
os.makedirs(OUT, exist_ok=True)
CKPT = os.path.join("/root/repo/eval_artifacts", "full_run_ckpt", "full", "30000", "models")
cfg = tps.PermutoSDFTrainConfig()
params, grid = tps.load_from_checkpoint(CKPT, cfg)

W = H = int(os.environ.get("BENCH_RES", "400"))
f = 0.5 * W / np.tan(np.radians(32.0) / 2)
K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

times = []
for i in range(4):
    # small camera motion between frames, like the interactive viewer
    eye = 1.3 * np.array([np.cos(0.1 * i), 0.35, np.sin(0.1 * i)])
    tf = look_at_cam_to_world(eye).astype(np.float32)
    t0 = time.perf_counter()
    rgb, nrm, _ = tps.render_image_sphere_traced_fast(
        params, grid, K, tf, W, H, 9_999_999, cfg)
    times.append(round(time.perf_counter() - t0, 2))
    print(f"frame {i}: {times[-1]} s", flush=True)

result = {"resolution": f"{W}x{H}", "frame_seconds": times,
          "warm_frame_seconds": float(np.median(times[1:]))}
with open(os.path.join(OUT, "bench_interactive.json"), "w") as fjson:
    json.dump(result, fjson, indent=1)
print(json.dumps(result), flush=True)
