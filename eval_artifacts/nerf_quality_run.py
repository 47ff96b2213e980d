"""Permuto-NeRF pipeline at reference scale: end-metric evidence.

train_nerf with the flagship encoding (capacity 2^18, 24 levels) on the
synthetic posed scene, 4000 iters, PSNR on a held-out same-distribution
view (fibonacci index between training cameras). The NeRF pipeline is
mask-free by default -> the fg NerfHash learns object AND background.
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from permuto_sdf_tpu.train import train_nerf as tn
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel
from permuto_sdf_tpu.datasets.tensor_reel import TensorReel, look_at_cam_to_world
from permuto_sdf_tpu.eval.metrics import psnr, ssim
import imageio.v2 as imageio

OUT = "/root/repo/eval_artifacts"
NR_ITERS = 4000

reel = make_synthetic_reel(nr_views=24, width=200, height=200)
cfg = tn.NerfTrainConfig(iter_finish_training=NR_ITERS)

t0 = time.perf_counter()
params, grid, hist = tn.train(reel, cfg, nr_iters=NR_ITERS, log_every=500)
train_min = (time.perf_counter() - t0) / 60
print(f"trained in {train_min:.1f} min", flush=True)

# held-out view between training cameras (same generator, index 8.5)
import permuto_sdf_tpu.datasets.synthetic as syn
golden = np.pi * (3.0 - np.sqrt(5.0))
i_frac, W = 8.5, 200
f = 0.5 * W / np.tan(np.radians(32.0) / 2)
K = np.array([[f, 0, W / 2], [0, f, W / 2], [0, 0, 1]], np.float32)
zf = 0.8 * (1.0 - 2.0 * (i_frac + 0.5) / 24)
r = np.sqrt(1.0 - zf * zf)
eye = 1.3 * np.array([r * np.cos(golden * i_frac), zf, r * np.sin(golden * i_frac)])
tf = look_at_cam_to_world(eye).astype(np.float32)
gt, mask = syn._render_view(K, tf, W, W)

test_reel = TensorReel(
    rgb=jax.numpy.asarray(gt[None]), mask=None,
    K=jax.numpy.asarray(K[None]), tf_world_cam=jax.numpy.asarray(tf[None]))
rgb, alpha = tn.render_image(params, grid, test_reel, 0, NR_ITERS, cfg)
imageio.imwrite(os.path.join(OUT, "nerf_heldout.png"),
                (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
imageio.imwrite(os.path.join(OUT, "nerf_heldout_gt.png"),
                (np.clip(gt, 0, 1) * 255).astype(np.uint8))

m = mask.astype(bool).reshape(W, W)
mse_fg = float(np.mean((rgb[m] - gt[m]) ** 2))
result = {
    "pipeline": "train_nerf (permuto-NeRF), flagship encoding",
    "nr_iters": NR_ITERS, "train_minutes": round(train_min, 1),
    "heldout_psnr_full": float(psnr(rgb, gt)),
    "heldout_ssim_full": float(ssim(rgb, gt)),
    "heldout_psnr_foreground": float(10 * np.log10(1.0 / max(mse_fg, 1e-12))),
    "final_train_loss": float(hist[-1][1]),
}
with open(os.path.join(OUT, "nerf_quality_run.json"), "w") as fjson:
    json.dump(result, fjson, indent=1)
print(json.dumps(result), flush=True)
