import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, time, json, os
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel, scene_sdf
from permuto_sdf_tpu.eval.metrics import psnr, ssim
from permuto_sdf_tpu.ops.marching_cubes import marching_tetrahedra, extract_mesh_from_sdf_fn
from permuto_sdf_tpu.eval.chamfer import point_mesh_chamfer
from permuto_sdf_tpu.models.fields import sdf_apply

reel = make_synthetic_reel(nr_views=24, width=128, height=128, with_mask=True)
cfg = tps.PermutoSDFTrainConfig(
    with_mask=True, capacity=2**16, nr_levels=16,
    nr_iter_sphere_fit=500, sphere_init_points=8192,
    sdf_nr_iters_for_c2f=2000, forced_variance_finish_iter=5000,
    iter_start_reduce_curv=4000, warmup_iters=500,
    lr_milestones=(5000, 6500), grid_nr_random_samples=65536,
)
t0 = time.perf_counter()
params, grid, hist = tps.train(reel, cfg, nr_iters=7000, log_every=250)
train_time = time.perf_counter() - t0
print(f'trained 7000 iters in {train_time/60:.1f} min', flush=True)

it_eval = 7000 - cfg.nr_iter_sphere_fit
rgb, nrm, alpha = tps.render_image(params, grid, reel.K[0], reel.tf_world_cam[0],
                                   reel.width, reel.height, it_eval, cfg)
gt = np.asarray(reel.rgb[0]); mask = np.asarray(reel.mask[0])
p_full = float(psnr(rgb, gt)); p_fg = float(psnr(rgb*mask, gt*mask)); s = float(ssim(rgb, gt))
import imageio.v2 as imageio
imageio.imwrite('/root/repo/eval_artifacts/synthetic_pred.png', (np.clip(rgb,0,1)*255).astype(np.uint8))
imageio.imwrite('/root/repo/eval_artifacts/synthetic_gt.png', (np.clip(gt,0,1)*255).astype(np.uint8))
imageio.imwrite('/root/repo/eval_artifacts/synthetic_normals.png', (np.clip((nrm+1)/2,0,1)*255).astype(np.uint8))

@jax.jit
def sdf_fn(pts):
    return sdf_apply(params['sdf'], pts, 9_999_999, cfg.sdf_model)[0]
Vp, Fp = extract_mesh_from_sdf_fn(sdf_fn, 128, -0.5, 0.5)
ax = np.linspace(-0.5, 0.5, 128, dtype=np.float32)
g = np.stack(np.meshgrid(ax, ax, ax, indexing='ij'), -1)
sdf_gt = np.asarray(scene_sdf(jnp.asarray(g.reshape(-1,3)))).reshape(128,128,128)
Vg, Fg = marching_tetrahedra(sdf_gt, 0.0, origin=(-0.5,)*3, spacing=(1/127.,)*3)
ch, a2b, b2a = point_mesh_chamfer(Vp, Fp, Vg, Fg, nr_samples=100000)
result = {"psnr": round(p_full,2), "psnr_fg": round(p_fg,2), "ssim": round(s,4),
          "chamfer": round(ch,5), "train_min": round(train_time/60,1), "pred_verts": len(Vp)}
print(json.dumps(result), flush=True)
with open('/root/repo/eval_artifacts/synthetic_eval.json','w') as f:
    json.dump(result, f)
