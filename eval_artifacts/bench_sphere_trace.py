"""Sphere-traced rendering FPS at 1080p (BASELINE.json north star: >=30 FPS).

Uses a flagship-scale model actually fitted to a sphere (the trainer's
sphere-init phase), an occupancy grid matching that geometry, and times
full 1080p frames through render_rays_sphere_traced with a forced
device->host value fetch per frame (block_until_ready is unreliable
through this environment's remote TPU transport)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.ops import occupancy_grid as og
from permuto_sdf_tpu.datasets.tensor_reel import rays_from_frame, look_at_cam_to_world
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

W, H = 1920, 1080
cfg = tps.PermutoSDFTrainConfig(  # flagship encoding scale
    nr_iter_sphere_fit=1500, sphere_init_points=30000, warmup_iters=100,
)
reel = make_synthetic_reel(nr_views=2, width=8, height=8)
t0 = time.perf_counter()
params, grid, _ = tps.train(reel, cfg, nr_iters=1500, log_every=500,
                            dynamic_nr_rays=False)
print(f"sphere-init fit: {time.perf_counter()-t0:.0f}s", flush=True)

# occupancy grid consistent with the fitted sphere (r=0.3 band)
n = cfg.grid_nr_voxels_per_dim
xs = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n - 0.5
X, Y, Z = jnp.meshgrid(xs, xs, xs, indexing="ij")
r = jnp.sqrt(X ** 2 + Y ** 2 + Z ** 2)
band = 1.3 * (jnp.sqrt(3.0) / n)
occ = (jnp.abs(r - cfg.sphere_init_radius) < band + 2.0 / n).reshape(-1)
grid = og.OccupancyGridState(values=grid.values if grid is not None else jnp.zeros(n ** 3),
                             occupancy=occ)

K = jnp.asarray([[1100.0, 0, W / 2], [0, 1100.0, H / 2], [0, 0, 1]])
tf = jnp.asarray(look_at_cam_to_world((0.0, 0.0, -1.4)))
origins, dirs = rays_from_frame(K, tf, W, H)
it = jnp.asarray(999999)
CHUNK = 262144
pad = (-origins.shape[0]) % CHUNK
origins = jnp.concatenate([origins, jnp.zeros((pad, 3))], 0)
dirs = jnp.concatenate([dirs, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))], 0)
nchunks = origins.shape[0] // CHUNK
o_c = origins.reshape(nchunks, CHUNK, 3)
d_c = dirs.reshape(nchunks, CHUNK, 3)

def frame():
    # compacted trace + compacted shading, chunked (one compiled graph)
    outs = []
    for i in range(nchunks):
        rgb, nrm, w = tps.render_rays_sphere_traced_compacted(
            params, grid, o_c[i], d_c[i], it, cfg,
            nr_rounds=5, iters_per_round=3, first_bucket_fraction=0.25,
            sdf_converged_tresh=2e-3)
        outs.append((rgb, nrm, w))
    return outs

def sync(outs):
    return float(jnp.sum(jnp.stack([o[0].sum() for o in outs])))

t0 = time.perf_counter(); outs = frame(); sync(outs)
print(f"compile+first frame: {time.perf_counter()-t0:.1f}s", flush=True)
NF = 5
t0 = time.perf_counter()
for _ in range(NF):
    outs = frame()
    sync(outs)
dt = (time.perf_counter() - t0) / NF
alpha = np.concatenate([np.asarray(o[2]).reshape(-1) for o in outs])[: W * H]
print(f"hit fraction: {float((alpha > 0.5).mean()):.3f}", flush=True)
print(f"sphere-traced 1080p: {dt*1000:.0f} ms/frame = {1/dt:.1f} FPS "
      f"({W*H/dt/1e6:.1f} Mrays/s)", flush=True)
# save a frame for visual inspection
import imageio.v2 as imageio
nrm_img = np.concatenate([np.asarray(o[1]) for o in outs])[: W * H].reshape(H, W, 3)
imageio.imwrite("/root/repo/eval_artifacts/sphere_trace_normals.png",
                (np.clip((nrm_img + 1) / 2, 0, 1) * 255).astype(np.uint8))
