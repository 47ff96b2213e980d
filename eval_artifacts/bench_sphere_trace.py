"""Sphere-traced rendering FPS at 1080p (BASELINE.json north star: >=30 FPS).

Times render_rays_sphere_traced on 1920x1080 rays (device-side chunks,
host transfer excluded from the per-frame loop by keeping results on
device until the end) on a trained-shape model."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.ops import occupancy_grid as og
from permuto_sdf_tpu.datasets.tensor_reel import rays_from_frame, look_at_cam_to_world

W, H = 1920, 1080
cfg = tps.PermutoSDFTrainConfig()  # flagship scale
params = tps.init_params(jax.random.PRNGKey(0), cfg, nr_cams=4)
grid = og.make_occupancy_grid(cfg.grid)
# mark a central ball occupied so rays trace realistically
n = cfg.grid_nr_voxels_per_dim
xs = (jnp.arange(n) + 0.5) / n - 0.5
X, Y, Z = jnp.meshgrid(xs, xs, xs, indexing="ij")
occ = (jnp.sqrt(X**2 + Y**2 + Z**2) < 0.3).reshape(-1)
grid = og.OccupancyGridState(values=grid.values, occupancy=occ)

K = jnp.asarray([[1100.0, 0, W / 2], [0, 1100.0, H / 2], [0, 0, 1]])
tf = jnp.asarray(look_at_cam_to_world((0.0, 0.0, -1.4)))
origins, dirs = rays_from_frame(K, tf, W, H)
CHUNK = 131072
pad = (-origins.shape[0]) % CHUNK
origins = jnp.concatenate([origins, jnp.zeros((pad, 3))], 0)
dirs = jnp.concatenate([dirs, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))], 0)
nchunks = origins.shape[0] // CHUNK
o_c = origins.reshape(nchunks, CHUNK, 3)
d_c = dirs.reshape(nchunks, CHUNK, 3)

it = jnp.asarray(999999)
def frame():
    outs = []
    for i in range(nchunks):
        rgb, nrm, w = tps.render_rays_sphere_traced(params, grid, o_c[i], d_c[i], it, cfg)
        outs.append(rgb)
    return outs

t0 = time.perf_counter(); outs = frame(); jax.block_until_ready(outs[-1])
print(f"compile+first frame: {time.perf_counter()-t0:.1f}s", flush=True)
NF = 5
t0 = time.perf_counter()
for _ in range(NF):
    outs = frame()
jax.block_until_ready(outs[-1])
dt = (time.perf_counter() - t0) / NF
print(f"sphere-traced 1080p: {dt*1000:.0f} ms/frame = {1/dt:.1f} FPS "
      f"({W*H/dt/1e6:.1f} Mrays/s)", flush=True)
