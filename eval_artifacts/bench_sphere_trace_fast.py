"""Sphere-traced 1080p frame time with the host-adaptive fast path
(render_image_sphere_traced_fast): mip seed + adaptive buckets + LOD march.

Same scenario as bench_sphere_trace.py (flagship-scale model fitted to a
r=0.3 sphere, surface-band occupancy grid) so numbers are comparable to the
round-1 result (19 s/frame)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.ops import occupancy_grid as og
from permuto_sdf_tpu.datasets.tensor_reel import look_at_cam_to_world
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

W, H = 1920, 1080
cfg = tps.PermutoSDFTrainConfig(
    nr_iter_sphere_fit=1500, sphere_init_points=30000, warmup_iters=100,
)
reel = make_synthetic_reel(nr_views=2, width=8, height=8)
t0 = time.perf_counter()
params, grid, _ = tps.train(reel, cfg, nr_iters=1500, log_every=500,
                            dynamic_nr_rays=False)
print(f"sphere-init fit: {time.perf_counter()-t0:.0f}s", flush=True)

n = cfg.grid_nr_voxels_per_dim
xs = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n - 0.5
X, Y, Z = jnp.meshgrid(xs, xs, xs, indexing="ij")
r = jnp.sqrt(X ** 2 + Y ** 2 + Z ** 2)
band = 1.3 * (jnp.sqrt(3.0) / n)
occ = (jnp.abs(r - cfg.sphere_init_radius) < band + 2.0 / n).reshape(-1)
grid = og.OccupancyGridState(values=jnp.zeros(n ** 3), occupancy=occ)

K = jnp.asarray([[1100.0, 0, W / 2], [0, 1100.0, H / 2], [0, 0, 1]])
tf = jnp.asarray(look_at_cam_to_world((0.0, 0.0, -1.4)))
it = 999999

def frame(lod):
    return tps.render_image_sphere_traced_fast(
        params, grid, K, tf, W, H, it, cfg, chunk=262144,
        lod_levels=lod, sdf_converged_tresh=2e-3)

for lod in (None, 12):
    t0 = time.perf_counter(); rgb, nrm, a = frame(lod)
    print(f"lod={lod}: compile+first frame: {time.perf_counter()-t0:.1f}s "
          f"(hit fraction {float(a.mean()):.3f})", flush=True)
    NF = 3
    t0 = time.perf_counter()
    for _ in range(NF):
        rgb, nrm, a = frame(lod)
    dt = (time.perf_counter() - t0) / NF
    print(f"lod={lod}: {dt*1e3:.0f} ms/frame  ({1.0/dt:.2f} FPS) at {W}x{H}",
          flush=True)
    np.save(f"/root/repo/eval_artifacts/sphere_fast_lod{lod}.npy",
            (rgb * 255).astype(np.uint8))
