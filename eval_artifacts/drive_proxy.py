import sys; sys.path.insert(0, "/root/repo")
import jax, time
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel
reel = make_synthetic_reel(nr_views=4, width=64, height=64, with_mask=True)
base = dict(with_mask=True, capacity=2**14, nr_levels=8, nr_rays=512,
            nr_iter_sphere_fit=20, sphere_init_points=2048,
            sdf_nr_iters_for_c2f=100, forced_variance_finish_iter=200,
            iter_start_reduce_curv=150, warmup_iters=20,
            lr_milestones=(150, 180), grid_nr_random_samples=4096)
for K in (None, 3):
    cfg = tps.PermutoSDFTrainConfig(**base, imp_sampling_max_levels=K)
    t0 = time.perf_counter()
    params, grid, hist = tps.train(reel, cfg, nr_iters=120, log_every=100,
                                   dynamic_nr_rays=False)
    print(f"proxy max_levels={K}: 120 iters in {time.perf_counter()-t0:.1f}s OK")
