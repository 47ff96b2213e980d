"""permuto_sdf_tpu — a TPU-native (JAX/XLA/Pallas) neural-surface-reconstruction
framework with the capabilities of RaduAlexandru/permuto_sdf.

Layer map (TPU-first redesign, not a port):

- ``ops``      — the compute kernels: permutohedral hash encoding (pure-jnp
                 reference + Pallas fused kernel), spherical harmonics, ray
                 primitives (sphere/AABB), occupancy grid, ray samplers,
                 volume-rendering math, sphere tracing, marching cubes.
- ``models``   — field models as functional param-pytrees: SDF, RGB
                 (Lipschitz MLP), NerfHash (fg/bg NeRF), Colorcal, cameras.
- ``parallel`` — device-mesh creation + sharded train steps (pjit/shard_map,
                 psum gradient reduction). The reference is single-GPU;
                 multi-chip data-parallelism over rays is a new capability.
- ``train``    — training pipelines: train_sdf_from_mesh, train_4d_sdf,
                 train_nerf, train_permuto_sdf; schedules; checkpointing.
- ``datasets`` — tensor reel (device-resident image stack) + loaders + mesh
                 sampling.
- ``eval``     — Chamfer (DTU protocol) and PSNR/SSIM evaluation.

Everything under a train/render step is jit-compiled with static shapes:
the reference's atomicAdd-packed CSR ray-sample batches (RaySamplesPacked.cu)
are replaced by dense ``[nr_rays, max_samples]`` layouts with validity masks,
which XLA maps onto the MXU/VPU without dynamic allocation.
"""

__version__ = "0.1.0"
