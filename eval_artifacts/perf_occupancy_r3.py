"""Finding 21 (VERDICT r2 item 3a): occupancy-update cost and the async
bound.

On a single chip, device execution is serial: dispatching the update
asynchronously cannot overlap it with train-step compute, so "async the
update" has an upper bound of ~0 on 1 chip (the host already dispatches
without blocking — JAX async dispatch). What CAN move the number:
(a) the update's own device cost (measured here, chained grid
dependency so the transport cannot dedupe), and (b) its cadence.
This script measures the update cost and the amortized step overhead at
grid_update_every = 8 (reference cadence) vs 16/32 on the settled
operating point.
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.ops import occupancy_grid as og

cfg = tps.PermutoSDFTrainConfig()
params = tps.init_params(jax.random.PRNGKey(0), cfg, 4)
grid = og.make_occupancy_grid(cfg.grid)
it = jnp.asarray(10_000)
inv_s = jnp.asarray(2981.0)

# warm + chained measurement: each update consumes the previous grid and a
# fresh key, so no two dispatches are identical (axon dedupe rule)
key = jax.random.PRNGKey(1)
key, k = jax.random.split(key)
grid = tps.occupancy_update(params, grid, k, it, inv_s, cfg)
float(grid.occupancy.sum())  # host fetch = real sync

# NOTE: sync via a host FETCH of a value data-dependent on the whole
# chain, not jax.block_until_ready — on the axon remote transport
# block_until_ready was observed to return without waiting for device
# completion (first measurement read 0.4 ms/update, ~600x below the r2
# device-trace number; the fetch-synced number is the honest one).
N = 20
best = None
for _ in range(3):
    t0 = time.perf_counter()
    g = grid
    for i in range(N):
        key, k = jax.random.split(key)
        g = tps.occupancy_update(params, g, k, it + i, inv_s, cfg)
    float(g.occupancy.sum())  # host fetch = real sync
    w = (time.perf_counter() - t0) / N
    best = w if best is None else min(best, w)

out = {
    "occupancy_update_ms": round(best * 1000, 1),
    "amortized_ms_per_iter": {
        "every_8_(reference_cadence)": round(best * 1000 / 8, 1),
        "every_16": round(best * 1000 / 16, 1),
        "every_32": round(best * 1000 / 32, 1),
    },
    "async_overlap_bound_single_chip": 0.0,
    "note": "device execution is serial on one chip; JAX already "
            "dispatches asynchronously, so the only levers are update "
            "cost and cadence. In DP mode the probe evals are sharded "
            "over the mesh (make_dp_occupancy_update).",
}
OUT = os.environ.get("EVAL_OUT", "/root/repo/eval_artifacts")
os.makedirs(OUT, exist_ok=True)
with open(os.path.join(OUT, "perf_occupancy_r3.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
