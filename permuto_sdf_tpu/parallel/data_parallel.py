"""Ray-batch data parallelism via shard_map + psum over ICI.

The generic machinery that turns any pipeline's pure
``compute_loss_and_grads(params, grid, reel, key, iter_nr, cfg)`` into a
multi-chip training step:

- params / optimizer state / occupancy grid / reel: **replicated**
- per-device PRNG keys: **sharded** over the ``"rays"`` mesh axis, so each
  device draws an independent ray batch from the (replicated) reel
- gradients and loss: ``jax.lax.pmean`` over ICI
- the optimizer update runs identically on every device on the reduced
  gradients, keeping params bitwise-replicated with zero extra traffic

This replaces what a CUDA framework would do with NCCL all-reduce; XLA
lowers the ``pmean`` to ICI collectives. Single-device behavior is the
degenerate mesh of 1 (identical math).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from permuto_sdf_tpu.parallel.mesh import RAY_AXIS


def dp_keys(key, mesh: Mesh):
    """[n_devices, 2] uint32 key array, one fold per device slot."""
    n = mesh.devices.size
    return jax.random.split(key, n)


def make_dp_train_step(
    compute_loss_and_grads: Callable,
    apply_updates: Callable,
    mesh: Mesh,
    cfg,
    optimizer,
    aux_is_dict: bool = True,
    reel_sharded: bool = False,
):
    """Build a jitted multi-chip train step.

    ``compute_loss_and_grads(params, grid, reel, key, iter_nr, cfg)`` must
    return ``(loss, aux, grads)`` for one per-device ray batch (cfg should
    already hold the *per-device* nr_rays).
    ``apply_updates(params, opt_state, grads, iter_nr, cfg, optimizer)``
    returns ``(params, opt_state)``.

    ``reel_sharded=True``: the reel's image axis is SHARDED over the mesh
    (each device holds 1/D of the images — prepare with
    :func:`permuto_sdf_tpu.datasets.tensor_reel.shard_reel`) instead of
    replicated; each device samples rays only from its local shard. Ray
    gradients still pmean over ICI; no pixel data ever crosses devices.
    """
    reel_spec = P(RAY_AXIS) if reel_sharded else P()

    def _per_device(params, opt_state, grid, reel, keys, iter_nr):
        key = keys[0]  # this device's shard of the key array, shape [1, 2]
        loss, aux, grads = compute_loss_and_grads(params, grid, reel, key,
                                                  iter_nr, cfg)
        loss = jax.lax.pmean(loss, RAY_AXIS)
        grads = jax.lax.pmean(grads, RAY_AXIS)
        if aux_is_dict:
            aux = {k: jax.lax.pmean(v, RAY_AXIS) for k, v in aux.items()}
        else:
            aux = jax.lax.pmean(aux, RAY_AXIS)
        params, opt_state = apply_updates(params, opt_state, grads, iter_nr,
                                          cfg, optimizer)
        return params, opt_state, loss, aux

    sharded = shard_map(
        _per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), reel_spec, P(RAY_AXIS), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, grid, reel, keys, iter_nr):
        return sharded(params, opt_state, grid, reel, keys, iter_nr)

    return step
