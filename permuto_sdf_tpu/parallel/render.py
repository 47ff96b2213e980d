"""Data-parallel RENDERING over the device mesh.

The reference renders strictly on one GPU (``src/PermutoSDF.cu:75-78``);
multi-chip rendering is this framework's own §5.8 capability: rays are
embarrassingly parallel, so a frame (or eval sweep) is sharded over the
1-D ``"rays"`` mesh with params / occupancy grid / distance field
replicated, and each device renders its slice. No collectives are needed
in the forward render at all — the only cross-device traffic is the
(driver-side) result concatenation.

Load balancing: rays are assigned to devices in a STRIDED interleave
(ray ``i`` -> device ``i % D``) rather than contiguous bands — foreground
cost concentrates in the image center, and interleaving spreads it evenly
across devices (the same reasoning as the reference's random pixel reel
sampling, just deterministic).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from permuto_sdf_tpu.parallel.mesh import RAY_AXIS


def interleave_shard(x, n_devices: int):
    """[N, ...] -> [D, N/D, ...] with ray ``i`` at slot ``[i % D, i // D]``.

    Requires N % D == 0 (pad first). The strided assignment load-balances
    image-center foreground across devices."""
    n = x.shape[0]
    assert n % n_devices == 0, (n, n_devices)
    return jnp.moveaxis(x.reshape(n // n_devices, n_devices, *x.shape[1:]), 1, 0)


def uninterleave(x):
    """Inverse of :func:`interleave_shard`: [D, C, ...] -> [C*D, ...]."""
    d, c = x.shape[0], x.shape[1]
    return np.moveaxis(np.asarray(x), 0, 1).reshape(c * d, *x.shape[2:])


@functools.lru_cache(maxsize=None)
def _dp_renderer_cache(render_fn, mesh, n_outputs, static_kwargs,
                       aux_sharded: bool, tree_output: bool):
    kw = dict(static_kwargs)
    strip = lambda t: jax.tree_util.tree_map(lambda x: x[0], t)
    expand = lambda t: jax.tree_util.tree_map(lambda x: x[None], t)

    def body(params, grid, aux_tree, origins, dirs, scalars):
        aux = strip(aux_tree) if aux_sharded else aux_tree
        outs = render_fn(params, grid, aux, origins[0], dirs[0],
                         *scalars, **kw)
        if tree_output:
            return expand(outs)
        return tuple(o[None] for o in outs)

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS) if aux_sharded else P(),
                  P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=P(RAY_AXIS) if tree_output else (P(RAY_AXIS),) * n_outputs,
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_ray_renderer(render_fn, mesh, n_outputs: int | None = 3,
                         aux_sharded: bool = False, tree_output: bool = False,
                         **static_kwargs):
    """Build a jitted multi-chip ray renderer.

    ``render_fn(params, grid, aux_tree, origins [C,3], dirs [C,3],
    *scalars, **static_kwargs)`` must be a PURE per-device function (a
    stable, hashable callable — module-level or lru-cached) returning a
    tuple of ``n_outputs`` arrays with leading dim C. The returned callable
    takes ``(params, grid, aux_tree, origins [D,C,3], dirs [D,C,3],
    scalars_tuple)`` with rays pre-sharded via :func:`interleave_shard`
    and returns [D, C, ...] outputs.

    ``aux_tree`` carries extra arrays — replicated by default (e.g. a
    Chebyshev distance field; pass ``None`` when unused), or RAY-SHARDED
    leaves ([D, C, ...] each) with ``aux_sharded=True`` (used to pipe a
    stage-1 result into a stage-2 renderer, e.g. the two-program LOD eval
    render). ``tree_output=True`` returns an arbitrary pytree whose leaves
    are all ray-leading (sharded with a P(RAY_AXIS) prefix spec) instead
    of a tuple of ``n_outputs`` arrays.
    """
    return _dp_renderer_cache(render_fn, mesh, n_outputs,
                              tuple(sorted(static_kwargs.items())),
                              aux_sharded, tree_output)


def dp_render_chunked(renderer, mesh, params, grid, aux_tree, origins, dirs,
                      scalars, chunk: int, pad_origin=(10.0, 0.0, 0.0),
                      pad_dir=(1.0, 0.0, 0.0)):
    """Drive a :func:`make_dp_ray_renderer` renderer over a full ray set in
    super-chunks of ``chunk * n_devices`` rays; returns a list of host
    arrays per output, concatenated and trimmed to the input ray count."""
    d = mesh.devices.size
    n = origins.shape[0]
    sc = chunk * d
    pad = (-n) % sc
    origins = jnp.concatenate(
        [origins, jnp.tile(jnp.asarray([pad_origin]), (pad, 1))], 0)
    dirs = jnp.concatenate(
        [dirs, jnp.tile(jnp.asarray([pad_dir]), (pad, 1))], 0)
    # dispatch every super-chunk before fetching any (async dispatch):
    # devices render chunk i+1 while the host pulls chunk i through the
    # transport (uninterleave's np.asarray is the fetch)
    pending = []
    for i in range(0, n + pad, sc):
        o = interleave_shard(origins[i : i + sc], d)
        v = interleave_shard(dirs[i : i + sc], d)
        pending.append(renderer(params, grid, aux_tree, o, v, scalars))
    outs = None
    for res in pending:
        res = [uninterleave(r) for r in res]
        if outs is None:
            outs = [[] for _ in res]
        for acc, r in zip(outs, res):
            acc.append(r)
    return [np.concatenate(acc)[:n] for acc in outs]


@functools.lru_cache(maxsize=None)
def _dp_batched_renderer_cache(render_fn, mesh, n_outputs, static_kwargs):
    kw = dict(static_kwargs)

    def body(params, grid, aux_tree, origins, dirs, scalars):
        # origins/dirs arrive [1, NC, C, 3] per device; lax.map loops the
        # NC chunks ON DEVICE — one dispatch for the whole ray set
        # (finding 27: host-loop dispatch latency through the remote
        # transport dwarfs the render; in DP it repeats PER super-chunk)
        def one(od):
            return tuple(render_fn(params, grid, aux_tree, od[0], od[1],
                                   *scalars, **kw))

        outs = jax.lax.map(one, (origins[0], dirs[0]))  # [NC, C, ...]
        return tuple(o[None] for o in outs)

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=(P(RAY_AXIS),) * n_outputs,
        check_vma=False,
    )
    return jax.jit(sharded)


def dp_render_batched(render_fn, mesh, params, grid, origins, dirs, scalars,
                      chunk: int, n_outputs: int = 3,
                      pad_origin=(10.0, 0.0, 0.0), pad_dir=(1.0, 0.0, 0.0),
                      **static_kwargs):
    """One-dispatch DP render of a full ray set: rays interleave-sharded
    over the mesh, then each device loops its [NC, chunk] slices with a
    device-side ``lax.map`` (live memory = one chunk, exactly like
    :func:`dp_render_chunked`, minus the per-super-chunk transport round
    trips). ``render_fn`` has the :func:`make_dp_ray_renderer` body
    signature with ``aux`` unused (pass-through None)."""
    d = mesh.devices.size
    n = origins.shape[0]
    sc = chunk * d
    pad = (-n) % sc
    origins = jnp.concatenate(
        [origins, jnp.tile(jnp.asarray([pad_origin]), (pad, 1))], 0)
    dirs = jnp.concatenate(
        [dirs, jnp.tile(jnp.asarray([pad_dir]), (pad, 1))], 0)
    nc = (n + pad) // sc
    # [N] -> [D, N/D, ...] (strided interleave) -> [D, NC, C, ...]
    o_sh = interleave_shard(origins, d).reshape(d, nc, chunk, 3)
    d_sh = interleave_shard(dirs, d).reshape(d, nc, chunk, 3)
    renderer = _dp_batched_renderer_cache(
        render_fn, mesh, n_outputs, tuple(sorted(static_kwargs.items())))
    outs = renderer(params, grid, None, o_sh, d_sh, scalars)
    # [D, NC, C, ...] -> [D, NC*C, ...] -> uninterleave -> [:n]
    return [uninterleave(np.asarray(o).reshape(d, nc * chunk, *o.shape[3:]))[:n]
            for o in outs]
