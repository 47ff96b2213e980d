"""Profiling helpers — TIME_START/TIME_END equivalents.

The reference wraps EasyPBR's Profiler with ``torch.cuda.synchronize``
(``/root/reference/permuto_sdf_py/utils/common_utils.py:33-42``). The JAX
equivalents here force device completion via value fetches (NOTE: on some
remote TPU transports ``block_until_ready`` returns before execution
completes, so ``sync`` reduces-and-fetches a scalar) and accumulate named
section stats. ``jax.profiler`` trace capture is exposed for deep dives.
"""

from __future__ import annotations

import collections
import contextlib
import time

import jax
import jax.numpy as jnp

_STATS = collections.defaultdict(lambda: [0, 0.0])  # name -> [count, total_s]
_STARTS = {}
ENABLED = False


def sync(x=None):
    """Force completion of outstanding device work."""
    if x is not None:
        leaves = jax.tree_util.tree_leaves(x)
        if leaves:
            float(jnp.sum(leaves[0].ravel()[0]))
            return
    jax.block_until_ready(jnp.zeros(()) + 0)


def TIME_START(name: str):
    if ENABLED:
        sync()
        _STARTS[name] = time.perf_counter()


def TIME_END(name: str, value=None):
    if ENABLED and name in _STARTS:
        sync(value)
        dt = time.perf_counter() - _STARTS.pop(name)
        _STATS[name][0] += 1
        _STATS[name][1] += dt


@contextlib.contextmanager
def timed(name: str, value_fn=None):
    TIME_START(name)
    yield
    TIME_END(name, value_fn() if value_fn else None)


def report() -> str:
    lines = ["profiler sections:"]
    for name, (count, total) in sorted(_STATS.items()):
        lines.append(f"  {name}: {count} calls, {total*1e3/max(count,1):.2f} ms avg")
    return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    """jax.profiler trace capture (viewable in TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
