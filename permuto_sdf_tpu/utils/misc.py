"""Small utilities mirroring the reference's common_utils / PermutoSDF ops.

Sources: ``/root/reference/permuto_sdf_py/utils/common_utils.py`` (layout
converters, map ranges, smoothsteps, sRGB, model summary with NaN
tripwires) and the misc static ops of ``src/PermutoSDF.cu``
(``meshgrid3d``, ``update_errors_of_matching_indices``,
``low_discrepancy2d_sampling``).
"""

from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Layout converters (common_utils.py:88-136). The reference is NCHW-centric
# (torch); this framework is channels-last, but both directions are provided
# for interop.
# ---------------------------------------------------------------------------

def lin2hwc(x, height: int, width: int):
    return x.reshape(height, width, -1)


def hwc2lin(x):
    return x.reshape(-1, x.shape[-1])


def lin2nchw(x, height: int, width: int):
    return jnp.moveaxis(x.reshape(1, height, width, -1), -1, 1)


def nchw2lin(x):
    return jnp.moveaxis(x, 1, -1).reshape(-1, x.shape[1])


# ---------------------------------------------------------------------------
# Ranges / easing (common_utils.py:150-200)
# ---------------------------------------------------------------------------

def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def smootherstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return (t ** 3) * (t * (t * 6.0 - 15.0) + 10.0)


def smoothstop_n(t, n: int):
    return 1.0 - (1.0 - t) ** n


# ---------------------------------------------------------------------------
# sRGB (common_utils.py:139-145)
# ---------------------------------------------------------------------------

def srgb_to_linear(img):
    return jnp.where(img > 0.04045, ((img + 0.055) / 1.055) ** 2.4, img / 12.92)


def linear_to_srgb(img):
    return jnp.where(
        img > 0.0031308, 1.055 * (img ** (1.0 / 2.4)) - 0.055, 12.92 * img
    )


# ---------------------------------------------------------------------------
# Model summary with NaN tripwires (common_utils.py:331-407)
# ---------------------------------------------------------------------------

def summary(params, name: str = "model", file=sys.stderr) -> int:
    """Print per-leaf shapes/counts and flag NaN/Inf; returns total params."""
    total = 0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        leaf = np.asarray(leaf)
        n = leaf.size
        total += n
        flags = ""
        if np.isnan(leaf).any():
            flags += " !!NaN"
        if np.isinf(leaf).any():
            flags += " !!Inf"
        pstr = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        print(f"  {name}.{pstr}: {leaf.shape} ({n}){flags}", file=file)
    print(f"{name}: total parameters {total}", file=file)
    return total


def check_finite(tree, name: str = "tree"):
    """Raise if any leaf has NaN/Inf (the NaN tripwire as an assertion)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        leaf = np.asarray(leaf)
        if not np.isfinite(leaf).all():
            raise FloatingPointError(f"non-finite values in {name} at {path}")


# ---------------------------------------------------------------------------
# PermutoSDF.cu misc static ops
# ---------------------------------------------------------------------------

def meshgrid3d(min_val: float, max_val: float, nr_points_per_dim: int):
    """Dense [n, n, n, 3] grid of points (src/PermutoSDF.cu:234-267)."""
    ax = jnp.linspace(min_val, max_val, nr_points_per_dim)
    xx, yy, zz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    return jnp.stack([xx, yy, zz], axis=-1)


def update_errors_of_matching_indices(old_indices, old_errors, new_indices,
                                      new_errors):
    """For every old index that appears in new_indices, take the new error;
    otherwise keep the old (src/PermutoSDF.cu:206-232). Vectorized via
    searchsorted over the sorted new indices."""
    old_indices = jnp.asarray(old_indices)
    new_indices = jnp.asarray(new_indices)
    order = jnp.argsort(new_indices)
    sorted_new = new_indices[order]
    pos = jnp.searchsorted(sorted_new, old_indices)
    pos = jnp.clip(pos, 0, sorted_new.shape[0] - 1)
    found = sorted_new[pos] == old_indices
    gathered = jnp.asarray(new_errors)[order][pos]
    return jnp.where(found, gathered, jnp.asarray(old_errors))


def low_discrepancy2d_sampling(key, nr_points: int, grid: int = 16):
    """Blue-noise-ish 2D samples in [0,1]^2: stratified jittered grid with a
    random per-cell permutation (the CPU helper at src/PermutoSDF.cu:270-367
    is likewise a dart-throwing stratifier; exact sequence differs)."""
    k1, k2 = jax.random.split(key)
    cells = grid * grid
    reps = -(-nr_points // cells)
    idx = jax.random.permutation(k1, jnp.tile(jnp.arange(cells), reps))[:nr_points]
    cx = (idx % grid).astype(jnp.float32)
    cy = (idx // grid).astype(jnp.float32)
    jit = jax.random.uniform(k2, (nr_points, 2))
    return jnp.stack([(cx + jit[:, 0]) / grid, (cy + jit[:, 1]) / grid], axis=-1)
