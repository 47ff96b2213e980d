"""Legacy auxiliary modules kept for API parity.

Functional equivalents of ``/root/reference/permuto_sdf_py/models/
modules.py``: the pixel pickers (``:16-162``) and frozen random-feature
positional encodings (``:241-323``). The reference's main trainers stopped
using these (reel sampling replaced pixel picking; the permutohedral
encoding replaced PE) but they remain part of the public surface, so
compact jnp versions live here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rand_pixel_picker(key, nr_pixels: int, width: int, height: int):
    """Uniform random pixel indices -> [n] linear indices (RandPixelPicker)."""
    return jax.random.randint(key, (nr_pixels,), 0, width * height)


def patch_pixel_picker(key, patch_size: int, width: int, height: int):
    """One random square patch -> linear indices [patch_size**2]
    (PatchPixelPicker)."""
    kx, ky = jax.random.split(key)
    x0 = jax.random.randint(kx, (), 0, max(width - patch_size, 1))
    y0 = jax.random.randint(ky, (), 0, max(height - patch_size, 1))
    ys = y0 + jnp.arange(patch_size)
    xs = x0 + jnp.arange(patch_size)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return (yy * width + xx).reshape(-1)


def patches_pixel_picker(key, nr_patches: int, patch_size: int,
                         width: int, height: int):
    """Several random patches (PatchesPixelPicker)."""
    keys = jax.random.split(key, nr_patches)
    idx = [patch_pixel_picker(k, patch_size, width, height) for k in keys]
    return jnp.concatenate(idx)


def patch_and_rand_pixel_picker(key, nr_rand: int, patch_size: int,
                                width: int, height: int):
    """One patch + uniform random pixels (PatchAndRandPixelPicker)."""
    k1, k2 = jax.random.split(key)
    return jnp.concatenate([
        patch_pixel_picker(k1, patch_size, width, height),
        rand_pixel_picker(k2, nr_rand, width, height),
    ])


def error_pixel_picker(key, nr_pixels: int, per_pixel_error: jnp.ndarray):
    """Sample pixels proportionally to a per-pixel error map
    (ErrorPixelPicker); used with
    :func:`permuto_sdf_tpu.utils.misc.update_errors_of_matching_indices`."""
    p = per_pixel_error.reshape(-1)
    p = p / jnp.maximum(p.sum(), 1e-12)
    return jax.random.choice(key, p.shape[0], (nr_pixels,), p=p)


def init_positional_encoding(key, in_channels: int, nr_frequencies: int,
                             sigma: float = 10.0):
    """Frozen random-feature PE (PositionalEncodingRandFeatures): a fixed
    Gaussian matrix B; encode(x) = [x, sin(2*pi*xB), cos(2*pi*xB)]."""
    B = jax.random.normal(key, (in_channels, nr_frequencies)) * sigma
    return {"B": B}


def positional_encoding_apply(params, x, concat_input: bool = True):
    proj = 2 * jnp.pi * x @ jax.lax.stop_gradient(params["B"])
    enc = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
    if concat_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def positional_encoding_output_dims(in_channels: int, nr_frequencies: int,
                                    concat_input: bool = True) -> int:
    return 2 * nr_frequencies + (in_channels if concat_input else 0)
