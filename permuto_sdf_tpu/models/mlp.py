"""Functional MLPs with the reference's init scheme, as param pytrees.

Init scheme: the reference initializes every Linear with
``leaky_relu_init(negative_slope=0.0)`` — gain ``sqrt(2/(1+slope^2))``,
std ``gain*sqrt(2/(fan_in+fan_out))``, weights ~ U(-std*sqrt(3), std*sqrt(3)),
zero bias — and re-initializes the last layer with slope 1 (gain 1) when it
is a linear output head (``/root/reference/permuto_sdf_py/utils/
common_utils.py:248-323``, applied at ``models/models.py:162-163``).

LipshitzMLP (arXiv 2202.08345, reference ``models/models.py:54-129``): each
layer owns a learnable Lipschitz bound ``c_i`` initialized to
``2 * max_row_abs_sum``; at every forward the weight rows are rescaled by
``min(1, softplus(c_i)/absrowsum)``; ``prod_i softplus(c_i)`` is the
regularizer term used by train_permuto_sdf.

All matmuls run with ``preferred_element_type=float32`` so XLA targets the
MXU with f32 accumulation.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


def _linear_std(fan_in: int, fan_out: int, negative_slope: float) -> float:
    gain = np.sqrt(2.0 / (1.0 + negative_slope ** 2))
    return gain * np.sqrt(2.0 / (fan_in + fan_out))


def init_linear(key, fan_in: int, fan_out: int, negative_slope: float = 0.0):
    """One Linear layer, reference init. Weight stored [fan_in, fan_out]."""
    std = _linear_std(fan_in, fan_out, negative_slope)
    bound = std * np.sqrt(3.0)
    w = jax.random.uniform(key, (fan_in, fan_out), minval=-bound, maxval=bound)
    return {"w": w, "b": jnp.zeros((fan_out,))}


def linear_apply(p, x):
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]


def init_mlp(key, dims: Sequence[int], last_layer_linear_init: bool = True):
    """GELU MLP with layer sizes ``dims = [in, h1, ..., out]``."""
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i, k in enumerate(keys):
        is_last = i == len(dims) - 2
        slope = 1.0 if (is_last and last_layer_linear_init) else 0.0
        layers.append(init_linear(k, dims[i], dims[i + 1], slope))
    return layers


def mlp_apply(layers, x):
    """Linear+GELU stack; last layer linear."""
    for i, p in enumerate(layers):
        x = linear_apply(p, x)
        if i != len(layers) - 1:
            x = jax.nn.gelu(x)
    return x


def init_lipshitz_mlp(key, in_channels: int, out_channels_per_layer: Sequence[int],
                      last_layer_linear: bool = True):
    keys = jax.random.split(key, len(out_channels_per_layer))
    layers = []
    fan_in = in_channels
    for i, (k, fan_out) in enumerate(zip(keys, out_channels_per_layer)):
        is_last = i == len(out_channels_per_layer) - 1
        slope = 1.0 if (is_last and last_layer_linear) else 0.0
        lin = init_linear(k, fan_in, fan_out, slope)
        # c_i init: 2 * max over output rows of sum_j |w_ij|
        max_w = jnp.max(jnp.sum(jnp.abs(lin["w"]), axis=0))
        layers.append({**lin, "c": jnp.ones((1,)) * max_w * 2.0})
        fan_in = fan_out
    return layers


def lipshitz_mlp_apply(layers, x, last_layer_linear: bool = True):
    for i, p in enumerate(layers):
        softplus_c = jax.nn.softplus(p["c"])
        absrowsum = jnp.sum(jnp.abs(p["w"]), axis=0)  # per output unit
        scale = jnp.clip(softplus_c / absrowsum, max=1.0)
        w = p["w"] * scale[None, :]
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) + p["b"]
        if not (i == len(layers) - 1 and last_layer_linear):
            x = jax.nn.gelu(x)
    return x


def lipshitz_bound_full(layers) -> jnp.ndarray:
    """prod_i softplus(c_i) — the Lipschitz regularizer (models.py:102-107)."""
    bound = jnp.ones(())
    for p in layers:
        bound = bound * jax.nn.softplus(p["c"][0])
    return bound
