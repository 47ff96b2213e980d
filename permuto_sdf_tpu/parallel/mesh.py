"""Device mesh construction for ray-parallel training.

The reference is strictly single-process single-GPU (SURVEY.md §2.3 — no
distributed primitives anywhere in its tree); multi-chip scale-out is a NEW
capability of this framework, layered under the same training API:

- a 1-D ``Mesh`` over all local devices with axis ``"rays"``;
- ray batches are sharded along it (rays are embarrassingly parallel);
- hash tables / MLPs / occupancy grid are replicated, gradients reduced
  with ``psum`` over ICI (see data_parallel.py).

For ~10M-parameter fields no TP/PP/EP is warranted — that is a deliberate
design decision, not an omission: the model fits comfortably in one chip's
HBM and the batch dimension (rays x samples) dominates.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


RAY_AXIS = "rays"


def device_count() -> int:
    return jax.device_count()


def make_ray_mesh(nr_devices: int | None = None) -> Mesh:
    """1-D mesh over the first ``nr_devices`` devices (default: all)."""
    devs = jax.devices()[: nr_devices or jax.device_count()]
    return Mesh(np.asarray(devs), (RAY_AXIS,))
