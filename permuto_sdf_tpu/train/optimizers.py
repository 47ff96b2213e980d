"""Hand-rolled Adam/AdamW — the framework's production optimizer.

Why not optax: on this XLA:TPU toolchain, ``optax.scale_by_adam`` inside a
training jit compiles to a pathologically slow program when the param tree
mixes the big hash tables with small leaves (measured 5 ms for an
equivalent hand-rolled update vs 9-48 s for optax on the identical tree —
see PERFORMANCE.md finding 5; the trigger correlates with optax's 0-d
count/bias-correction scalar structure feeding the fusion cost model that
also SIGILL-crashes on some of our graphs).

Semantics match the reference's ``torch.optim.AdamW(betas=(0.9, 0.99),
eps=1e-15, weight_decay=0)`` (``train_permuto_sdf.py:303``): bias-corrected
first/second moments, eps added outside the sqrt, decoupled weight decay.

The API mirrors optax (`init`/`update`) so trainers and the data-parallel
wrapper stay agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Any
    nu: Any
    count: jnp.ndarray  # shape (1,) int32 — never 0-d (layout pathology)


@dataclasses.dataclass(frozen=True)
class ManualAdam:
    """Adam with optional decoupled weight decay and a runtime lr argument.

    ``update(grads, state, params, lr)`` returns ``(new_params, new_state)``
    — note it applies the step itself (no separate apply_updates), keeping
    one tree traversal.
    """

    lr: float = 1e-3  # default; a runtime (1,)-shaped lr overrides per step
    b1: float = 0.9
    b2: float = 0.99
    eps: float = 1e-15
    weight_decay: float = 0.0

    def init(self, params) -> AdamState:
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamState(mu=zeros(), nu=zeros(), count=jnp.zeros((1,), jnp.int32))

    def update(self, grads, state: AdamState, params, lr=None):
        if lr is None:
            lr = jnp.full((1,), self.lr)
        b1, b2, eps = self.b1, self.b2, self.eps
        count = state.count + 1
        c = count.astype(jnp.float32)  # (1,)
        bias1 = 1.0 - b1 ** c  # (1,)
        bias2 = 1.0 - b2 ** c
        # fold bias correction into a single (1,)-shaped step scale:
        # update = lr * (mu/bias1) / (sqrt(nu/bias2) + eps)
        #        = (lr * sqrt(bias2)/bias1) * mu / (sqrt(nu) + eps*sqrt(bias2))
        scale = (lr * jnp.sqrt(bias2) / bias1)[0]
        eps_eff = (eps * jnp.sqrt(bias2))[0]
        lr_wd = lr * self.weight_decay

        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, grads
        )
        if self.weight_decay:
            new_params = jax.tree_util.tree_map(
                lambda p, m, v: p - scale * m / (jnp.sqrt(v) + eps_eff) - lr_wd * p,
                params, mu, nu,
            )
        else:
            new_params = jax.tree_util.tree_map(
                lambda p, m, v: p - scale * m / (jnp.sqrt(v) + eps_eff),
                params, mu, nu,
            )
        return new_params, AdamState(mu=mu, nu=nu, count=count)
