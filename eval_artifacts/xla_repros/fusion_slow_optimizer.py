"""Minimized repro of the XLA:TPU optimizer-fusion pathology
(PERFORMANCE.md finding 5): an Adam update compiled INTO the same XLA
program as a gather/scatter-heavy gradient graph runs ~6-80x slower than
the identical math dispatched as two programs.

This is the reason train_step dispatches grads and update as TWO jits and
ManualAdam exists instead of optax. Retirement condition: when this script
reports fused/split < 1.5, fold the update back into one jit and prefer
optax (see tests/test_xla_canaries.py, run with `pytest -m canary`).

Measured 2026-08 on jax/jaxlib 0.9.0 + axon v5e PJRT: fused/split ~6-10x.

Exit code: 0 and prints one JSON line {"fused_ms":..,"split_ms":..,
"ratio":..}.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

L, C, N = 24, 2 ** 18, 200_000


def init():
    k = jax.random.PRNGKey(0)
    return {
        "table": jax.random.uniform(k, (L, 2, C)) * 1e-2,
        "w": jax.random.normal(jax.random.fold_in(k, 1), (48, 32)) * 0.1,
        "scale": jnp.ones((1,)),  # small leaf alongside the big table
    }


def loss_fn(params, idx, bary):
    # gather -> interpolate -> tiny matmul -> scalar loss; backward emits
    # the table scatter-add (the shape XLA's fusion cost model mishandles)
    f0 = jnp.take(params["table"][:, 0, :].reshape(-1), idx)  # [L,4,N]
    f1 = jnp.take(params["table"][:, 1, :].reshape(-1), idx)
    lv = jnp.stack([jnp.sum(bary * f0, 1), jnp.sum(bary * f1, 1)], 1)
    x = lv.reshape(L * 2, N).T  # [N, 48]
    y = jnp.tanh(x @ params["w"]) * params["scale"]
    return jnp.sum(y ** 2) / N


def adam(params, m, v, grads, lr=1e-3):
    new_m = jax.tree.map(lambda a, g: 0.9 * a + 0.1 * g, m, grads)
    new_v = jax.tree.map(lambda a, g: 0.99 * a + 0.01 * g * g, v, grads)
    new_p = jax.tree.map(
        lambda p, mm, vv: p - lr * mm / (jnp.sqrt(vv) + 1e-15),
        params, new_m, new_v)
    return new_p, new_m, new_v


@jax.jit
def grads_only(params, idx, bary):
    return jax.value_and_grad(loss_fn)(params, idx, bary)


@jax.jit
def update_only(params, m, v, grads):
    return adam(params, m, v, grads)


@jax.jit
def fused(params, m, v, idx, bary):
    loss, grads = jax.value_and_grad(loss_fn)(params, idx, bary)
    return adam(params, m, v, grads) + (loss,)


def timed(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    return best


def main():
    params = init()
    m = jax.tree.map(jnp.zeros_like, params)
    v = jax.tree.map(jnp.zeros_like, params)
    k = jax.random.PRNGKey(2)
    idx = jax.random.randint(k, (L, 4, N), 0, L * C, dtype=jnp.int32)
    bary = jax.random.uniform(jax.random.fold_in(k, 1), (L, 4, N))

    def split_step(params, m, v, idx, bary):
        loss, grads = grads_only(params, idx, bary)
        return update_only(params, m, v, grads) + (loss,)

    t_split = timed(split_step, params, m, v, idx, bary)
    t_fused = timed(fused, params, m, v, idx, bary)
    out = {"split_ms": round(t_split * 1e3, 1),
           "fused_ms": round(t_fused * 1e3, 1),
           "ratio": round(t_fused / t_split, 2),
           "pathology_present": t_fused / t_split > 1.5}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
