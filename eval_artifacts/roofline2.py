"""Follow-up microbenches for the round-4 instance-count levers, measured
in the PRODUCTION access pattern (idx [L, 5, N] like the encoding's
[levels, d+1, batch] layout, bary-weighted reduction as consumer):

  A. single-field feature fetch, three strategies
     (2 flat f32 gathers | 1 packed-u32 gather | 1 row-2 f32 gather),
  B. dual-field fetch (sdf+rgb words at the SAME indices):
     2 packed gathers vs 1 row-2 gather vs row-4 (two f32 pairs),
  C. backward scatter: flat into [L*C] vs per-level batched (vmap) into
     [L, C] (roofline.json shows scatter ns/instance grows with table
     span: 6.65 @2^18 vs 9.84 @24*2^18),
  D. scan-free sanity rep of the headline numbers.

Writes eval_artifacts/roofline2.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

L, V, N = 24, 4, 61440  # levels, simplex verts, sample budget
C = 2 ** 18
OUT = {"shape": {"L": L, "V": V, "N": N, "C": C}}
NI = L * V * N  # instances per encode-equivalent


def _sync():
    f = jax.jit(lambda a: a + 1)
    x = jnp.zeros((8,))
    f(x).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


SYNC = _sync()


def timed(fn, *args, reps=3):
    r = fn(*args)
    jax.block_until_ready(r)
    float(jnp.asarray(r).reshape(-1)[0])
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.asarray(r).reshape(-1)[0])
        dt = time.perf_counter() - t0 - SYNC
        best = dt if best is None else min(best, dt)
    return max(best, 1e-9)


key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (L, V, N), 0, C, dtype=jnp.int32)
off = (jnp.arange(L, dtype=jnp.int32) * C)[:, None, None]
bary = jax.random.uniform(jax.random.PRNGKey(1), (L, V, N))

tab_f = jax.random.uniform(jax.random.PRNGKey(2), (L, 2, C))  # feature-major
tab_rows = jnp.moveaxis(tab_f, 1, 2).reshape(L * C, 2)  # row layout
tab_u32 = jax.random.bits(jax.random.PRNGKey(3), (L * C,), jnp.uint32)
tab_rows4 = jax.random.uniform(jax.random.PRNGKey(4), (L * C, 4))


def scan_wrap(body, K=10):
    @jax.jit
    def run(*args):
        def step(c, k):
            return body(c, k, *args), ()
        y, _ = lax.scan(step, jnp.zeros(()), jnp.arange(K, dtype=jnp.int32))
        return y
    return run, K


def report(name, s, K, n_inst):
    ns = s / K / n_inst * 1e9
    OUT[name] = round(ns, 3)
    print(f"{name:45s}: {ns:6.2f} ns/instance-equivalent", flush=True)


# --- A. single-field fetch --------------------------------------------------
def a_two_flat(c, k, tab_f, idx):
    i = jnp.clip(idx ^ k, 0, C - 1) + off
    f0 = jnp.take(tab_f[:, 0, :].reshape(-1), i)
    f1 = jnp.take(tab_f[:, 1, :].reshape(-1), i)
    return c + (bary * f0).sum() + (bary * f1).sum()


def a_packed(c, k, tab_u32, idx):
    i = jnp.clip(idx ^ k, 0, C - 1) + off
    w = jnp.take(tab_u32, i)
    f0 = lax.bitcast_convert_type(w & jnp.uint32(0xFFFF0000), jnp.float32)
    f1 = lax.bitcast_convert_type(w << 16, jnp.float32)
    return c + (bary * f0).sum() + (bary * f1).sum()


def a_row2(c, k, tab_rows, idx):
    i = jnp.clip(idx ^ k, 0, C - 1) + off
    r = jnp.take(tab_rows, i, axis=0)  # [L, V, N, 2]
    return c + (bary * r[..., 0]).sum() + (bary * r[..., 1]).sum()


for name, body, args in [
    ("A_two_flat_f32", a_two_flat, (tab_f, idx)),
    ("A_packed_u32", a_packed, (tab_u32, idx)),
    ("A_row2_f32", a_row2, (tab_rows, idx)),
]:
    run, K = scan_wrap(body)
    report(name, timed(run, *args), K, NI)

# --- B. dual-field fetch (same indices) -------------------------------------
def b_two_packed(c, k, t1, t2, idx):
    i = jnp.clip(idx ^ k, 0, C - 1) + off
    w1 = jnp.take(t1, i)
    w2 = jnp.take(t2, i)
    s = 0.0
    for w in (w1, w2):
        f0 = lax.bitcast_convert_type(w & jnp.uint32(0xFFFF0000), jnp.float32)
        f1 = lax.bitcast_convert_type(w << 16, jnp.float32)
        s = s + (bary * f0).sum() + (bary * f1).sum()
    return c + s


def b_row2_packedwords(c, k, tab, idx):
    # [L*C, 2] u32: lane 0 = field-1 bf16 pair, lane 1 = field-2 bf16 pair
    i = jnp.clip(idx ^ k, 0, C - 1) + off
    r = jnp.take(tab, i, axis=0)  # [L, V, N, 2] u32
    s = 0.0
    for j in (0, 1):
        w = r[..., j]
        f0 = lax.bitcast_convert_type(w & jnp.uint32(0xFFFF0000), jnp.float32)
        f1 = lax.bitcast_convert_type(w << 16, jnp.float32)
        s = s + (bary * f0).sum() + (bary * f1).sum()
    return c + s


def b_row4_f32(c, k, tab, idx):
    # [L*C, 4] f32: both fields' both features, full precision
    i = jnp.clip(idx ^ k, 0, C - 1) + off
    r = jnp.take(tab, i, axis=0)  # [L, V, N, 4]
    return c + sum((bary * r[..., j]).sum() for j in range(4))


tab_u32_b = jnp.stack([tab_u32, tab_u32 ^ jnp.uint32(0x5A5A5A5A)], axis=1)
for name, body, args in [
    ("B_two_packed_u32", b_two_packed,
     (tab_u32, tab_u32 ^ jnp.uint32(1), idx)),
    ("B_row2_packed_words", b_row2_packedwords, (tab_u32_b, idx)),
    ("B_row4_f32", b_row4_f32, (tab_rows4, idx)),
]:
    run, K = scan_wrap(body)
    report(name, timed(run, *args), K, NI)

# --- C. scatter: flat vs per-level batched ----------------------------------
vals = jax.random.uniform(jax.random.PRNGKey(5), (L, V, N))


def c_flat(c, k, idx, vals):
    i = jnp.clip(idx ^ k, 0, C - 1) + off
    z = jnp.zeros((L * C,), jnp.float32).at[i.reshape(-1)].add(
        (vals + c).reshape(-1))
    return z[0] * 1e-9


def c_batched(c, k, idx, vals):
    i = jnp.clip(idx ^ k, 0, C - 1)  # per-level ids, no offset

    def one(ii, vv):
        return jnp.zeros((C,), jnp.float32).at[ii.reshape(-1)].add(
            vv.reshape(-1))

    z = jax.vmap(one)(i, vals + c)  # [L, C]
    return z[0, 0] * 1e-9


for name, body in [("C_scatter_flat_LC", c_flat),
                   ("C_scatter_per_level_vmap", c_batched)]:
    run, K = scan_wrap(body, K=6)
    report(name, timed(run, idx, vals), K, NI)

with open("/root/repo/eval_artifacts/roofline2.json", "w") as f:
    json.dump(OUT, f, indent=1)
print("wrote eval_artifacts/roofline2.json", flush=True)
