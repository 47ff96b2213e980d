"""Finding-34 microbench (VERDICT r4 item 8): can WINDOW gathers make
hash/dense-grid lookups cheaper per fetched value than the shipped row-2
form?

The idea under test: a [4^3]-blocked dense layout for the coarse encoding
levels would let one gather instance fetch a contiguous multi-value
window (e.g. the 2x2x2 trilinear corner block, or all simplex-vertex rows
at once), cutting INSTANCE count — the measured wall for table lookups on
v5e (roofline.json: issue-rate-bound at 4.3-6.6 ns/instance, flat in
table size; finding 23: row READS vectorize).

Forms measured (production-like consumer: bary/trilinear-weighted sum):
  row2        — shipped baseline: 1 instance per (level, vertex, point),
                (C,2) row fetch                       [equiv = L*V*N inst]
  row8        — 1 instance per (level, point) fetching an (8,) row =
                4 vertices x 2 feats IF vertices were stored contiguously
                (upper bound for any vertex-packing scheme)
  win_flat8   — lax.gather of an 8-contiguous-f32 window from a flat table
  win2222     — blocked dense grid [B,5,5,5,2] (4^3 cells + 1 halo),
                1 instance per (level, point) fetching the (1,2,2,2,2)
                trilinear corner window (the judge-suggested layout)
  scat_win8   — backward form: scatter-add of (8,) windows vs the shipped
                two flat scatter-adds (finding 33: row-2 scatter is 8x
                WORSE than flat — check whether windows behave like rows)

ns are reported per ROW-2-EQUIVALENT instance (total time / (L*V*N)) so
every form is comparable to the shipped 4.29 ns baseline at equal fetched
values; `*_per_inst` gives the raw per-instance cost.

Writes eval_artifacts/roofline3.json.
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

L, V, N = 24, 4, 61440
C = 2 ** 18
NI = L * V * N  # row-2-equivalent instances per encode
OUT = {"shape": {"L": L, "V": V, "N": N, "C": C},
       "note": "ns per row2-equivalent instance (= time/(L*V*N)); "
               "*_per_inst = raw per-instance"}


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


def scan_wrap(body, K=10):
    @jax.jit
    def run(*args):
        def step(c, k):
            return body(c, k, *args), ()
        y, _ = lax.scan(step, jnp.zeros(()), jnp.arange(K, dtype=jnp.int32))
        return y
    return run, K


def report(name, s, K, n_equiv=NI, n_inst=None):
    ns = s / K / n_equiv * 1e9
    OUT[name] = round(ns, 3)
    if n_inst:
        OUT[name + "_per_inst"] = round(s / K / n_inst * 1e9, 3)
    print(f"{name:14s}: {ns:6.2f} ns/row2-equiv"
          + (f"  ({OUT[name + '_per_inst']} ns/inst)" if n_inst else ""),
          flush=True)
    with open("/root/repo/eval_artifacts/roofline3.json", "w") as f:
        json.dump(OUT, f, indent=1)


key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (L, V, N), 0, C, dtype=jnp.int32)
off = (jnp.arange(L, dtype=jnp.int32) * C)[:, None, None]
bary = jax.random.uniform(jax.random.PRNGKey(1), (L, V, N))
tab_rows = jax.random.uniform(jax.random.PRNGKey(2), (L * C, 2))

# ---- row2 baseline (shipped form) ----
def f_row2(c, k, tab, idx, bary):
    g = tab[(idx + off + k).reshape(-1) % (L * C)]           # [L*V*N, 2]
    g = g.reshape(L, V, N, 2)
    return c + jnp.sum(g * bary[..., None])

run, K = scan_wrap(f_row2)
report("row2", timed(run, tab_rows, idx, bary), K, n_inst=NI)

# ---- row8: one (8,) row per (level, point) ----
tab_r8 = jax.random.uniform(jax.random.PRNGKey(3), (L * C, 8))
idx_lp = idx[:, 0, :]  # [L, N]

def f_row8(c, k, tab, idx_lp, bary):
    g = tab[(idx_lp + off[..., 0] + k).reshape(-1) % (L * C)]  # [L*N, 8]
    g = g.reshape(L, N, 4, 2).transpose(0, 2, 1, 3)            # [L,V,N,2]
    return c + jnp.sum(g * bary[..., None])

run, K = scan_wrap(f_row8)
report("row8", timed(run, tab_r8, idx_lp, bary), K, n_inst=L * N)

# ---- win_flat8: 8-contiguous window from flat table ----
tab_flat = jax.random.uniform(jax.random.PRNGKey(4), (L * C * 2 + 8,))
dn8 = lax.GatherDimensionNumbers(offset_dims=(1,), collapsed_slice_dims=(),
                                 start_index_map=(0,))

def f_wf8(c, k, tab, idx_lp, bary):
    starts = ((idx_lp + off[..., 0] + k).reshape(-1, 1) % (L * C)) * 2
    g = lax.gather(tab, starts, dn8, slice_sizes=(8,),
                   mode=lax.GatherScatterMode.CLIP)            # [L*N, 8]
    g = g.reshape(L, N, 4, 2).transpose(0, 2, 1, 3)
    return c + jnp.sum(g * bary[..., None])

run, K = scan_wrap(f_wf8)
report("win_flat8", timed(run, tab_flat, idx_lp, bary), K, n_inst=L * N)

# ---- win2222: blocked dense grid, trilinear corner window ----
# [B, 5,5,5, 2]: 4^3-cell blocks with +1 halo so any in-block cell's 8
# corners are one contiguous (2,2,2,2) window
B = max(L * C // 125, 1)
tab_blk = jax.random.uniform(jax.random.PRNGKey(5), (B, 5, 5, 5, 2))
kb = jax.random.split(jax.random.PRNGKey(6), 4)
sb = jnp.stack([
    jax.random.randint(kb[0], (L, N), 0, B, dtype=jnp.int32),
    jax.random.randint(kb[1], (L, N), 0, 4, dtype=jnp.int32),
    jax.random.randint(kb[2], (L, N), 0, 4, dtype=jnp.int32),
    jax.random.randint(kb[3], (L, N), 0, 4, dtype=jnp.int32),
], axis=-1)  # [L, N, 4] block + in-block cell coords
dn_blk = lax.GatherDimensionNumbers(
    offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(0,),
    start_index_map=(0, 1, 2, 3))
tri_w = jax.random.uniform(jax.random.PRNGKey(7), (L, N, 2, 2, 2, 1))

def f_blk(c, k, tab, sb, tri_w):
    st = sb.reshape(-1, 4)
    st = st.at[:, 0].set((st[:, 0] + k) % B)
    g = lax.gather(tab, st, dn_blk, slice_sizes=(1, 2, 2, 2, 2),
                   mode=lax.GatherScatterMode.CLIP)  # [L*N, 2,2,2,2]
    g = g.reshape(L, N, 2, 2, 2, 2)
    return c + jnp.sum(g * tri_w)

run, K = scan_wrap(f_blk)
report("win2222", timed(run, tab_blk, sb, tri_w), K, n_inst=L * N)

# ---- backward forms: scatter-add comparison ----
grads2 = jax.random.uniform(jax.random.PRNGKey(8), (L, V, N, 2))

def f_scat_flat(c, k, idx, grads):
    flat = (idx + off + k).reshape(-1) % (L * C)
    z = jnp.zeros((L * C,))
    a = z.at[flat].add(grads[..., 0].reshape(-1))
    b = z.at[flat].add(grads[..., 1].reshape(-1))
    return c + a[0] + b[0]

run, K = scan_wrap(f_scat_flat)
report("scat_2flat", timed(run, idx, grads2), K, n_inst=2 * NI)

grads8 = jax.random.uniform(jax.random.PRNGKey(9), (L, N, 8))
dn_s8 = lax.ScatterDimensionNumbers(update_window_dims=(1,),
                                    inserted_window_dims=(),
                                    scatter_dims_to_operand_dims=(0,))

def f_scat_win8(c, k, idx_lp, grads):
    starts = ((idx_lp + off[..., 0] + k).reshape(-1, 1) % (L * C)) * 2
    z = jnp.zeros((L * C * 2 + 8,))
    s = lax.scatter_add(z, starts, grads.reshape(-1, 8), dn_s8,
                        mode=lax.GatherScatterMode.CLIP)
    return c + s[0]

run, K = scan_wrap(f_scat_win8)
report("scat_win8", timed(run, idx_lp, grads8), K, n_inst=L * N)

print(json.dumps(OUT), flush=True)
