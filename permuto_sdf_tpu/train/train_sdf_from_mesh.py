"""Supervised SDF fit from a known mesh — the minimum end-to-end slice.

Equivalent of ``/root/reference/permuto_sdf_py/train_sdf_from_mesh.py``:
per iteration sample 3000 surface points (+ normals) and 30000 random
off-surface points inside the bounding box, run ``sdf_with_gradient``, and
minimize ``sdf_loss / 30000`` with AdamW(betas=(0.9, 0.99), eps=1e-15,
lr=1e-3) (``train_sdf_from_mesh.py:45,113-165``). The SDF model uses
``geom_feat_size_out=0`` and ``nr_iters_for_c2f=5000``
(``train_sdf_from_mesh.py:117`` region).

TPU-native notes: the whole step (point sampling via jax.random, forward,
gradient-of-forward, loss, AdamW update) is one jitted function with static
shapes; mesh surface points are pre-sampled into a device-resident pool and
indexed with random ints — the analog of the reference's
``torch.randint``-select from the EasyPBR mesh.
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from permuto_sdf_tpu.models.fields import SDFConfig, init_sdf, sdf_with_gradient
from permuto_sdf_tpu.ops.ray_primitives import AABB
from permuto_sdf_tpu.ops.marching_cubes import extract_mesh_from_sdf_fn
from permuto_sdf_tpu.datasets.mesh_io import (
    Mesh,
    load_obj,
    save_obj,
    make_uv_sphere,
    normalize_mesh_to_unit_sphere,
    sample_points_on_mesh,
)
from permuto_sdf_tpu.train import checkpoint as ckpt


def make_optimizer(lr: float = 1e-3):
    """Adam with the reference's hyperparameters (betas 0.9/0.99, eps 1e-15,
    no weight decay) — train_sdf_from_mesh.py:45 / train_permuto_sdf.py:303.
    See train/optimizers.py for why not optax."""
    from permuto_sdf_tpu.train.optimizers import ManualAdam

    return ManualAdam(lr=lr, b1=0.9, b2=0.99, eps=1e-15)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "nr_surface", "nr_offsurface", "optimizer"),
)
def train_step(params, opt_state, key, gt_points, gt_normals, iter_nr,
               cfg: SDFConfig, nr_surface: int, nr_offsurface: int, optimizer,
               aabb_lo, aabb_hi):
    k_sel, k_off = jax.random.split(key)
    idx = jax.random.randint(k_sel, (nr_surface,), 0, gt_points.shape[0])
    surface_points = jnp.take(gt_points, idx, axis=0)
    surface_normals = jnp.take(gt_normals, idx, axis=0)
    u = jax.random.uniform(k_off, (nr_offsurface, gt_points.shape[-1]))
    offsurface_points = aabb_lo + u * (aabb_hi - aabb_lo)
    points = jnp.concatenate([surface_points, offsurface_points], axis=0)

    def loss_fn(p):
        sdf, grads, _ = sdf_with_gradient(p, points, iter_nr, cfg)
        s_sdf, o_sdf = sdf[:nr_surface], sdf[nr_surface:]
        s_grad, o_grad = grads[:nr_surface], grads[nr_surface:]
        # SIREN-style fit loss, scaled by 1/30000 like the reference to keep
        # backward magnitudes in fp range (train_sdf_from_mesh.py:136)
        from permuto_sdf_tpu.utils.losses import sdf_loss

        return sdf_loss(s_sdf, s_grad, o_sdf, o_grad, surface_normals) / 30000.0

    loss, grads = jax.value_and_grad(loss_fn)(params)
    params, opt_state = optimizer.update(grads, opt_state, params)
    return params, opt_state, loss


def train(
    mesh: Mesh,
    nr_iters: int = 20000,
    lr: float = 1e-3,
    nr_surface: int = 3000,
    nr_offsurface: int = 30000,
    surface_pool_size: int = 300_000,
    cfg: SDFConfig | None = None,
    seed: int = 0,
    log_every: int = 500,
    checkpoint_path: str | None = None,
    experiment_name: str = "sdf_from_mesh",
    save_every: int = 5000,
):
    """Returns (params, cfg, history). ``mesh`` should already be normalized
    into the [-0.5, 0.5] bounding box."""
    if cfg is None:
        cfg = SDFConfig(geom_feat_size_out=0, nr_iters_for_c2f=5000)

    rng = np.random.default_rng(seed)
    pool_pts, pool_nrm = sample_points_on_mesh(mesh, surface_pool_size, rng)
    gt_points = jnp.asarray(pool_pts)
    gt_normals = jnp.asarray(pool_nrm)

    aabb = AABB()
    aabb_lo = jnp.asarray(aabb.min_corner)
    aabb_hi = jnp.asarray(aabb.max_corner)

    key = jax.random.PRNGKey(seed)
    params = init_sdf(jax.random.fold_in(key, 1), cfg)
    optimizer = make_optimizer(lr)
    opt_state = optimizer.init(params)

    history = []
    t0 = time.perf_counter()
    for it in range(nr_iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(
            params, opt_state, sub, gt_points, gt_normals, it, cfg,
            nr_surface, nr_offsurface, optimizer, aabb_lo, aabb_hi,
        )
        if it % log_every == 0 or it == nr_iters - 1:
            lv = float(loss)
            history.append((it, lv))
            print(f"iter {it:6d}  loss {lv:.6f}  ({time.perf_counter()-t0:.1f}s)")
        if checkpoint_path and save_every and it > 0 and it % save_every == 0:
            ckpt.save_model(checkpoint_path, experiment_name, it, "sdf_model", params)
    if checkpoint_path:
        ckpt.save_model(checkpoint_path, experiment_name, nr_iters, "sdf_model", params)
    return params, cfg, history


def main():
    parser = argparse.ArgumentParser(description="Train SDF from a mesh")
    parser.add_argument("--mesh", default=None, help="OBJ file (default: synthetic sphere)")
    parser.add_argument("--nr_iters", type=int, default=20000)
    parser.add_argument("--smoke", action="store_true",
                        help="tiny lattice + few iters; asserts loss decreases")
    parser.add_argument("--out_mesh", default=None, help="extract mesh to this OBJ")
    parser.add_argument("--mc_res", type=int, default=196)
    parser.add_argument("--checkpoint_path", default=None)
    parser.add_argument("--exp_info", default="")
    args = parser.parse_args()

    if args.mesh:
        mesh = normalize_mesh_to_unit_sphere(load_obj(args.mesh))
    else:
        mesh = make_uv_sphere(radius=0.3)

    if args.smoke:
        cfg = SDFConfig(geom_feat_size_out=0, nr_iters_for_c2f=200,
                        capacity=2 ** 12, nr_levels=8)
        params, cfg, history = train(
            mesh, nr_iters=400, cfg=cfg, nr_surface=512, nr_offsurface=2048,
            surface_pool_size=20000, log_every=50,
        )
        assert history[-1][1] < history[0][1] * 0.5, (
            f"smoke: loss did not decrease: {history[0][1]} -> {history[-1][1]}"
        )
        print("SMOKE OK: loss", history[0][1], "->", history[-1][1])
    else:
        exp = "sdf_from_mesh" + (f"_{args.exp_info}" if args.exp_info else "")
        params, cfg, history = train(
            mesh, nr_iters=args.nr_iters,
            checkpoint_path=args.checkpoint_path, experiment_name=exp,
        )

    if args.out_mesh:
        from permuto_sdf_tpu.models.fields import sdf_apply

        @jax.jit
        def sdf_fn(pts):
            return sdf_apply(params, pts, 9_999_999, cfg)[0]

        V, F = extract_mesh_from_sdf_fn(sdf_fn, args.mc_res, -0.5, 0.5)
        save_obj(args.out_mesh, Mesh(V, F))
        print(f"extracted mesh: {V.shape[0]} verts, {F.shape[0]} faces -> {args.out_mesh}")


if __name__ == "__main__":
    main()
