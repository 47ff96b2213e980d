"""4D (3D + time) SDF fitting from an animated mesh sequence.

Equivalent of ``/root/reference/permuto_sdf_py/train_4d_sdf.py``: an SDF
with ``in_channels=4`` (the permutohedral lattice's linear-in-d simplex cost
is what makes this cheap — 5 vertices/lookup instead of 16), trained on a
pool of (x, y, z, t) surface points + normals and random off-surface 4D
points, with the eikonal/normal terms applied to the *spatial* slice of the
4D gradient only (``train_4d_sdf.py:212-223``). Loss = sdf_loss / 30000,
AdamW(lr 1e-3), ``nr_iters_for_c2f=3000``, ``geom_feat_size_out=0``.

Mesh-sequence ingestion: a directory of OBJ frames (the reference's
horse_gallop), normalized by the FIRST frame's transform and annotated with
time in [0, 1]; linear interpolation between consecutive frames densifies
the time axis (the reference interpolates 20 sub-steps,
``train_4d_sdf.py:47-141``). A procedural oscillating-sphere sequence backs
the smoke test when no data is available.
"""

from __future__ import annotations

import argparse
import functools
import glob
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from permuto_sdf_tpu.models.fields import SDFConfig, init_sdf, sdf_with_gradient, sdf_apply
from permuto_sdf_tpu.ops.ray_primitives import AABB
from permuto_sdf_tpu.datasets.mesh_io import (
    Mesh, load_obj, make_uv_sphere, sample_points_on_mesh,
)
from permuto_sdf_tpu.utils.losses import sdf_loss
from permuto_sdf_tpu.train import checkpoint as ckpt
from permuto_sdf_tpu.train.train_sdf_from_mesh import make_optimizer


def load_mesh_sequence_points(sequence_path: str, points_per_frame: int = 30000,
                              nr_time_interp: int = 20, seed: int = 0):
    """Directory of OBJ frames -> (points_time [N,4], normals [N,3]).

    Frames are normalized by the first frame (center + scale to fit the
    [-0.5, 0.5] box), times spread uniformly over [0, 1], and consecutive
    frames linearly interpolated ``nr_time_interp`` times (valid because the
    reference's sequences share topology across frames)."""
    paths = sorted(glob.glob(os.path.join(sequence_path, "*.obj")))
    if not paths:
        raise FileNotFoundError(f"no .obj frames in {sequence_path}")
    meshes = [load_obj(p) for p in paths]
    v0 = meshes[0].V
    center = (v0.max(0) + v0.min(0)) / 2.0
    scale = 0.9 / np.abs(v0 - center).max() / 2.0

    rng = np.random.default_rng(seed)
    all_pts, all_nrm = [], []
    n_frames = len(meshes)
    for i in range(n_frames - 1):
        a, b = meshes[i], meshes[i + 1]
        same_topo = a.V.shape == b.V.shape and np.array_equal(a.F, b.F)
        steps = nr_time_interp if same_topo else 1
        for s in range(steps):
            w = s / steps
            V = (1 - w) * a.V + w * b.V if same_topo else a.V
            m = Mesh(((V - center) * scale).astype(np.float32), a.F)
            pts, nrm = sample_points_on_mesh(m, points_per_frame // steps, rng)
            t = (i + w) / max(n_frames - 1, 1)
            all_pts.append(np.concatenate([pts, np.full((len(pts), 1), t, np.float32)], 1))
            all_nrm.append(nrm)
    # last frame
    m = Mesh(((meshes[-1].V - center) * scale).astype(np.float32), meshes[-1].F)
    pts, nrm = sample_points_on_mesh(m, points_per_frame, rng)
    all_pts.append(np.concatenate([pts, np.ones((len(pts), 1), np.float32)], 1))
    all_nrm.append(nrm)
    return np.concatenate(all_pts), np.concatenate(all_nrm)


def procedural_sequence_points(nr_frames: int = 8, points_per_frame: int = 20000,
                               seed: int = 0):
    """Oscillating-radius sphere — data-free stand-in for horse_gallop."""
    rng = np.random.default_rng(seed)
    all_pts, all_nrm = [], []
    for i in range(nr_frames):
        t = i / max(nr_frames - 1, 1)
        r = 0.22 + 0.08 * np.sin(2 * np.pi * t)
        mesh = make_uv_sphere(radius=r)
        pts, nrm = sample_points_on_mesh(mesh, points_per_frame, rng)
        all_pts.append(np.concatenate([pts, np.full((len(pts), 1), t, np.float32)], 1))
        all_nrm.append(nrm)
    return np.concatenate(all_pts), np.concatenate(all_nrm)


@functools.partial(jax.jit, static_argnames=("cfg", "nr_surface", "nr_offsurface",
                                             "optimizer"))
def train_step(params, opt_state, key, gt_points_time, gt_normals, iter_nr,
               cfg: SDFConfig, nr_surface: int, nr_offsurface: int, optimizer):
    k_sel, k_off, k_time = jax.random.split(key, 3)
    idx = jax.random.randint(k_sel, (nr_surface,), 0, gt_points_time.shape[0])
    surf = jnp.take(gt_points_time, idx, axis=0)  # [n, 4]
    surf_n = jnp.take(gt_normals, idx, axis=0)
    off_xyz = jax.random.uniform(k_off, (nr_offsurface, 3), minval=-0.5, maxval=0.5)
    off_t = jax.random.uniform(k_time, (nr_offsurface, 1))
    off = jnp.concatenate([off_xyz, off_t], axis=-1)
    points = jnp.concatenate([surf, off], axis=0)

    def loss_fn(p):
        sdf, grads4, _ = sdf_with_gradient(p, points, iter_nr, cfg)
        grads = grads4[:, 0:3]  # eikonal/normals over the spatial slice only
        return sdf_loss(
            sdf[:nr_surface], grads[:nr_surface],
            sdf[nr_surface:], grads[nr_surface:], surf_n,
        ) / 30000.0

    loss, grads = jax.value_and_grad(loss_fn)(params)
    params, opt_state = optimizer.update(grads, opt_state, params)
    return params, opt_state, loss


def train(gt_points_time, gt_normals, nr_iters: int = 30000,
          cfg: SDFConfig | None = None, seed: int = 0, log_every: int = 500,
          nr_surface: int = 3000, nr_offsurface: int = 3000,
          checkpoint_path: str | None = None, experiment_name: str = "4d",
          save_every: int = 5000):
    if cfg is None:
        cfg = SDFConfig(in_channels=4, geom_feat_size_out=0, nr_iters_for_c2f=3000)
    gt_points_time = jnp.asarray(gt_points_time)
    gt_normals = jnp.asarray(gt_normals)

    key = jax.random.PRNGKey(seed)
    params = init_sdf(jax.random.fold_in(key, 1), cfg)
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)

    history = []
    t0 = time.perf_counter()
    for it in range(nr_iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(
            params, opt_state, sub, gt_points_time, gt_normals, it, cfg,
            nr_surface, nr_offsurface, optimizer,
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


def extract_mesh_at_time(params, cfg: SDFConfig, time_val: float,
                         nr_points_per_dim: int = 128):
    """Marching-tets mesh of the time slice — the vis_4d_sdf capability."""
    from permuto_sdf_tpu.ops.marching_cubes import extract_mesh_from_sdf_fn

    @jax.jit
    def sdf_fn(pts):
        t = jnp.full((pts.shape[0], 1), time_val, pts.dtype)
        return sdf_apply(params, jnp.concatenate([pts, t], -1), 9_999_999, cfg)[0]

    return extract_mesh_from_sdf_fn(sdf_fn, nr_points_per_dim, -0.5, 0.5)


def main():
    parser = argparse.ArgumentParser(description="Train a 4D space-time SDF")
    parser.add_argument("--sequence_path", default=None,
                        help="directory of OBJ frames (default: procedural)")
    parser.add_argument("--nr_iters", type=int, default=30000)
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--checkpoint_path", default=None)
    parser.add_argument("--exp_info", default="")
    args = parser.parse_args()

    if args.sequence_path:
        pts, nrm = load_mesh_sequence_points(args.sequence_path)
    else:
        pts, nrm = procedural_sequence_points(
            nr_frames=4 if args.smoke else 8,
            points_per_frame=4000 if args.smoke else 20000,
        )

    if args.smoke:
        cfg = SDFConfig(in_channels=4, geom_feat_size_out=0, nr_iters_for_c2f=200,
                        capacity=2 ** 12, nr_levels=8)
        params, cfg, history = train(pts, nrm, nr_iters=400, cfg=cfg,
                                     nr_surface=512, nr_offsurface=512,
                                     log_every=50)
        assert history[-1][1] < history[0][1] * 0.5, "smoke: loss did not decrease"
        # time-slice extraction must produce a mesh of roughly the right radius
        V, F = extract_mesh_at_time(params, cfg, 0.0, nr_points_per_dim=48)
        print("t=0 slice:", V.shape, F.shape)
        print("SMOKE OK:", history[0][1], "->", history[-1][1])
    else:
        exp = "4d" + (f"_{args.exp_info}" if args.exp_info else "")
        train(pts, nrm, nr_iters=args.nr_iters,
              checkpoint_path=args.checkpoint_path, experiment_name=exp)


if __name__ == "__main__":
    main()
