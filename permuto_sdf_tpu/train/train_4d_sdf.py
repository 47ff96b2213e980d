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


def hidden_vertex_mask(V: np.ndarray, F: np.ndarray, res: int = 128,
                       reach: int = 2) -> np.ndarray:
    """[Nv] bool — vertices buried inside the mesh (never visible from
    outside).

    The reference removes fully-occluded vertices from its mesh sequences
    with embree ambient occlusion (100 rays, cull AO < 0.01 —
    ``/root/reference/permuto_sdf_py/train_4d_sdf.py:78-86``): interior
    anatomy of e.g. the horse_gallop meshes would otherwise pollute the
    surface samples. Same intent here without a ray tracer: voxelize the
    surface at ``res``^3, flood-fill "outside air" from the volume border
    through unoccupied voxels (scipy binary_propagation), and mark a vertex
    hidden iff no outside-air voxel lies within ``reach`` voxels of it —
    exactly the fully-enclosed set the AO<0.01 test identifies."""
    from scipy.ndimage import binary_propagation, binary_dilation

    V = np.asarray(V, np.float64)
    lo = V.min(0)
    hi = V.max(0)
    # pad the volume so outside air surrounds the mesh on every side (a
    # mesh touching the volume border would otherwise read as "enclosed")
    margin = (hi - lo).max() * (float(reach) + 2.0) / res
    lo = lo - margin
    hi = hi + margin
    cell = (hi - lo).max() / res

    # voxelize: vertices + triangle-surface samples at ~cell/2 pitch
    tri = V[np.asarray(F, np.int64)]
    v1, v2 = tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]
    n_sub = int(np.ceil(max(np.linalg.norm(v1, axis=-1).max(),
                            np.linalg.norm(v2, axis=-1).max()) / (cell / 2)))
    n_sub = min(max(n_sub, 1), 32)
    samples = [V]
    for a in range(n_sub + 1):
        for b in range(n_sub + 1 - a):
            u, w = a / max(n_sub, 1), b / max(n_sub, 1)
            samples.append(tri[:, 0] + u * v1 + w * v2)
    pts = np.concatenate(samples, 0)
    ijk = np.clip(((pts - lo) / cell).astype(np.int64), 0, res - 1)
    occ = np.zeros((res, res, res), bool)
    occ[ijk[:, 0], ijk[:, 1], ijk[:, 2]] = True

    seed_border = np.zeros_like(occ)
    seed_border[[0, -1], :, :] = seed_border[:, [0, -1], :] = True
    seed_border[:, :, [0, -1]] = True
    outside = binary_propagation(seed_border & ~occ, mask=~occ)
    near_outside = binary_dilation(outside, iterations=reach)

    vijk = np.clip(((V - lo) / cell).astype(np.int64), 0, res - 1)
    return ~near_outside[vijk[:, 0], vijk[:, 1], vijk[:, 2]]


def _drop_vertices(V, F, drop_mask):
    keep = ~drop_mask
    index = np.full(len(V), -1, np.int64)
    index[keep] = np.arange(keep.sum())
    F = np.asarray(F, np.int64)
    fkeep = keep[F[:, 0]] & keep[F[:, 1]] & keep[F[:, 2]]
    return V[keep], index[F[fkeep]]


def load_mesh_sequence_points(sequence_path: str, points_per_frame: int = 30000,
                              nr_time_interp: int = 20, seed: int = 0,
                              cull_hidden: bool = True):
    """Directory of OBJ frames -> (points_time [N,4], normals [N,3]).

    Frames are normalized by the first frame (center + scale to fit the
    [-0.5, 0.5] box), times spread uniformly over [0, 1], and consecutive
    frames linearly interpolated ``nr_time_interp`` times (valid because the
    reference's sequences share topology across frames). ``cull_hidden``
    removes vertices buried inside the first frame from every frame, like
    the reference's embree-AO cull (see :func:`hidden_vertex_mask`)."""
    paths = sorted(glob.glob(os.path.join(sequence_path, "*.obj")))
    if not paths:
        raise FileNotFoundError(f"no .obj frames in {sequence_path}")
    meshes = [load_obj(p) for p in paths]
    v0 = meshes[0].V
    center = (v0.max(0) + v0.min(0)) / 2.0
    scale = 0.9 / np.abs(v0 - center).max() / 2.0

    if cull_hidden:
        # cull decided on frame 0, applied to every same-topology frame
        # (reference train_4d_sdf.py:78-86)
        hidden = hidden_vertex_mask(meshes[0].V, meshes[0].F)
        if hidden.any():
            culled = []
            for m in meshes:
                if m.V.shape == meshes[0].V.shape and np.array_equal(
                        m.F, meshes[0].F):
                    Vc, Fc = _drop_vertices(m.V, m.F, hidden)
                    culled.append(Mesh(Vc.astype(np.float32), Fc))
                else:
                    culled.append(m)
            meshes = culled
            print(f"culled {int(hidden.sum())} hidden vertices "
                  f"({hidden.mean():.1%}) from the sequence")

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


@functools.lru_cache(maxsize=None)
def _make_sdf_eval_4d(cfg: SDFConfig):
    def eval_fn(ctx, pts4):
        return sdf_apply(ctx, pts4, 9_999_999, cfg)[0].reshape(-1)

    return eval_fn


@functools.partial(jax.jit, static_argnames=("cfg", "bucket"))
def _shade_normals_4d(params, pos, lit, cfg: SDFConfig, bucket: int, time_val):
    """Spatial normals at the lit rays of a time slice (compacted).
    ``time_val`` is traced — the whole sweep shares one compiled shader."""
    R = pos.shape[0]
    (idx,) = jnp.nonzero(lit, size=bucket, fill_value=R)
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), pos.dtype)], 0)
    sub = pos_p[idx]
    sub4 = jnp.concatenate(
        [sub, jnp.full((sub.shape[0], 1), time_val, sub.dtype)], -1)
    _, g4, _ = sdf_with_gradient(params, sub4, 9_999_999, cfg)
    n = g4[:, :3]
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
    valid = (idx < R)[:, None].astype(n.dtype)
    out = jnp.zeros((R + 1, 3), n.dtype).at[idx].set(n * valid)[:R]
    return out * lit[:, None]


def render_time_sweep(params, cfg: SDFConfig, out_dir: str, nr_times: int = 10,
                      width: int = 512, height: int = 512,
                      cam_pos=(0.9, 0.6, -0.9), nr_rounds: int = 5,
                      iters_per_round: int = 4,
                      sdf_converged_tresh: float = 1e-3):
    """Sphere-traced, normal-shaded time sweep of the 4D SDF — the offline
    form of ``vis_4d_sdf``'s interactive ``m_time_val`` sweep (reference
    ``train_4d_sdf.py:268``, ``experiments/visualization/vis_4d_sdf.py``).
    Writes ``time_###.png`` frames to ``out_dir``."""
    import imageio.v2 as imageio
    from permuto_sdf_tpu.ops.sphere_trace import sphere_trace_adaptive, pow2_bucket
    from permuto_sdf_tpu.datasets.tensor_reel import rays_from_frame, look_at_cam_to_world

    os.makedirs(out_dir, exist_ok=True)
    bound = AABB((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5))
    f = 1.2 * max(width, height)
    K = jnp.asarray([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]])
    tf = jnp.asarray(look_at_cam_to_world(cam_pos))
    origins, dirs = rays_from_frame(K, tf, width, height)
    eval4 = _make_sdf_eval_4d(cfg)

    light = np.asarray([0.5, 0.7, -0.5])
    light = light / np.linalg.norm(light)
    for i in range(nr_times):
        t = i / max(nr_times - 1, 1)
        pos, sdf, conv, alive, n_alive = sphere_trace_adaptive(
            eval4, params, origins, dirs, bound, nr_rounds, iters_per_round,
            sdf_converged_tresh=sdf_converged_tresh, time_val=t,
            return_n_hit=True,
        )
        # conv-gated like the reference's vis_4d path (geometry display);
        # n_alive >= n_conv still bounds the shade bucket
        lit = conv & alive
        bucket = pow2_bucket(max(n_alive, 1), lo=256, hi=max(256, width * height))
        normals = _shade_normals_4d(params, pos, lit, cfg, bucket,
                                    jnp.float32(t))
        normals = np.asarray(normals).reshape(height, width, 3)
        lam = np.clip(normals @ light, 0.0, 1.0)[..., None]
        img = (0.15 + 0.85 * lam) * (normals * 0.5 + 0.5)
        img = img * np.asarray(lit).reshape(height, width, 1)
        imageio.imwrite(os.path.join(out_dir, f"time_{i:03d}.png"),
                        (np.clip(img, 0, 1) * 255).astype(np.uint8))
    print(f"wrote {nr_times} sphere-traced time-sweep frames -> {out_dir}")


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
