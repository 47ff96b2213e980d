"""Permuto-NeRF training — density field with permutohedral encoding.

Equivalent of ``/root/reference/permuto_sdf_py/train_nerf.py``: NerfHash
foreground + NerfHash(4D) background, 64^3 occupancy grid updated with
density every 8 iters (decay 0.7, thresh 1e-3, 256^2 random samples), MSE
rgb loss masked by box intersection, optional mask BCE*0.1, per-image color
calibration, AdamW(lr 1e-3, betas (0.9, 0.99), eps 1e-15)
(``train_nerf.py:45-56,155-207``).

TPU-native structure: one jitted ``train_step`` covering ray generation,
sampling (stop-gradient), field eval, rendering, loss and the optimizer
update; a second jitted ``occupancy_update`` the host calls every 8 iters.
Static shapes throughout (nr_rays and the per-ray sample cap are fixed).
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from permuto_sdf_tpu.models.fields import (
    NerfHashConfig, init_nerf_hash, nerf_hash_apply, nerf_hash_density,
    init_colorcal,
)
from permuto_sdf_tpu.ops.ray_primitives import Sphere
from permuto_sdf_tpu.ops import occupancy_grid as og
from permuto_sdf_tpu.ops import volume_rendering as vr
from permuto_sdf_tpu.ops.ray_sampler import compute_samples_fg, compute_samples_bg
from permuto_sdf_tpu.datasets.tensor_reel import TensorReel, random_rays_from_reel
from permuto_sdf_tpu.train import checkpoint as ckpt


@dataclasses.dataclass(frozen=True)
class NerfTrainConfig:
    lr: float = 1e-3
    nr_rays: int = 512
    iter_finish_training: int = 200000
    use_occupancy_grid: bool = True
    nr_samples_bg: int = 32
    min_dist_between_samples: float = 0.0001
    max_nr_samples_per_ray: int = 64
    use_color_calibration: bool = True
    with_mask: bool = False
    mask_weight: float = 0.1
    foreground_nr_iters_for_c2f: int = 1
    background_nr_iters_for_c2f: int = 10000
    grid_nr_voxels_per_dim: int = 64
    grid_update_every: int = 8
    grid_decay: float = 0.7
    grid_occupancy_thresh: float = 1e-3
    grid_nr_random_samples: int = 256 * 256
    # encoding sizes (reference defaults; shrink for smoke tests)
    capacity: int = 2 ** 18
    nr_levels: int = 24

    @property
    def fg_model(self) -> NerfHashConfig:
        return NerfHashConfig(
            in_channels=3, nr_iters_for_c2f=self.foreground_nr_iters_for_c2f,
            capacity=self.capacity, nr_levels=self.nr_levels,
        )

    @property
    def bg_model(self) -> NerfHashConfig:
        return NerfHashConfig(
            in_channels=4, nr_iters_for_c2f=self.background_nr_iters_for_c2f,
            capacity=self.capacity, nr_levels=self.nr_levels,
        )

    @property
    def grid(self) -> og.OccupancyGridConfig:
        return og.OccupancyGridConfig(nr_voxels_per_dim=self.grid_nr_voxels_per_dim)


BOUND = Sphere(0.5, (0.0, 0.0, 0.0))


def init_params(key, cfg: NerfTrainConfig, nr_cams: int):
    k_fg, k_bg = jax.random.split(key)
    params = {
        "model": init_nerf_hash(k_fg, cfg.fg_model),
        "model_bg": init_nerf_hash(k_bg, cfg.bg_model),
    }
    if cfg.use_color_calibration:
        params["colorcal"] = init_colorcal(nr_cams)
    return params


def make_optimizer(cfg: NerfTrainConfig):
    from permuto_sdf_tpu.train.optimizers import ManualAdam

    return ManualAdam(lr=cfg.lr, b1=0.9, b2=0.99, eps=1e-15)


@functools.partial(jax.jit, static_argnames=("cfg",))
def occupancy_update(params, grid, key, iter_nr, cfg: NerfTrainConfig):
    """Density-based occupancy refresh (train_nerf.py:186-191); stratified
    voxel cycling for guaranteed coverage (see occupancy_grid.py)."""
    update_idx = jnp.asarray(iter_nr // cfg.grid_update_every, jnp.uint32)
    centers, lin = og.compute_stratified_sample_of_grid_points(
        cfg.grid, key, cfg.grid_nr_random_samples, update_idx, jitter=True
    )
    density = nerf_hash_density(params["model"], centers, iter_nr, cfg.fg_model)
    return og.update_with_density_random_sample(
        cfg.grid, grid, lin, density, cfg.grid_decay, cfg.grid_occupancy_thresh
    )


def _render_rays(params, grid, key, origins, dirs, img_indices, iter_nr,
                 cfg: NerfTrainConfig, jitter: bool):
    """Shared fg+bg rendering used by both training and full-image eval."""
    _, t_entry, _, t_exit, does_intersect = BOUND.ray_intersection(origins, dirs)

    k_fg, k_bg = jax.random.split(key)
    if cfg.use_occupancy_grid and grid is not None:
        samples = og.compute_samples_in_occupied_regions(
            cfg.grid, grid, origins, dirs, t_entry, t_exit,
            cfg.min_dist_between_samples, cfg.max_nr_samples_per_ray,
            key=k_fg, jitter=jitter,
        )
    else:
        samples = compute_samples_fg(
            origins, dirs, t_entry, t_exit, cfg.min_dist_between_samples,
            cfg.max_nr_samples_per_ray, key=k_fg, jitter=jitter,
        )
    samples = jax.tree_util.tree_map(jax.lax.stop_gradient, samples)

    R, S = samples.mask.shape
    colorcal = params.get("colorcal")
    per_sample_img = (
        jnp.broadcast_to(img_indices[:, None], (R, S)).reshape(-1)
        if img_indices is not None else None
    )
    cc = colorcal if (colorcal is not None and img_indices is not None) else None

    rgb_flat, density_flat = nerf_hash_apply(
        params["model"], samples.flat_positions(), samples.flat_dirs(), iter_nr,
        cfg.fg_model, colorcal_params=cc, per_sample_img_indices=per_sample_img,
    )
    weights, weights_sum, bg_transmittance = vr.nerf_compute_weights(
        samples, density_flat
    )
    pred_rgb = vr.integrate_with_weights(
        rgb_flat.reshape(R, S, 3), weights, samples.mask
    )

    pred_rgb_bg = None
    if not cfg.with_mask:
        bg_samples = compute_samples_bg(
            origins, dirs, t_exit, cfg.nr_samples_bg, BOUND.radius, BOUND.center,
            key=k_bg, jitter=jitter,
        )
        bg_samples = jax.tree_util.tree_map(jax.lax.stop_gradient, bg_samples)
        Rb, Sb = bg_samples.mask.shape
        per_sample_img_bg = (
            jnp.broadcast_to(img_indices[:, None], (Rb, Sb)).reshape(-1)
            if img_indices is not None else None
        )
        rgb_bg_flat, density_bg_flat = nerf_hash_apply(
            params["model_bg"], bg_samples.pos_4d.reshape(-1, 4),
            bg_samples.flat_dirs(), iter_nr, cfg.bg_model,
            colorcal_params=cc, per_sample_img_indices=per_sample_img_bg,
        )
        weights_bg, _, _ = vr.nerf_compute_weights(bg_samples, density_bg_flat)
        pred_rgb_bg = vr.integrate_with_weights(
            rgb_bg_flat.reshape(Rb, Sb, 3), weights_bg, bg_samples.mask
        )
        pred_rgb = pred_rgb + bg_transmittance[:, None] * pred_rgb_bg

    return pred_rgb, pred_rgb_bg, weights_sum, does_intersect


def compute_loss_and_grads(params, grid, reel: TensorReel, key, iter_nr,
                           cfg: NerfTrainConfig):
    """Pure per-ray-batch gradient computation (data-parallel unit).
    Returns (loss, aux, grads)."""
    k_rays, k_render = jax.random.split(key)
    # mask-multiplied targets only in mask-supervised mode (see
    # random_rays_from_reel's docstring — otherwise the background field
    # trains against zeroed pixels)
    origins, dirs, gt_rgb, gt_mask, img_indices = random_rays_from_reel(
        reel, k_rays, cfg.nr_rays, apply_mask=cfg.with_mask
    )

    def loss_fn(p):
        pred_rgb, _, weights_sum, does_intersect = _render_rays(
            p, grid, k_render, origins, dirs, img_indices, iter_nr, cfg,
            jitter=True,
        )
        loss_rgb = jnp.mean((gt_rgb - pred_rgb) ** 2 * does_intersect)
        loss = loss_rgb
        if cfg.with_mask:
            ws = jnp.clip(weights_sum, 1e-3, 1.0 - 1e-3)
            bce = -(gt_mask * jnp.log(ws) + (1 - gt_mask) * jnp.log(1 - ws))
            loss = loss + jnp.mean(bce) * cfg.mask_weight
        return loss, loss_rgb

    (loss, loss_rgb), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, loss_rgb, grads


@functools.partial(jax.jit, static_argnames=("cfg",))
def _grads_step(params, grid, reel: TensorReel, key, iter_nr,
                cfg: NerfTrainConfig):
    return compute_loss_and_grads(params, grid, reel, key, iter_nr, cfg)


@functools.partial(jax.jit, static_argnames=("optimizer",))
def _update_step(params, opt_state, grads, optimizer):
    return optimizer.update(grads, opt_state, params)


def train_step(params, opt_state, grid, reel: TensorReel, key, iter_nr,
               cfg: NerfTrainConfig, optimizer):
    """Two jit dispatches (grads; update) — fusing them triggers a
    pathological XLA:TPU fusion (see PERFORMANCE.md finding 5)."""
    loss, loss_rgb, grads = _grads_step(params, grid, reel, key, iter_nr, cfg)
    params, opt_state = _update_step(params, opt_state, grads, optimizer)
    return params, opt_state, loss, loss_rgb


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_rays_eval(params, grid, origins, dirs, iter_nr, cfg: NerfTrainConfig):
    """Chunk-friendly eval rendering (no jitter, no colorcal) — the
    run_net_in_chunks building block (train_nerf.py:95-151)."""
    pred_rgb, pred_rgb_bg, weights_sum, _ = _render_rays(
        params, grid, jax.random.PRNGKey(0), origins, dirs, None, iter_nr, cfg,
        jitter=False,
    )
    return pred_rgb, weights_sum


def render_image(params, grid, reel: TensorReel, img_idx: int, iter_nr,
                 cfg: NerfTrainConfig, chunk: int = 4096):
    """Full-image render in chunks -> (rgb [H,W,3], alpha [H,W,1])."""
    from permuto_sdf_tpu.datasets.tensor_reel import rays_from_frame

    h, w = reel.height, reel.width
    origins, dirs = rays_from_frame(reel.K[img_idx], reel.tf_world_cam[img_idx], w, h)
    outs, alphas = [], []
    n = origins.shape[0]
    pad = (-n) % chunk
    origins = jnp.concatenate([origins, jnp.zeros((pad, 3))], 0)
    dirs = jnp.concatenate([dirs, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))], 0)
    for i in range(0, n + pad, chunk):
        rgb, ws = render_rays_eval(
            params, grid, origins[i : i + chunk], dirs[i : i + chunk], iter_nr, cfg
        )
        outs.append(np.asarray(rgb))
        alphas.append(np.asarray(ws))
    rgb = np.concatenate(outs)[:n].reshape(h, w, 3)
    alpha = np.concatenate(alphas)[:n].reshape(h, w, 1)
    return rgb, alpha


def train(reel: TensorReel, cfg: NerfTrainConfig, nr_iters: int | None = None,
          seed: int = 0, log_every: int = 1000,
          checkpoint_path: str | None = None, experiment_name: str = "nerf",
          save_every: int = 10000):
    nr_iters = nr_iters or cfg.iter_finish_training
    # device-residency for the image stack (PERFORMANCE.md finding 17)
    from permuto_sdf_tpu.train.train_permuto_sdf import _device_resident

    reel = _device_resident(reel)
    key = jax.random.PRNGKey(seed)
    params = init_params(jax.random.fold_in(key, 0), cfg, reel.nr_images)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    grid = og.make_occupancy_grid(cfg.grid) if cfg.use_occupancy_grid else None

    history = []
    t0 = time.perf_counter()
    for it in range(nr_iters):
        key, k_step, k_grid = jax.random.split(key, 3)
        if cfg.use_occupancy_grid and it % cfg.grid_update_every == 0:
            grid = occupancy_update(params, grid, k_grid, it, cfg)
        params, opt_state, loss, loss_rgb = train_step(
            params, opt_state, grid, reel, k_step, it, cfg, optimizer
        )
        if it % log_every == 0 or it == nr_iters - 1:
            lv = float(loss)
            history.append((it, lv))
            print(f"iter {it:6d}  loss {lv:.6f}  ({time.perf_counter()-t0:.1f}s)")
        if checkpoint_path and save_every and it > 0 and it % save_every == 0:
            _save(checkpoint_path, experiment_name, it, params, grid, cfg)
    if checkpoint_path:
        _save(checkpoint_path, experiment_name, nr_iters, params, grid, cfg)
    return params, grid, history


def _save(checkpoint_path, experiment_name, it, params, grid, cfg):
    ckpt.save_model(checkpoint_path, experiment_name, it, "nerf_hash_model",
                    params["model"])
    ckpt.save_model(checkpoint_path, experiment_name, it, "nerf_hash_model_bg",
                    params["model_bg"])
    if "colorcal" in params:
        ckpt.save_model(checkpoint_path, experiment_name, it, "colorcal_model",
                        params["colorcal"])
    if grid is not None:
        ckpt.save_model(checkpoint_path, experiment_name, it, "occupancy_grid", grid)


def main():
    parser = argparse.ArgumentParser(description="Train permuto-NeRF")
    parser.add_argument("--dataset", default="synthetic",
                        help="synthetic | dtu")
    parser.add_argument("--scene_dir", default=None, help="DTU scene directory")
    parser.add_argument("--nr_iters", type=int, default=200000)
    parser.add_argument("--low_res", action="store_true")
    parser.add_argument("--with_mask", action="store_true")
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--checkpoint_path", default=None)
    parser.add_argument("--exp_info", default="")
    parser.add_argument("--config", default=None,
                        help="hjson-style config file (see config/"
                             "train_nerf.cfg)")
    parser.add_argument("--set", action="append", default=[],
                        metavar="KEY=VALUE", dest="overrides",
                        help="config override, repeatable")
    args = parser.parse_args()

    if args.dataset == "synthetic":
        from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

        reel = make_synthetic_reel(
            nr_views=8 if args.smoke else 24,
            width=64 if args.smoke else 200,
            height=64 if args.smoke else 200,
        )
    else:
        from permuto_sdf_tpu.datasets.dtu import load_dtu_scene

        reel = load_dtu_scene(args.scene_dir, low_res=args.low_res,
                              with_mask=args.with_mask)

    from permuto_sdf_tpu.config import apply_file_and_cli

    if args.smoke:
        cfg = NerfTrainConfig(with_mask=args.with_mask, capacity=2 ** 14,
                              nr_levels=8, nr_rays=256,
                              grid_nr_random_samples=4096)
        cfg = apply_file_and_cli(cfg, args.config, args.overrides)
        params, grid, history = train(reel, cfg, nr_iters=300, log_every=50)
        assert history[-1][1] < history[0][1], "smoke: loss did not decrease"
        print("SMOKE OK: loss", history[0][1], "->", history[-1][1])
    else:
        cfg = apply_file_and_cli(NerfTrainConfig(with_mask=args.with_mask),
                                 args.config, args.overrides)
        exp = "nerf" + (f"_{args.exp_info}" if args.exp_info else "")
        train(reel, cfg, nr_iters=args.nr_iters,
              checkpoint_path=args.checkpoint_path, experiment_name=exp)


if __name__ == "__main__":
    main()
