"""PermutoSDF training — the flagship pipeline.

Equivalent of ``/root/reference/permuto_sdf_py/train_permuto_sdf.py``:
recovers geometry (SDF) and appearance (RGB) from posed images via
NeuS-style volumetric rendering with an occupancy grid and SDF-guided
importance sampling. All hyperparameters and schedules mirror the
reference's ``HyperParamsPermutoSDF`` (``train_permuto_sdf.py:77-105``):

- sphere-init phase for the first 4000 iters (fit SDF to a r=0.3 sphere)
- cos anneal 0->1 and forced variance 0.3->0.8 over 35000 iters
- losses: masked L1 rgb + eikonal*0.04 (0.01 after 50k) + curvature*0.65
  annealed off at 50k-51k + offsurface*1e-4 + lipshitz*3e-6 after 50k +
  mask BCE*0.1
- 256^3 occupancy grid updated from the SDF every 8 iters
- AdamW(lr 1e-3, betas (0.9,0.99), eps 1e-15); 3000-iter linear warmup
  after sphere init; LR x0.3 at 100k/150k/180k/190k; colorcal weight decay
  1e-1 throughout; rgb-encoding weight decay 1.0 after 50k

TPU-native structure (vs the reference's per-kernel Python driving):
THREE jitted graphs — ``sphere_init_step``, ``train_step`` and
``occupancy_update`` — cover the entire iteration; sampling/importance
sampling run inside the step under stop_gradient; all shapes static
(nr_rays fixed; 64 uniform + 16 + 16 importance samples per ray dense
masked layout). Weight decay for the colorcal/rgb-encoding groups is
applied as explicit decoupled decay inside the step (optax's adamw has a
static wd, the reference flips the rgb-encoding group's wd at 50k).
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
    SDFConfig, RGBConfig, NerfHashConfig,
    init_sdf, sdf_apply, sdf_with_gradient, sdf_curvature_from_gradient,
    init_rgb, rgb_apply, init_nerf_hash, nerf_hash_apply, init_colorcal,
)
from permuto_sdf_tpu.ops.ray_primitives import Sphere
from permuto_sdf_tpu.ops import occupancy_grid as og
from permuto_sdf_tpu.ops import volume_rendering as vr
from permuto_sdf_tpu.ops.ray_sampler import compute_samples_fg, compute_samples_bg
from permuto_sdf_tpu.ops.importance_sampling import importance_sampling_sdf_model
from permuto_sdf_tpu.datasets.tensor_reel import TensorReel, random_rays_from_reel
from permuto_sdf_tpu.utils.losses import sdf_loss_sphere, map_range_val
from permuto_sdf_tpu.train import checkpoint as ckpt


@dataclasses.dataclass(frozen=True)
class PermutoSDFTrainConfig:
    # science knobs — HyperParamsPermutoSDF (train_permuto_sdf.py:77-105)
    s_mult: float = 1.0
    lr: float = 1e-3
    nr_iter_sphere_fit: int = 4000
    forced_variance_finish_iter: int = 35000
    eikonal_weight: float = 0.04
    eikonal_weight_reduced: float = 0.01
    curvature_weight: float = 0.65
    lipshitz_weight: float = 3e-6
    mask_weight: float = 0.1
    offsurface_weight: float = 1e-4
    iter_start_reduce_curv: int = 50000
    lr_milestones: tuple = (100000, 150000, 180000, 190000)
    iter_finish_training: int = 200000
    forced_variance_finish: float = 0.8
    use_occupancy_grid: bool = True
    nr_samples_bg: int = 32
    min_dist_between_samples: float = 0.0001
    max_nr_samples_per_ray: int = 64
    nr_samples_imp_sampling: int = 16
    do_importance_sampling: bool = True
    # Coarse-level SDF proxy for importance sampling (None = all levels).
    # Sample PLACEMENT only needs approximate geometry; the proxy skips the
    # gathers of the finest levels, which dominate the no-grad sampling
    # stage on TPU (XLA gathers are instance-cost-bound; see PERFORMANCE.md).
    # The final render always re-evaluates the full-resolution SDF.
    # Default 12: on the r2-era graph the truncation did not pay (737 ->
    # 752 ms/step) because the step was gather-instance-bound elsewhere;
    # on the r4 lever graph it does — 243.8 -> 223.9 ms at 1024 rays
    # (profiling/breakdown_r4.json) — and is quality-NEUTRAL at equal
    # iterations on chip (+0.44 dB fg PSNR / +0.003 IoU as part of the
    # isp12+curv8192 pack, eval_artifacts/quality_ab_r4_isp.json). The
    # proxy only PLACES samples; importance-sample z's are identical in
    # distribution up to the proxy's sub-voxel sdf error.
    imp_sampling_max_levels: int | None = 12
    # "forward" (jvp) or "reverse" (vjp, the torch-autograd analog); the
    # spatial gradients are identical either way (see models/fields.py).
    # Default reverse: measured 737 vs 780 ms/step on TPU v5e at flagship
    # scale — the 3-tangent forward pass costs more than the
    # gather-transpose it avoids (XLA already CSEs the shared gathers).
    sdf_gradient_mode: str = "reverse"
    # Static per-step budget of VALID samples the expensive field
    # evaluations pay for. The dense [R, S] layout contains invalid
    # (masked) slots — with a sparse occupancy grid most of them; the
    # render gathers the valid samples into a [budget] compacted batch
    # (jnp.nonzero with static size), runs SDF/RGB/curvature there, and
    # scatters back for the per-ray NeuS math. This is the TPU counterpart
    # of the reference's compact_to_valid_samples (RaySamplesPacked.cu:57)
    # + its fixed target_nr_of_samples=512*(64+16+16) budget
    # (train_permuto_sdf.py:104): the dynamic ray rebalancer keeps the
    # valid count near the target, the budget bounds the compiled shape at
    # 1.25x that. Valid samples beyond the budget are dropped from the
    # batch (mask updated, so every consumer agrees); the rebalancer then
    # shrinks the ray count. None disables compaction (tiny smoke configs).
    render_sample_budget: int | None = 512 * (64 + 16 + 16) * 5 // 4
    use_color_calibration: bool = True
    nr_rays: int = 512
    sdf_geom_feat_size: int = 32
    sdf_nr_iters_for_c2f: int = 10000
    rgb_nr_iters_for_c2f: int = 1
    background_nr_iters_for_c2f: int = 1
    with_mask: bool = False
    warmup_iters: int = 3000
    lr_decay_gamma: float = 0.3
    sphere_init_points: int = 30000
    sphere_init_radius: float = 0.3
    grid_nr_voxels_per_dim: int = 256
    grid_update_every: int = 8
    grid_nr_random_samples: int = 256 * 256 * 4
    grid_occupancy_thresh: float = 1e-4
    # Curvature-loss sample budget (None = all valid render samples, the
    # reference's behavior). The curvature term needs a SECOND
    # sdf_with_gradient evaluation at tangent-shifted points — at the
    # flagship scale it is the single most expensive loss term (~126 ms of
    # a 493 ms step, PERFORMANCE.md finding 9) while being a pure
    # regularizer: a stochastic subsample gives an unbiased estimate of
    # the same mean-curvature penalty with proportionally less gather
    # traffic. The subset is the compaction-order prefix — rays are drawn
    # uniformly at random every step, so the prefix is a random ray
    # subset. Reference behavior at curvature_sample_budget=None
    # (train_permuto_sdf.py:352-366 evaluates all samples).
    # Default 8192 (was 16384): 243.8 -> 232.6 ms at 1024 rays
    # (profiling/breakdown_r4.json) and quality-neutral on chip at equal
    # iterations (eval_artifacts/quality_ab_r4_isp.json — the curvature
    # term is annealed to zero mid-training anyway).
    curvature_sample_budget: int | None = 8192
    # Train-time per-sample level-of-detail (the training analog of the
    # finding-20 eval LOD renderer — VERDICT r3 item 1b). The importance
    # sampler already evaluates a (stop-gradient) proxy SDF at every
    # sample it places; carrying those values through the final merge
    # makes a per-ray ranking FREE: NeuS weights computed from the carried
    # sdf with a finite-difference cos pick the ``train_lod_top_k``
    # samples per ray that carry the rendering weight mass, and only
    # those pay the full-resolution SDF-with-gradient + RGB evaluation
    # (the dominant gather/scatter instance cost of the step —
    # PERFORMANCE.md finding 14). Non-selected samples keep their carried
    # sdf in the transmittance chain (stop-gradient, like the reference's
    # no-grad sampling stage) with finite-difference cos. To keep the
    # eikonal regularizer covering occupied space away from the surface
    # (not just the weight-ranked crossing band), ``train_lod_rand_extra``
    # uniformly random additional valid samples per ray join the
    # full-resolution set. None = reference behavior (every valid sample
    # at full resolution).
    train_lod_top_k: int | None = None
    train_lod_rand_extra: int = 8
    # Hit-ray compaction (r5): at a sparse steady-state occupancy most
    # sampled rays carry ZERO valid samples (they never cross an occupied
    # voxel), yet the dense [R, S] layout pays the full-resolution
    # SDF+RGB encode/VJP gather+scatter instances — the dominant step cost
    # (PERFORMANCE.md finding 33) — for their LOD-selected slots too. The
    # reference never pays this: its packed buffer holds only the samples
    # of rays that hit occupied space (atomicAdd allocation,
    # src/RaySamplesPacked.cu:19-42; rays with <=2 samples are zeroed,
    # RaySamplerGPU.cuh:316-322). This is the static-shape equivalent:
    # after sampling, rays with any valid sample are compacted into a
    # ``ceil(R * hit_ray_frac)`` bucket (rounded up to 64); the whole fg
    # field-evaluation + NeuS chain runs on that sub-batch; per-ray
    # outputs scatter back (miss rays: rgb 0, weights_sum 0,
    # bg_transmittance 1 — exactly what the dense path computes for them).
    # EXACT by construction while hit rays fit the bucket (tested); on
    # overflow the last hit rays are dropped for one step, like the
    # reference's buffer-overflow ray skip (VolumeRenderingGPU.cuh:103).
    # None disables (reference dense behavior).
    hit_ray_frac: float | None = None
    # Compaction point. True (default): compact right after the uniform
    # occupancy sampler, so the importance-sampling stage (per-ray CDF
    # build/inversion, z-merge, proxy-eval bookkeeping) also runs on the
    # hit sub-batch — the hit set is identical either way (importance
    # sampling cannot add samples to an empty ray). The importance
    # jitter's RNG is then drawn at the compacted shape, so outputs match
    # the dense path bit-for-bit only with jitter off (tested); with
    # jitter on the draws differ in realization, not distribution.
    # False: compact after sampling (bitwise-exact vs dense incl. jitter;
    # the r5 quality A/B arm measured this variant).
    hit_ray_compact_early: bool = True
    # Iteration (post-sphere-init) before which train() strips the
    # APPROXIMATING throughput levers (train-LOD, table-grad alternation)
    # and runs the exact step. Rationale: in no-mask training the fg/bg
    # separation forms during the cos/variance anneal, and the LOD's
    # mixed transmittance chain biases that race hard — the r5 bisect
    # (eval_artifacts/nomask_bisect_r5.json) measured 6.9 dB fg with the
    # levers on from iter 0 vs 24.8 dB without, while with_mask is
    # immune (the mask BCE pins weights_sum; 12k flagship validation in
    # mask_quality_run_r5.json). Hit-ray compaction is exactness-guarded
    # and stays on throughout. None = AUTO: 0 (levers always on) when
    # with_mask, ``forced_variance_finish_iter`` (levers on once the
    # cos/variance anneal — the formation phase — ends) when no-mask.
    # The bench measures the post-anneal steady state, so the gate
    # changes warmup cost only.
    lever_start_iter: int | None = None
    # SDF proxy level count for occupancy updates. The occupancy test
    # thresholds the NeuS logistic density of max(|sdf| - 1.3*half_diag, 0):
    # at 256^3 the half-diagonal is 3.4e-3 while levels >= 17 have scales
    # < 1.1e-3 (geomspace 1 -> 1e-4 over 24) — strictly sub-voxel detail
    # that cannot flip a voxel's band test. Evaluating 17/24 levels cuts
    # the update's gather cost ~30% (the zero-fill concat that previously
    # made proxies unprofitable is gone — sdf_apply slices the first MLP
    # layer instead). None = all levels.
    # Default 14 (was 17): level 14's scale (10^(-4*14/23) ~= 3.7e-3) is
    # already at the 256^3 half-diagonal (3.4e-3). Measured on the TRAINED
    # flagship sdf (fine levels carrying real geometry): update 171.6 ->
    # 104.2 ms with bitfield IoU 0.99987 vs the full-level update — the
    # SAME 16/184547 missed voxels as max_levels=17
    # (profiling/breakdown_r4.json); misses are transient across the
    # every-8-iters stratified refresh.
    grid_update_max_levels: int | None = 14
    # encoding sizes (shrink for smoke tests)
    capacity: int = 2 ** 18
    nr_levels: int = 24
    # Background NeRF++ field level count (None = nr_levels, the
    # reference's choice — models.py:434-442 reuses the fg encoding
    # params for bg). The bg field renders far-field low-parallax
    # content; a smaller bg encoding is a candidate throughput lever in
    # no-mask training (the bg encode/VJP costs ~57 ms of the 243 ms
    # 1024-ray step, PERFORMANCE.md finding 30) — only adopted if the
    # full-image quality A/B (bg_quality protocol) is neutral.
    bg_nr_levels: int | None = None
    # static graph switches: the reference's Python `if`s become separate
    # compiled variants. enable_curvature should be flipped off by the host
    # once global_weight_curvature reaches 0 (train() does this), exactly
    # like the reference stops computing the term
    # (train_permuto_sdf.py:358-363).
    enable_curvature: bool = True
    enable_eikonal: bool = True
    enable_offsurface: bool = True
    enable_lipshitz: bool = True
    # Row-2 f32 table gathers (fastest measured lookup form on v5e AND
    # full precision — ops/permuto_encoding.py::row2_gather_pair,
    # eval_artifacts/roofline2.json). Off = bf16-packed word gathers (the
    # r2/r3 path), kept for A/B.
    table_row_gather: bool = True
    # Sorted-scatter backward for the packed hash-table gathers: one
    # explicit multi-payload sort + indices_are_sorted segment-sums per
    # VJP instead of XLA's per-scatter internal sort (finding 18 A/B).
    sorted_scatter: bool = False
    # Alternating-level table gradients: train() alternates
    # table_grad_parity 0/1 per iteration so each step emits backward
    # scatters for only half the hash-table levels (the dominant
    # per-instance cost — finding 14); every level still updates every
    # second step. Two compiled step variants. See
    # PermutoEncodingSpec.grad_level_parity.
    table_grad_alternate: bool = False
    table_grad_parity: int | None = None  # driven by train(), not by hand
    # alternation period: parity cycles it % period, each level's table
    # updates every ``period`` steps (PermutoEncodingSpec.grad_level_period)
    table_grad_period: int = 2
    # Coarse-to-fine level skipping (VERDICT r3 item 1a): during the SDF's
    # c2f ease-in, levels whose window weight is still exactly 0 pay no
    # gathers — train() drives sdf_active_levels from the c2f front,
    # quantized UP to multiples of 4 (so nothing nonzero is ever clipped
    # and the ease-in costs at most ceil(nr_levels/4) recompiles).
    c2f_level_skip: bool = True
    sdf_active_levels: int | None = None  # driven by train(), not by hand

    @property
    def iter_finish_reduce_curv(self) -> int:
        return self.iter_start_reduce_curv + 1001

    @property
    def sdf_model(self) -> SDFConfig:
        return SDFConfig(
            in_channels=3, geom_feat_size_out=self.sdf_geom_feat_size,
            nr_iters_for_c2f=self.sdf_nr_iters_for_c2f,
            capacity=self.capacity, nr_levels=self.nr_levels,
            gradient_mode=self.sdf_gradient_mode,
            sorted_scatter=self.sorted_scatter,
            table_row_gather=self.table_row_gather,
            grad_level_parity=self.table_grad_parity,
            grad_level_period=self.table_grad_period,
            active_levels=self.sdf_active_levels,
        )

    @property
    def rgb_model(self) -> RGBConfig:
        return RGBConfig(
            in_channels=3, geom_feat_size_in=self.sdf_geom_feat_size,
            nr_iters_for_c2f=self.rgb_nr_iters_for_c2f,
            capacity=self.capacity, nr_levels=self.nr_levels,
            sorted_scatter=self.sorted_scatter,
            table_row_gather=self.table_row_gather,
            grad_level_parity=self.table_grad_parity,
            grad_level_period=self.table_grad_period,
        )

    @property
    def bg_model(self) -> NerfHashConfig:
        return NerfHashConfig(
            in_channels=4, nr_iters_for_c2f=self.background_nr_iters_for_c2f,
            capacity=self.capacity,
            nr_levels=(self.bg_nr_levels if self.bg_nr_levels is not None
                       else self.nr_levels),
            sorted_scatter=self.sorted_scatter,
            table_row_gather=self.table_row_gather,
            grad_level_parity=self.table_grad_parity,
            grad_level_period=self.table_grad_period,
        )

    @property
    def grid(self) -> og.OccupancyGridConfig:
        return og.OccupancyGridConfig(nr_voxels_per_dim=self.grid_nr_voxels_per_dim)


BOUND = Sphere(0.5, (0.0, 0.0, 0.0))


# ---------------------------------------------------------------------------
# Params / optimizer / schedules
# ---------------------------------------------------------------------------

def init_params(key, cfg: PermutoSDFTrainConfig, nr_cams: int):
    k_sdf, k_rgb, k_bg = jax.random.split(key, 3)
    params = {
        "sdf": init_sdf(k_sdf, cfg.sdf_model),
        "rgb": init_rgb(k_rgb, cfg.rgb_model),
        "bg": init_nerf_hash(k_bg, cfg.bg_model),
        "variance": vr.init_variance(0.3),
    }
    if cfg.use_color_calibration:
        params["colorcal"] = init_colorcal(nr_cams)
    return params


def lr_schedule(cfg: PermutoSDFTrainConfig, iter_nr):
    """Reference LR behavior: flat during sphere init; then linear warmup
    over 3000 iters; x0.3 at each milestone (milestones measured in
    post-sphere-init iters, matching the scheduler stepping of
    train_permuto_sdf.py:419-422)."""
    it = jnp.asarray(iter_nr, jnp.float32)
    s = it - cfg.nr_iter_sphere_fit  # post-sphere-init step count
    warm = jnp.clip(s / cfg.warmup_iters, 0.0, 1.0)
    n_milestones = jnp.sum(
        s[None] >= jnp.asarray(cfg.lr_milestones, jnp.float32)
        if s.ndim else s >= jnp.asarray(cfg.lr_milestones, jnp.float32)
    )
    decay = cfg.lr_decay_gamma ** n_milestones.astype(jnp.float32)
    in_sphere_init = it < cfg.nr_iter_sphere_fit
    return jnp.where(in_sphere_init, cfg.lr, cfg.lr * warm * decay)


def make_optimizer(cfg: PermutoSDFTrainConfig):
    from permuto_sdf_tpu.train.optimizers import ManualAdam

    return ManualAdam(b1=0.9, b2=0.99, eps=1e-15)


def _apply_weight_decay(params, lr_now, iter_nr, cfg: PermutoSDFTrainConfig):
    """Decoupled AdamW-style decay for the two groups the reference decays:
    colorcal (wd 1e-1 always) and the rgb encoding lattice (wd 1.0 after
    iter_start_reduce_curv) — train_permuto_sdf.py:299,399-403."""
    if "colorcal" in params:
        cc = params["colorcal"]
        factor = 1.0 - lr_now * 1e-1
        params = {**params, "colorcal": jax.tree_util.tree_map(lambda x: x * factor, cc)}
    rgb_wd_on = (iter_nr - cfg.nr_iter_sphere_fit) >= cfg.iter_start_reduce_curv
    factor = jnp.where(rgb_wd_on, 1.0 - lr_now * 1.0, 1.0)
    rgb = params["rgb"]
    rgb = {**rgb, "encoding": {**rgb["encoding"],
                               "lattice_values": rgb["encoding"]["lattice_values"] * factor}}
    return {**params, "rgb": rgb}


# ---------------------------------------------------------------------------
# Rendering (run_net equivalent, train_permuto_sdf.py:111-169)
# ---------------------------------------------------------------------------

def _create_fg_samples(params, grid, key, origins, dirs, t_entry, t_exit,
                       iter_nr_anneal, cfg: PermutoSDFTrainConfig, jitter: bool):
    """Uniform occupancy sampling + importance sampling. Returns
    (samples, ray_idx, ray_valid, pre): with early hit-ray compaction
    (cfg.hit_ray_compact_early) ray_idx/ray_valid map the compacted ray
    batch back to the full one and ``pre`` carries the PRE-compaction
    counts (total hit rays, total valid uniform samples) the rebalancer
    estimate needs; otherwise ray_idx is None."""
    k_uni, k_imp = jax.random.split(key)
    if cfg.use_occupancy_grid and grid is not None:
        samples = og.compute_samples_in_occupied_regions(
            cfg.grid, grid, origins, dirs, t_entry, t_exit,
            cfg.min_dist_between_samples, cfg.max_nr_samples_per_ray,
            key=k_uni, jitter=jitter,
        )
    else:
        samples = compute_samples_fg(
            origins, dirs, t_entry, t_exit, cfg.min_dist_between_samples,
            cfg.max_nr_samples_per_ray, key=k_uni, jitter=jitter,
        )
    ray_idx = ray_valid = None
    pre = {}
    if (cfg.hit_ray_frac is not None and cfg.hit_ray_frac < 1.0
            and cfg.hit_ray_compact_early):
        R0 = samples.mask.shape[0]
        hit = samples.valid_rays()
        pre["nr_hit_rays"] = jnp.sum(hit)
        ray_idx, ray_valid = _compact_idx(hit,
                                          _hit_ray_budget(R0, cfg.hit_ray_frac))
        samples = _take_rays(samples, ray_idx, ray_valid)
        t_exit = _pad_one(t_exit)[ray_idx]
    if cfg.do_importance_sampling:
        budget = cfg.render_sample_budget

        def sdf_fn(pts, flat_mask):
            return _masked_sdf_value(
                params["sdf"], pts, flat_mask, iter_nr_anneal, cfg.sdf_model,
                budget, max_levels=cfg.imp_sampling_max_levels,
            )

        samples = importance_sampling_sdf_model(
            sdf_fn, samples, t_exit, k_imp, cfg.nr_samples_imp_sampling,
            jitter=jitter, masked=True,
            carry_sdf=cfg.train_lod_top_k is not None,
        )
    samples = jax.tree_util.tree_map(jax.lax.stop_gradient, samples)
    return samples, ray_idx, ray_valid, pre


def _compact_idx(flat_mask, budget: int):
    """First ``budget`` valid flat indices (row-major => whole rays first,
    then a valid PREFIX of the next ray — the prefix-mask invariant holds
    for whatever survives). fill_value = M marks unused bucket slots."""
    M = flat_mask.shape[0]
    (idx,) = jnp.nonzero(flat_mask, size=budget, fill_value=M)
    return idx, idx < M


def _pad_one(a, fill=0.0):
    pad = jnp.full((1,) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([a, pad], axis=0)


def _hit_ray_budget(nr_rays: int, frac: float) -> int:
    """Static hit-ray bucket size: ceil(R*frac) rounded up to 64."""
    h = -(-int(nr_rays * frac) // 64) * 64
    return max(64, min(nr_rays, h))


def _take_rays(samples, ray_idx, ray_valid):
    """Gather a static-size ray subset from a RaySamples batch. Fill
    entries of ``ray_idx`` (== R) land on an appended all-invalid pad ray;
    the mask is additionally cleared at invalid bucket slots, so overflow
    and fill rows are indistinguishable from miss rays downstream."""
    def take(a, fill=0.0):
        return None if a is None else _pad_one(a, fill)[ray_idx]

    mask = take(samples.mask, False) & ray_valid[:, None]
    return dataclasses.replace(
        samples,
        origins=take(samples.origins), dirs=take(samples.dirs),
        z=take(samples.z), dt=take(samples.dt), mask=mask,
        ray_fixed_dt=take(samples.ray_fixed_dt),
        sdf=take(samples.sdf), pos_4d=take(samples.pos_4d),
    )


def _scatter_rays(x, ray_idx, nr_rays: int, fill):
    """Scatter per-ray values from the hit-compacted batch back to the
    full ray batch (miss rays get ``fill``). Fill-indexed writes land on a
    dropped pad row."""
    base = jnp.full((nr_rays + 1,) + x.shape[1:], fill, x.dtype)
    return base.at[ray_idx].set(x)[:nr_rays]


def _masked_sdf_value(params_sdf, pts_flat, flat_mask, iter_nr, sdf_cfg,
                      budget, max_levels=None):
    """sdf at the VALID flat positions only (compacted, static budget);
    invalid/overflow slots report far-from-surface (+1e3) so downstream
    CDF building never places importance samples there."""
    M = pts_flat.shape[0]
    if budget is None or budget >= M:
        return sdf_apply(params_sdf, pts_flat, iter_nr, sdf_cfg,
                         max_levels=max_levels)[0]
    idx, valid = _compact_idx(flat_mask, budget)
    pts_c = _pad_one(pts_flat)[idx]
    sdf_c = sdf_apply(params_sdf, pts_c, iter_nr, sdf_cfg,
                      max_levels=max_levels)[0].reshape(-1)
    out = jnp.full((M + 1,), 1e3, pts_flat.dtype).at[idx].set(sdf_c)
    return out[:M][:, None]


def run_net(params, grid, key, origins, dirs, img_indices, iter_nr_anneal,
            cos_anneal_ratio, forced_variance, cfg: PermutoSDFTrainConfig,
            jitter: bool):
    """Returns (pred_rgb, pred_normals, compact, weights_sum, samples,
    inv_s, does_intersect) where ``compact`` carries the compacted per-
    sample quantities the losses consume: dict(pos [B,3], sdf [B],
    grads [B,3], valid [B])."""
    _, t_entry, _, t_exit, does_intersect = BOUND.ray_intersection(origins, dirs)
    k_samp, k_bg, k_sel = jax.random.split(key, 3)
    samples, ray_idx, ray_valid, pre = _create_fg_samples(
        params, grid, k_samp, origins, dirs, t_entry, t_exit,
        iter_nr_anneal, cfg, jitter)
    R0 = origins.shape[0]
    img_indices_fg = img_indices
    if ray_idx is not None:
        # EARLY hit-ray compaction happened inside _create_fg_samples:
        # estimate the full-batch valid count for the rebalancer by
        # scaling the kept rays' count up by the (rare) overflow ratio
        kept_hits = jnp.maximum(jnp.sum(ray_valid), 1)
        scale = pre["nr_hit_rays"].astype(jnp.float32) / kept_hits
        nr_samples_total = (jnp.sum(samples.mask) * scale).astype(jnp.int32)
        nr_hit_rays = pre["nr_hit_rays"]
    else:
        nr_samples_total = jnp.sum(samples.mask)
        nr_hit_rays = jnp.sum(samples.valid_rays())
        if cfg.hit_ray_frac is not None and cfg.hit_ray_frac < 1.0:
            # LATE compaction (hit_ray_compact_early=False): bitwise-exact
            # vs the dense path; the fg field evaluation below runs on
            # the hit-ray sub-batch only
            ray_idx, ray_valid = _compact_idx(
                samples.valid_rays(), _hit_ray_budget(R0, cfg.hit_ray_frac))
            samples = _take_rays(samples, ray_idx, ray_valid)
    if ray_idx is not None and img_indices is not None:
        img_indices_fg = _pad_one(img_indices, 0)[ray_idx]
    R, S = samples.mask.shape
    M = R * S
    budget = min(M, cfg.render_sample_budget) if cfg.render_sample_budget else M
    inv_s = vr.variance_inv_s(params["variance"], forced_variance)

    use_train_lod = (cfg.train_lod_top_k is not None
                     and cfg.do_importance_sampling and samples.sdf is not None)
    if use_train_lod:
        # --- train-time LOD: rank samples by carried-sdf NeuS weights and
        # evaluate full resolution only at top-K (+ E random) per ray ---
        K = min(cfg.train_lod_top_k, S)
        E = min(cfg.train_lod_rand_extra, S - K)
        sdf_carried = samples.sdf  # stop-gradient (no-grad sampling stage)
        cos_fd = vr.finite_difference_cos(samples, sdf_carried)
        w_rank, _, _ = vr.neus_compute_weights_from_cos(
            samples, sdf_carried, cos_fd, inv_s, cos_anneal_ratio)
        rows = jnp.arange(R)[:, None]
        _, ik = jax.lax.top_k(jnp.where(samples.mask, w_rank, -1.0), K)
        if E > 0:
            # draw at the PRE-compaction shape so the hit-compacted path
            # selects bit-identical random slots to the dense path
            scores = jax.random.uniform(k_sel, (R0, S))
            if ray_idx is not None:
                scores = _pad_one(scores, -1.0)[ray_idx]
            scores = scores.at[rows, ik].set(-1.0)  # exclude the top-K slots
            scores = jnp.where(samples.mask, scores, -1.0)
            _, ie = jax.lax.top_k(scores, E)
            sel = jnp.concatenate([ik, ie], axis=1)  # [R, K+E], unique slots
        else:
            sel = ik
        KE = sel.shape[1]
        idx = (rows * S + sel).reshape(-1)  # flat, always in range
        valid_c = jnp.take(samples.flat_mask(), idx)
        pos_c = samples.flat_positions()[idx]
        dirs_c = samples.flat_dirs()[idx]
    elif budget < M:
        # --- compact the valid samples (see render_sample_budget docstring)
        idx, valid_c = _compact_idx(samples.flat_mask(), budget)
        # drop overflow samples from the batch so every consumer agrees
        kept = jnp.zeros((M + 1,), bool).at[idx].set(valid_c)[:M]
        samples = dataclasses.replace(
            samples, mask=kept.reshape(R, S) & samples.mask
        )
        pos_c = _pad_one(samples.flat_positions())[idx]
        dirs_c = _pad_one(samples.flat_dirs())[idx]
    else:
        idx, valid_c = None, samples.flat_mask()
        pos_c = samples.flat_positions()
        dirs_c = samples.flat_dirs()

    sdf_c, grads_c, geom_c = sdf_with_gradient(
        params["sdf"], pos_c, iter_nr_anneal, cfg.sdf_model
    )

    colorcal = params.get("colorcal")
    per_sample_img = (
        jnp.broadcast_to(img_indices_fg[:, None], (R, S)).reshape(-1)
        if img_indices_fg is not None else None
    )
    if per_sample_img is not None and idx is not None:
        if use_train_lod:
            per_sample_img = per_sample_img[idx]
        else:
            per_sample_img = _pad_one(per_sample_img)[idx]
    cc = colorcal if (colorcal is not None and img_indices is not None) else None
    rgb_c = rgb_apply(
        params["rgb"], pos_c, dirs_c, grads_c, geom_c,
        iter_nr_anneal, cfg.rgb_model, colorcal_params=cc,
        per_sample_img_indices=per_sample_img,
    )

    compact = {"pos": pos_c, "sdf": sdf_c, "grads": grads_c, "valid": valid_c,
               # sample accounting: total = all valid samples the samplers
               # produced (the rebalancer's signal); rendered = what the
               # step actually carried through the transmittance chain
               # (differs only when a compaction budget overflowed)
               "nr_samples_total": nr_samples_total,
               "nr_samples_rendered": jnp.sum(samples.mask),
               "nr_hit_rays": nr_hit_rays}

    if use_train_lod:
        # --- mixed per-ray arrays: full-resolution sdf / analytic cos at
        # the selected slots, carried sdf / finite-difference cos elsewhere
        vc = valid_c
        sdf_flat = sdf_carried.reshape(-1).at[idx].set(
            jnp.where(vc, sdf_c.reshape(-1), sdf_carried.reshape(-1)[idx]))
        cos_sel = jnp.sum(dirs_c * grads_c, axis=-1)
        cos_flat = cos_fd.reshape(-1).at[idx].set(
            jnp.where(vc, cos_sel, cos_fd.reshape(-1)[idx]))
        weights, weights_sum, bg_transmittance = vr.neus_compute_weights_from_cos(
            samples, sdf_flat.reshape(R, S), cos_flat.reshape(R, S),
            inv_s, cos_anneal_ratio)
        w_sel = jnp.take(weights.reshape(-1), idx).reshape(R, KE)
        w_sel = jnp.where(valid_c.reshape(R, KE), w_sel, 0.0)
        pred_rgb = jnp.sum(w_sel[..., None] * rgb_c.reshape(R, KE, 3), axis=1)
        grad_int = jnp.sum(w_sel[..., None] * grads_c.reshape(R, KE, 3), axis=1)
    else:
        # --- scatter back to the dense [R, S] layout for the per-ray math
        if idx is not None:
            vc = valid_c[:, None]
            sdf = jnp.zeros((M + 1, 1)).at[idx].set(sdf_c * vc)[:M]
            sdf_gradients = jnp.zeros((M + 1, 3)).at[idx].set(grads_c * vc)[:M]
            rgb_flat = jnp.zeros((M + 1, 3)).at[idx].set(rgb_c * vc)[:M]
        else:
            sdf, sdf_gradients, rgb_flat = sdf_c, grads_c, rgb_c

        weights, weights_sum, bg_transmittance = vr.neus_compute_weights(
            samples, sdf, sdf_gradients, inv_s, cos_anneal_ratio
        )
        # zero weights at invalid samples of fully-masked rays already handled
        pred_rgb = vr.integrate_with_weights(rgb_flat.reshape(R, S, 3), weights,
                                             samples.mask)
        grad_int = vr.integrate_with_weights(sdf_gradients.reshape(R, S, 3),
                                             weights, samples.mask)
    pred_normals = grad_int / (jnp.linalg.norm(grad_int, axis=-1, keepdims=True) + 1e-12)

    if ray_idx is not None:
        # scatter the hit-compacted per-ray results back to the full batch;
        # miss rays get exactly what the dense path computes for them
        pred_rgb = _scatter_rays(pred_rgb, ray_idx, R0, 0.0)
        pred_normals = _scatter_rays(pred_normals, ray_idx, R0, 0.0)
        weights_sum = _scatter_rays(weights_sum, ray_idx, R0, 0.0)
        bg_transmittance = _scatter_rays(bg_transmittance, ray_idx, R0, 1.0)

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
        rgb_bg, dens_bg = nerf_hash_apply(
            params["bg"], bg_samples.pos_4d.reshape(-1, 4), bg_samples.flat_dirs(),
            iter_nr_anneal, cfg.bg_model, colorcal_params=cc,
            per_sample_img_indices=per_sample_img_bg,
        )
        w_bg, _, _ = vr.nerf_compute_weights(bg_samples, dens_bg)
        pred_rgb_bg = vr.integrate_with_weights(rgb_bg.reshape(Rb, Sb, 3), w_bg,
                                                bg_samples.mask)
        pred_rgb = pred_rgb + bg_transmittance[:, None] * pred_rgb_bg

    return (pred_rgb, pred_normals, compact, weights_sum, samples, inv_s,
            does_intersect)


# ---------------------------------------------------------------------------
# Jitted steps
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "optimizer"))
def sphere_init_step(params, opt_state, key, iter_nr, cfg: PermutoSDFTrainConfig,
                     optimizer):
    """Fit the SDF to a r=0.3 sphere (train_permuto_sdf.py:327-329 ->
    permuto_sdf_utils.py:53-77)."""
    pts = BOUND.rand_points_inside(key, cfg.sphere_init_points)

    def loss_fn(p):
        sdf, grads, _ = sdf_with_gradient(p["sdf"], pts, iter_nr, cfg.sdf_model)
        loss, loss_sdf, loss_eik = sdf_loss_sphere(
            pts, sdf, grads, cfg.sphere_init_radius, (0.0, 0.0, 0.0)
        )
        return loss, (loss_sdf, loss_eik)

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    lr_now = lr_schedule(cfg, iter_nr)
    params, opt_state = optimizer.update(grads, opt_state, params,
                                         jnp.reshape(lr_now, (1,)))
    return params, opt_state, loss


# ---------------------------------------------------------------------------
# Static-key canonicalization: the host mutates cfg mid-run (ray bucket,
# table-grad parity, c2f level front, hit fraction, enable flags) and cfg is
# the static jit key — but the optimizer-update and occupancy-update graphs
# do not depend on most of those fields. Normalizing the irrelevant fields
# before the call keeps those graphs alive across every such mutation
# (each spurious re-jit used to block the host 20-80 s on a cold cache —
# VERDICT r4 missing #5). Fails CLOSED: a field not listed here merely
# causes an extra recompile, never a wrong graph.
# ---------------------------------------------------------------------------

# fields irrelevant to apply_updates/lr_schedule/_apply_weight_decay (which
# read only: lr, warmup_iters, lr_milestones, lr_decay_gamma,
# nr_iter_sphere_fit, iter_start_reduce_curv; grads pytree structure is the
# full params structure regardless of parity/LOD/act)
_UPDATE_IRRELEVANT = dict(
    nr_rays=512, table_grad_alternate=False, table_grad_parity=None,
    table_grad_period=2, sdf_active_levels=None, hit_ray_frac=None,
    train_lod_top_k=None, train_lod_rand_extra=8, enable_curvature=True,
    enable_eikonal=True, enable_offsurface=True, enable_lipshitz=True,
    c2f_level_skip=True, with_mask=False,
)

# fields irrelevant to the occupancy update (a fwd-only sdf probe eval:
# no rays, no grads, no rgb/bg model, no losses). sdf_active_levels is
# KEPT — the c2f front legitimately changes the probe's encode graph.
_OCC_IRRELEVANT = dict(
    nr_rays=512, table_grad_alternate=False, table_grad_parity=None,
    table_grad_period=2, hit_ray_frac=None, train_lod_top_k=None,
    train_lod_rand_extra=8, enable_curvature=True, enable_eikonal=True,
    enable_offsurface=True, enable_lipshitz=True, with_mask=False,
)


@functools.lru_cache(maxsize=None)
def _canon_update_cfg(cfg: PermutoSDFTrainConfig) -> PermutoSDFTrainConfig:
    return dataclasses.replace(cfg, **_UPDATE_IRRELEVANT)


@functools.lru_cache(maxsize=None)
def _canon_occ_cfg(cfg: PermutoSDFTrainConfig) -> PermutoSDFTrainConfig:
    return dataclasses.replace(cfg, **_OCC_IRRELEVANT)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _occupancy_update_jit(params, grid, key, iter_nr_anneal, inv_s,
                          cfg: PermutoSDFTrainConfig):
    return _occupancy_update_impl(params, grid, key, iter_nr_anneal, inv_s,
                                  cfg)


def occupancy_update(params, grid, key, iter_nr_anneal, inv_s,
                     cfg: PermutoSDFTrainConfig):
    """SDF-based occupancy refresh (train_permuto_sdf.py:386-392).

    Uses the coarse-level SDF proxy (``grid_update_max_levels``): at 256^3
    the voxel size is far coarser than the finest encoding levels, so the
    occupancy band test never depends on them.

    Voxel selection is STRATIFIED (bijective cycling, full grid coverage
    every nr_voxels/nr_samples updates) rather than the reference's iid
    random subset — see compute_stratified_sample_of_grid_points.

    The jit key is the CANONICALIZED cfg (see _canon_occ_cfg): host-driven
    mutations of ray bucket / parity / hit fraction / enable flags never
    recompile this graph. Scalar args are dtype-normalized (weak-typed
    python ints / the first weak-typed inv_s vs later graph-output inv_s
    used to silently compile the graph twice)."""
    return _occupancy_update_jit(params, grid, key,
                                 jnp.asarray(iter_nr_anneal, jnp.int32),
                                 jnp.asarray(inv_s, jnp.float32),
                                 _canon_occ_cfg(cfg))


def _occupancy_update_impl(params, grid, key, iter_nr_anneal, inv_s,
                           cfg: PermutoSDFTrainConfig):
    update_idx = jnp.asarray(iter_nr_anneal // cfg.grid_update_every,
                             jnp.uint32)
    centers, lin = og.compute_stratified_sample_of_grid_points(
        cfg.grid, key, cfg.grid_nr_random_samples, update_idx, jitter=True
    )
    max_levels = cfg.grid_update_max_levels
    if max_levels is None:
        max_levels = cfg.imp_sampling_max_levels
    sdf, _ = sdf_apply(params["sdf"], centers, iter_nr_anneal, cfg.sdf_model,
                       max_levels=max_levels)
    return og.update_with_sdf_random_sample(
        cfg.grid, grid, lin, sdf, inv_s, cfg.grid_occupancy_thresh
    )


@functools.lru_cache(maxsize=None)
def make_dp_occupancy_update(mesh, cfg: PermutoSDFTrainConfig):
    """Occupancy refresh under the device mesh: each device evaluates the
    SDF on 1/D of the stratified probe points (the expensive part — 262k
    encodes at flagship scale), the per-sample sdf values are all-gathered
    (~1 MB over ICI), and every device applies the identical update so the
    grid stays bitwise replicated. Same math as :func:`occupancy_update`
    (the voxel ids and probe jitter derive from the shared key)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from permuto_sdf_tpu.parallel.mesh import RAY_AXIS

    n_dev = mesh.devices.size
    n_samples = cfg.grid_nr_random_samples
    assert n_samples % n_dev == 0, (n_samples, n_dev)
    local = n_samples // n_dev

    def body(params, grid, key, iter_nr_anneal, inv_s):
        update_idx = jnp.asarray(iter_nr_anneal // cfg.grid_update_every,
                                 jnp.uint32)
        centers, lin = og.compute_stratified_sample_of_grid_points(
            cfg.grid, key, n_samples, update_idx, jitter=True
        )
        d_idx = jax.lax.axis_index(RAY_AXIS)
        centers_local = jax.lax.dynamic_slice_in_dim(centers, d_idx * local,
                                                     local)
        max_levels = cfg.grid_update_max_levels
        if max_levels is None:
            max_levels = cfg.imp_sampling_max_levels
        sdf_local, _ = sdf_apply(params["sdf"], centers_local, iter_nr_anneal,
                                 cfg.sdf_model, max_levels=max_levels)
        sdf = jax.lax.all_gather(sdf_local, RAY_AXIS, axis=0, tiled=True)
        return og.update_with_sdf_random_sample(
            cfg.grid, grid, lin, sdf, inv_s, cfg.grid_occupancy_thresh
        )

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def compute_loss_and_grads(params, grid, reel: TensorReel, key, iter_nr,
                           cfg: PermutoSDFTrainConfig):
    """Pure gradient computation for one ray batch — the unit that data
    parallelism shards over devices (rays are embarrassingly parallel; see
    permuto_sdf_tpu.parallel). Returns (loss, aux, grads)."""
    iter_nr_anneal = iter_nr - cfg.nr_iter_sphere_fit
    cos_anneal_ratio = map_range_val(
        iter_nr_anneal, 0.0, cfg.forced_variance_finish_iter, 0.0, 1.0
    )
    forced_variance = map_range_val(
        iter_nr_anneal, 0.0, cfg.forced_variance_finish_iter, 0.3,
        cfg.forced_variance_finish,
    )

    k_rays, k_render, k_curv, k_off = jax.random.split(key, 4)
    # gt is mask-multiplied ONLY in mask-supervised mode: in no-mask mode
    # the model must fit real background pixels or the NeRF++ background
    # field trains against zeros (see random_rays_from_reel's docstring)
    origins, dirs, gt_rgb, gt_mask, img_indices = random_rays_from_reel(
        reel, k_rays, cfg.nr_rays, apply_mask=cfg.with_mask
    )

    global_weight_curvature = map_range_val(
        iter_nr_anneal, cfg.iter_start_reduce_curv, cfg.iter_finish_reduce_curv,
        1.0, 0.0,
    )
    eik_w = jnp.where(
        iter_nr_anneal >= cfg.iter_start_reduce_curv,
        cfg.eikonal_weight_reduced, cfg.eikonal_weight,
    )

    def loss_fn(p):
        (pred_rgb, pred_normals, compact, weights_sum, samples,
         inv_s, does_intersect) = run_net(
            p, grid, k_render, origins, dirs, img_indices, iter_nr_anneal,
            cos_anneal_ratio, forced_variance, cfg, jitter=True,
        )

        loss_rgb = jnp.mean(jnp.abs(gt_rgb - pred_rgb) * does_intersect)
        loss = loss_rgb

        # eikonal over the fg samples — computed on the COMPACTED set
        # (identical math: sum over valid / nr valid)
        valid_c = compact["valid"]
        grads_c = compact["grads"]
        nvalid = jnp.maximum(jnp.sum(valid_c), 1.0)
        loss_eik = jnp.zeros(())
        if cfg.enable_eikonal:
            gnorm = jnp.linalg.norm(grads_c, axis=-1)
            loss_eik = jnp.sum(jnp.where(valid_c, (gnorm - 1.0) ** 2, 0.0)) / nvalid
            loss = loss + loss_eik * eik_w

        # curvature (annealed off after iter_start_reduce_curv; the host
        # flips enable_curvature off once the weight hits 0) — also on the
        # compacted set: the shifted-point SDF evaluation is the single
        # most expensive loss term
        loss_curv = jnp.zeros(())
        if cfg.enable_curvature:
            pos_cv, grads_cv, valid_cv = compact["pos"], grads_c, valid_c
            cb = cfg.curvature_sample_budget
            if cb is not None and cb < pos_cv.shape[0]:
                # prefix of the compacted batch = a random subset of rays
                # (see curvature_sample_budget docstring)
                pos_cv = pos_cv[:cb]
                grads_cv = grads_cv[:cb]
                valid_cv = valid_cv[:cb]
            _, curvature = sdf_curvature_from_gradient(
                p["sdf"], k_curv, pos_cv, grads_cv,
                iter_nr_anneal, cfg.sdf_model,
            )
            nvalid_cv = jnp.maximum(jnp.sum(valid_cv), 1.0)
            loss_curv = (
                jnp.sum(jnp.where(valid_cv[:, None], curvature, 0.0)) / nvalid_cv
            )
            loss = loss + loss_curv * cfg.curvature_weight * global_weight_curvature

        # offsurface high-sdf loss (only with occupancy grid)
        if cfg.use_occupancy_grid and cfg.enable_offsurface:
            off_pts = BOUND.rand_points_inside(k_off, 1024)
            sdf_rand, _ = sdf_apply(p["sdf"], off_pts, iter_nr_anneal, cfg.sdf_model)
            loss_off = jnp.mean(jnp.exp(-1e2 * jnp.abs(sdf_rand)))
            loss = loss + loss_off * cfg.offsurface_weight

        # lipshitz bound (after iter_start_reduce_curv)
        if cfg.enable_lipshitz:
            from permuto_sdf_tpu.models.mlp import lipshitz_bound_full

            loss_lip = lipshitz_bound_full(p["rgb"]["mlp"])
            loss = loss + jnp.where(
                iter_nr_anneal >= cfg.iter_start_reduce_curv,
                loss_lip * cfg.lipshitz_weight, 0.0,
            )

        # mask loss
        if cfg.with_mask:
            ws = jnp.clip(weights_sum, 1e-3, 1.0 - 1e-3)
            bce = -(gt_mask * jnp.log(ws) + (1 - gt_mask) * jnp.log(1 - ws))
            loss = loss + jnp.mean(bce) * cfg.mask_weight

        aux = {
            "loss_rgb": loss_rgb, "loss_eikonal": loss_eik,
            "loss_curvature": loss_curv, "inv_s": inv_s,
            # rebalancer signal: PRE-compaction valid count (a budget
            # overflow must shrink the ray bucket, not grow it)
            "nr_samples": compact["nr_samples_total"],
            "nr_samples_rendered": compact["nr_samples_rendered"],
            "nr_hit_rays": compact["nr_hit_rays"],
        }
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, aux, grads


def apply_updates(params, opt_state, grads, iter_nr, cfg: PermutoSDFTrainConfig,
                  optimizer):
    lr_now = lr_schedule(cfg, iter_nr)
    params, opt_state = optimizer.update(grads, opt_state, params,
                                         jnp.reshape(lr_now, (1,)))
    params = _apply_weight_decay(params, lr_now, iter_nr, cfg)
    return params, opt_state


@functools.partial(jax.jit, static_argnames=("cfg",))
def _grads_step(params, grid, reel: TensorReel, key, iter_nr,
                cfg: PermutoSDFTrainConfig):
    return compute_loss_and_grads(params, grid, reel, key, iter_nr, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "optimizer"))
def _update_step(params, opt_state, grads, iter_nr,
                 cfg: PermutoSDFTrainConfig, optimizer):
    return apply_updates(params, opt_state, grads, iter_nr, cfg, optimizer)


def train_step(params, opt_state, grid, reel: TensorReel, key, iter_nr,
               cfg: PermutoSDFTrainConfig, optimizer):
    """One training iteration, dispatched as TWO jit graphs (grads; update).

    Fusing the gradient graph with the optimizer update in one XLA program
    triggers a pathological fusion on this TPU toolchain (7-40 s/step vs
    ~0.7 s split — PERFORMANCE.md finding 5); two dispatches cost ~us."""
    loss, aux, grads = _grads_step(params, grid, reel, key, iter_nr, cfg)
    # canonicalized static key: bucket/parity/act/frac/enable mutations
    # re-jit only the gradient graph, never the (identical) update graph
    params, opt_state = _update_step(params, opt_state, grads, iter_nr,
                                     _canon_update_cfg(cfg), optimizer)
    return params, opt_state, loss, aux


# ---------------------------------------------------------------------------
# Eval rendering
# ---------------------------------------------------------------------------

def _eval_render_fn(params, grid, aux, origins, dirs, iter_nr_anneal,
                    cos_anneal_ratio, forced_variance, *,
                    cfg: PermutoSDFTrainConfig):
    """Pure per-device volumetric eval render — the unit that DP rendering
    shards over the mesh (parallel/render.py). ``aux`` unused.

    Always the EXACT render: train-time LOD is a training-batch contract
    (like the sample budget), so it is stripped here — the eval LOD path
    is the explicit ``lod=`` argument of :func:`render_image`."""
    if cfg.train_lod_top_k is not None:
        cfg = dataclasses.replace(cfg, train_lod_top_k=None)
    if cfg.hit_ray_frac is not None:
        # training-batch contract like the LOD/sample budgets: an eval
        # chunk may be object-dense, and dropped rays would be wrong pixels
        cfg = dataclasses.replace(cfg, hit_ray_frac=None)
    pred_rgb, pred_normals, _, weights_sum, _, _, _ = run_net(
        params, grid, jax.random.PRNGKey(0), origins, dirs, None,
        iter_nr_anneal, cos_anneal_ratio, forced_variance, cfg, jitter=False,
    )
    return pred_rgb, pred_normals, weights_sum


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_rays_eval(params, grid, origins, dirs, iter_nr_anneal,
                     cos_anneal_ratio, forced_variance, cfg: PermutoSDFTrainConfig):
    return _eval_render_fn(params, grid, None, origins, dirs, iter_nr_anneal,
                           cos_anneal_ratio, forced_variance, cfg=cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_rays_eval_batched(params, grid, origins_c, dirs_c, iter_nr_anneal,
                             cos_anneal_ratio, forced_variance,
                             cfg: PermutoSDFTrainConfig):
    """One-dispatch whole-view exact render: ``origins_c/dirs_c`` arrive
    pre-chunked ``[NC, chunk, 3]`` and a device-side ``lax.map`` loops over
    the chunks (live memory = one chunk's intermediates, same as the host
    loop). The host loop costs one transport round-trip PER CHUNK — the
    remote-tunnel dispatch latency is measured at up to ~350 ms/dispatch
    on congested sessions (finding 27), which dwarfed the actual render;
    a single dispatch makes eval latency-immune. The reference has no
    equivalent concern (local CUDA dispatch, run_net_in_chunks,
    train_permuto_sdf.py:172-209)."""

    def body(od):
        o, d = od
        return _eval_render_fn(params, grid, None, o, d, iter_nr_anneal,
                               cos_anneal_ratio, forced_variance, cfg=cfg)

    return jax.lax.map(body, (origins_c, dirs_c))


def _lod_coarse_select(params, grid, origins, dirs, iter_nr_anneal,
                       cos_anneal_ratio, forced_variance, *,
                       cfg: PermutoSDFTrainConfig, coarse_levels: int,
                       top_k: int):
    """Stage 1 of the LOD eval render: coarse-level SDF + NeuS weights for
    every sample, ``top_k`` selection per ray, and the gathers the fine
    stage consumes. Split out as its own jit program: the fused
    coarse+fine graph SIGILLs XLA:TPU's priority-fusion cost model on this
    toolchain (v5e, observed 2026-08-18 — PERFORMANCE.md finding 20), and
    two smaller programs also compile faster. The split is at a natural
    materialization point (the selected-sample arrays), so it costs one
    extra dispatch and no recompute.

    Returns a dict of RAY-LEADING arrays (every leaf has leading dim R) so
    the same two stages shard over the device mesh as two shard_map
    programs (the DP path must never compile the fused graph — a compiler
    SIGILL kills the process and cannot be caught)."""
    _, t_entry, _, t_exit, _ = BOUND.ray_intersection(origins, dirs)
    # eval contract: never drop rays (defensive strip — render_image
    # strips too, but this stage is also reachable directly)
    if cfg.hit_ray_frac is not None:
        cfg = dataclasses.replace(cfg, hit_ray_frac=None)
    samples, _, _, _ = _create_fg_samples(
        params, grid, jax.random.PRNGKey(0), origins, dirs, t_entry, t_exit,
        iter_nr_anneal, cfg, jitter=False)
    R, S = samples.mask.shape
    pos = samples.flat_positions()
    K = min(top_k, S)

    # sdf_c and grads_c from ONE vjp traversal (not a fwd pass + a second
    # jax.grad traversal): mathematically identical, compiles ~2x faster,
    # and — with the two-traversal form — XLA:TPU's priority-fusion pass
    # SIGILLs when the hash tables arrive as program PARAMETERS (the same
    # graph with tables constant-folded compiles fine; bisection in
    # eval_artifacts/xla_repros/lod_sigill_isolate{,2,3}.py).
    sdf_c_2d, vjp_fn = jax.vjp(
        lambda p: sdf_apply(params["sdf"], p, iter_nr_anneal, cfg.sdf_model,
                            max_levels=coarse_levels)[0], pos)
    (grads_c,) = vjp_fn(jnp.ones_like(sdf_c_2d))
    sdf_c = sdf_c_2d.reshape(-1)

    inv_s = vr.variance_inv_s(params["variance"], forced_variance)
    w_c, _, _ = vr.neus_compute_weights(samples, sdf_c, grads_c, inv_s,
                                        cos_anneal_ratio)

    _, ik = jax.lax.top_k(jnp.where(samples.mask, w_c, -1.0), K)  # [R, K]
    flat_ik = (jnp.arange(R)[:, None] * S + ik).reshape(-1)
    sel_mask = jnp.take(samples.mask.reshape(-1), flat_ik)
    return {
        "samples": samples,
        "sdf_c": sdf_c.reshape(R, S),
        "grads_c": grads_c.reshape(R, S, 3),
        "ik": ik,
        "sel_mask": sel_mask.reshape(R, K),
        "pos_k": pos[flat_ik].reshape(R, K, 3),
        "dirs_k": samples.flat_dirs()[flat_ik].reshape(R, K, 3),
        "t_exit": t_exit,
    }


def _lod_fine_render(params, mid, origins, dirs, iter_nr_anneal,
                     cos_anneal_ratio, forced_variance, *,
                     cfg: PermutoSDFTrainConfig):
    """Stage 2 of the LOD eval render: full-resolution SDF gradient + RGB
    on the selected samples only, weights recomputed from the mixed dense
    arrays, background composite. See :func:`_lod_coarse_select`."""
    samples = mid["samples"]
    R, S = samples.mask.shape
    K = mid["ik"].shape[1]
    flat_ik = (jnp.arange(R)[:, None] * S + mid["ik"]).reshape(-1)
    sdf_c = mid["sdf_c"].reshape(-1)
    grads_c = mid["grads_c"].reshape(-1, 3)
    sel_mask = mid["sel_mask"].reshape(-1)
    pos_k = mid["pos_k"].reshape(-1, 3)
    dirs_k = mid["dirs_k"].reshape(-1, 3)
    t_exit = mid["t_exit"]
    inv_s = vr.variance_inv_s(params["variance"], forced_variance)

    sdf_k, grads_k, geom_k = sdf_with_gradient(
        params["sdf"], pos_k, iter_nr_anneal, cfg.sdf_model)
    rgb_k = rgb_apply(params["rgb"], pos_k, dirs_k, grads_k, geom_k,
                      iter_nr_anneal, cfg.rgb_model)

    # mixed dense arrays: full-resolution values at the selected slots
    sdf_m = sdf_c.at[flat_ik].set(
        jnp.where(sel_mask, sdf_k.reshape(-1), sdf_c[flat_ik]))
    grads_m = grads_c.at[flat_ik].set(
        jnp.where(sel_mask[:, None], grads_k, grads_c[flat_ik]))
    w_m, weights_sum, bg_tr = vr.neus_compute_weights(
        samples, sdf_m, grads_m, inv_s, cos_anneal_ratio)

    wk = jnp.take(w_m.reshape(-1), flat_ik).reshape(R, K)
    wk = jnp.where(sel_mask.reshape(R, K), wk, 0.0)
    pred_rgb = jnp.sum(wk[..., None] * rgb_k.reshape(R, K, 3), axis=1)
    grad_int = jnp.sum(wk[..., None] * grads_k.reshape(R, K, 3), axis=1)
    pred_normals = grad_int / (
        jnp.linalg.norm(grad_int, axis=-1, keepdims=True) + 1e-12)

    if not cfg.with_mask:
        bg_samples = compute_samples_bg(
            origins, dirs, t_exit, cfg.nr_samples_bg, BOUND.radius,
            BOUND.center, key=jax.random.PRNGKey(1), jitter=False,
        )
        Rb, Sb = bg_samples.mask.shape
        rgb_bg, dens_bg = nerf_hash_apply(
            params["bg"], bg_samples.pos_4d.reshape(-1, 4),
            bg_samples.flat_dirs(), iter_nr_anneal, cfg.bg_model,
        )
        w_bg, _, _ = vr.nerf_compute_weights(bg_samples, dens_bg)
        pred_rgb_bg = vr.integrate_with_weights(
            rgb_bg.reshape(Rb, Sb, 3), w_bg, bg_samples.mask)
        pred_rgb = pred_rgb + bg_tr[:, None] * pred_rgb_bg

    return pred_rgb, pred_normals, weights_sum


_lod_coarse_jit = functools.partial(
    jax.jit, static_argnames=("cfg", "coarse_levels", "top_k"))(
    lambda params, grid, origins, dirs, it, cos, fv, cfg, coarse_levels,
    top_k: _lod_coarse_select(params, grid, origins, dirs, it, cos, fv,
                              cfg=cfg, coarse_levels=coarse_levels,
                              top_k=top_k))

# Stage-1 dispatch with the SDF MLP weights closed over as COMPILE-TIME
# CONSTANTS. Bisection result (eval_artifacts/xla_repros/
# lod_sigill_isolate{3,5,6}.json): the stage-1 graph SIGILLs XLA:TPU's
# priority-fusion pass whenever the small SDF MLP arrives as a program
# parameter — the identical graph with the MLP constant-folded (tables
# and everything else still arguments) compiles in ~50 s. The MLP is a
# few KB, so constant capture costs nothing; the cache below retraces
# only when the MLP arrays themselves are replaced (a checkpoint load),
# which is exactly the eval/viewer cadence. Retirement condition:
# tests/test_xla_canaries.py::test_lod_stage1_params_as_args_compiles.
_LOD_MLPCONST_CACHE: dict = {}


def _strip_sdf_mlp(params):
    return {**params,
            "sdf": {k: v for k, v in params["sdf"].items()
                    if k != "mlp_sdf"}}


def _lod_coarse_mlpconst_jit(params, grid, origins, dirs, it, cos, fv,
                             cfg, coarse_levels, top_k, batched=False):
    """``batched=True``: origins/dirs arrive ``[NC, chunk, 3]`` and a
    device-side ``lax.map`` loops over the chunks — one dispatch for the
    whole view (finding 27), mid-tree leaves gain the NC leading dim."""
    mlp = params["sdf"]["mlp_sdf"]
    leaves = tuple(jax.tree_util.tree_leaves(mlp))
    key = ("1dev", batched, cfg, coarse_levels, top_k)
    hit = _LOD_MLPCONST_CACHE.get(key)
    if (hit is None or len(hit[0]) != len(leaves)
            or any(a is not b for a, b in zip(hit[0], leaves))):

        @jax.jit
        def f(rest, grid, origins, dirs, it, cos, fv):
            p = {**rest, "sdf": {**rest["sdf"], "mlp_sdf": mlp}}

            def one(od):
                return _lod_coarse_select(p, grid, od[0], od[1], it, cos,
                                          fv, cfg=cfg,
                                          coarse_levels=coarse_levels,
                                          top_k=top_k)

            if batched:
                return jax.lax.map(one, (origins, dirs))
            return one((origins, dirs))

        hit = (leaves, f)
        _LOD_MLPCONST_CACHE[key] = hit
    return hit[1](_strip_sdf_mlp(params), grid, origins, dirs, it, cos, fv)

_lod_fine_jit = functools.partial(jax.jit, static_argnames=("cfg",))(
    lambda params, mid, origins, dirs, it, cos, fv, cfg:
    _lod_fine_render(params, mid, origins, dirs, it, cos, fv, cfg=cfg))

_lod_fine_jit_batched = functools.partial(jax.jit, static_argnames=("cfg",))(
    lambda params, mid, origins, dirs, it, cos, fv, cfg:
    jax.lax.map(lambda a: _lod_fine_render(params, a[0], a[1], a[2], it,
                                           cos, fv, cfg=cfg),
                (mid, origins, dirs)))


def _eval_render_fn_lod(params, grid, aux, origins, dirs, iter_nr_anneal,
                        cos_anneal_ratio, forced_variance, *,
                        cfg: PermutoSDFTrainConfig, coarse_levels: int = 12,
                        top_k: int = 32):
    """Volumetric eval render with per-sample level-LOD (PERFORMANCE.md
    finding 20; the render-time half of SURVEY §7 hard-part 1's LOD idea).

    NeuS weights concentrate at the surface crossing — most samples along
    a ray carry ~zero weight yet the exact path pays full-resolution
    encode + gradient + RGB for every one. Here:

    1. coarse pass: SDF + gradient at the ``coarse_levels`` coarsest
       encoding levels for ALL samples (the c2f-trained coarse levels
       carry the geometry; fine levels add surface detail);
    2. ``lax.top_k`` weights per ray select the samples that matter;
    3. fine pass: full-resolution SDF gradient + RGB on the R*top_k
       selected samples only;
    4. weights are recomputed from MIXED dense arrays (fine sdf/grads
       scattered over the coarse ones at the selected slots), so the
       surface crossing uses full-resolution values; the dropped rgb mass
       is the non-selected samples' (tiny) weight sum.

    Exact only in the limit; the A/B on the trained flagship measures the
    residual (eval_artifacts/perf_lod_eval.py). Tuned on the trained
    flagship (CPU, 100^2): the binding knob is ``top_k`` — coarse weights
    MISRANK near-crossing samples, so K must exceed the crossing's
    coarse-weight spread (K=16 loses ~9 dB fg; K=32 of ~96 samples is
    48 dB vs the exact render, i.e. visually identical, with
    coarse_levels anywhere in 12-16). ``aux`` unused.

    This fused single-graph form is NOT dispatched by any production path
    (it is the graph shape that crashes the compiler); it exists for the
    skipped-by-default toolchain canary test
    (tests/test_xla_canaries.py) so the two-program split can be retired
    the day the compiler stops crashing on it. Both the single-device
    entry :func:`render_rays_eval_lod` and the DP path dispatch the two
    stages as separate programs (see :func:`_lod_coarse_select`)."""
    mid = _lod_coarse_select(params, grid, origins, dirs, iter_nr_anneal,
                             cos_anneal_ratio, forced_variance, cfg=cfg,
                             coarse_levels=coarse_levels, top_k=top_k)
    return _lod_fine_render(params, mid, origins, dirs, iter_nr_anneal,
                            cos_anneal_ratio, forced_variance, cfg=cfg)


def _lod_fine_body(params, grid, mid, origins, dirs, iter_nr_anneal,
                   cos_anneal_ratio, forced_variance, *, cfg):
    """DP body adapter for stage 2; ``mid`` arrives ray-sharded."""
    return _lod_fine_render(params, mid, origins, dirs, iter_nr_anneal,
                            cos_anneal_ratio, forced_variance, cfg=cfg)


def _make_dp_lod_stage1(mesh, params, cfg, coarse_levels, top_k):
    """DP stage-1 renderer with the SDF MLP constant-folded — the same
    SIGILL dodge as :func:`_lod_coarse_mlpconst_jit`, applied to the
    shard_map program (the DP path must never compile the crashing shape:
    on a standard TPU host the compiler SIGILL kills the process). Returns
    a callable with the ``make_dp_ray_renderer`` signature. Cached on the
    MLP leaf identities; retraces only on checkpoint replacement."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from permuto_sdf_tpu.parallel.mesh import RAY_AXIS

    mlp = params["sdf"]["mlp_sdf"]
    leaves = tuple(jax.tree_util.tree_leaves(mlp))
    key = ("dp", mesh, cfg, coarse_levels, top_k)
    hit = _LOD_MLPCONST_CACHE.get(key)
    if (hit is None or len(hit[0]) != len(leaves)
            or any(a is not b for a, b in zip(hit[0], leaves))):

        def body(rest, grid, aux_tree, origins, dirs, scalars):
            p = {**rest, "sdf": {**rest["sdf"], "mlp_sdf": mlp}}
            outs = _lod_coarse_select(p, grid, origins[0], dirs[0], *scalars,
                                      cfg=cfg, coarse_levels=coarse_levels,
                                      top_k=top_k)
            return jax.tree_util.tree_map(lambda x: x[None], outs)

        sharded = shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P(), P(RAY_AXIS), P(RAY_AXIS), P()),
            out_specs=P(RAY_AXIS), check_vma=False)
        hit = (leaves, jax.jit(sharded))
        _LOD_MLPCONST_CACHE[key] = hit
    f = hit[1]
    return lambda p, g, aux, o, v, s: f(_strip_sdf_mlp(p), g, aux, o, v, s)


def render_rays_eval_lod(params, grid, origins, dirs, iter_nr_anneal,
                         cos_anneal_ratio, forced_variance, cfg,
                         coarse_levels=12, top_k=32):
    """Two-dispatch LOD eval render (coarse-select program, fine program).

    Same math as :func:`_eval_render_fn_lod`; split so the XLA:TPU
    priority-fusion crash on the fused graph cannot take down the viewer
    (and the two halves compile faster). Stage 1 additionally closes over
    the SDF MLP weights as constants — the bisected SIGILL trigger is that
    MLP arriving as a program parameter (see ``_lod_coarse_mlpconst_jit``)."""
    mid = _lod_coarse_mlpconst_jit(params, grid, origins, dirs,
                                   iter_nr_anneal, cos_anneal_ratio,
                                   forced_variance, cfg, coarse_levels,
                                   top_k)
    return _lod_fine_jit(params, mid, origins, dirs, iter_nr_anneal,
                         cos_anneal_ratio, forced_variance, cfg)


# incremented whenever a requested LOD render fell back to the exact path
# (XLA:TPU compile crash) — lets callers/benchmarks detect the substitution
LOD_FALLBACK_COUNT = 0

# memoized failures: failed compiles are not cached by JAX, so without this
# an interactive viewer would re-pay the full failing-compile cost on every
# frame before falling back again. Keyed on everything that changes the
# compiled graph shape.
_LOD_FAILED_KEYS: set = set()


def render_image(params, grid, K, tf_world_cam, width, height, iter_nr_anneal,
                 cfg: PermutoSDFTrainConfig, forced_variance=0.8, chunk: int = 2048,
                 mesh=None, lod: bool | tuple = False):
    """run_net_in_chunks equivalent (train_permuto_sdf.py:172-209).

    The render sample budget is DISABLED here: the budget is the training
    batch contract (the dynamic ray rebalancer keeps the valid count under
    it); an eval chunk of object-dense rays can exceed it, and compaction
    would silently drop the samples of the chunk's trailing rays (black
    stripes at the chunk pitch). Chunking already bounds eval memory the
    way run_net_in_chunks does, so the budget adds nothing at eval.

    Multi-chip: when more than one device is visible (or ``mesh`` is
    passed), rays are sharded over the device mesh with params/grid
    replicated — pixel-identical to the single-device path, ~device_count x
    faster (rays are embarrassingly parallel; the reference is strictly
    single-GPU, src/PermutoSDF.cu:75-78). ``chunk`` stays the PER-DEVICE
    chunk size.
    """
    global LOD_FALLBACK_COUNT
    from permuto_sdf_tpu.datasets.tensor_reel import rays_from_frame

    if cfg.render_sample_budget is not None:
        cfg = dataclasses.replace(cfg, render_sample_budget=None)
    if cfg.train_lod_top_k is not None:
        # training-batch contract, not an eval approximation (use lod= for that)
        cfg = dataclasses.replace(cfg, train_lod_top_k=None)
    if cfg.hit_ray_frac is not None:
        cfg = dataclasses.replace(cfg, hit_ray_frac=None)  # same contract

    origins, dirs = rays_from_frame(K, tf_world_cam, width, height)
    n = origins.shape[0]

    if mesh is None and jax.device_count() > 1:
        from permuto_sdf_tpu.parallel import make_ray_mesh

        mesh = make_ray_mesh()
    if mesh is not None and mesh.devices.size > 1:
        from permuto_sdf_tpu.parallel.render import (
            make_dp_ray_renderer, dp_render_chunked,
        )

        scalars = (jnp.asarray(iter_nr_anneal), jnp.asarray(1.0),
                   jnp.asarray(forced_variance))
        # small frames: don't pad to the full per-device chunk pitch
        chunk_local = min(chunk, -(-n // mesh.devices.size))
        fail_key = ("dp", cfg, lod if not isinstance(lod, list) else tuple(lod),
                    chunk_local, mesh.devices.size)
        if lod and fail_key in _LOD_FAILED_KEYS:
            lod = False  # known-failing shape: go straight to exact
        if lod:
            # two shard_map programs (never the fused graph — a compiler
            # SIGILL kills the whole process, so the DP path must not even
            # attempt the graph shape documented to crash priority fusion);
            # stage 1 constant-folds the SDF MLP (the bisected trigger)
            cl, tk = lod if isinstance(lod, tuple) else (12, 32)
            stage_a = _make_dp_lod_stage1(mesh, params, cfg, cl, tk)
            stage_b = make_dp_ray_renderer(
                _lod_fine_body, mesh, 3, aux_sharded=True, cfg=cfg)

            def renderer(p, g, _aux, o, v, s):
                mid = stage_a(p, g, None, o, v, s)
                return stage_b(p, g, mid, o, v, s)
        else:
            # exact DP path: ONE dispatch for the whole view (device-side
            # lax.map over each device's chunk slices — finding 27)
            from permuto_sdf_tpu.parallel.render import dp_render_batched

            rgb, nrm, alpha = dp_render_batched(
                _eval_render_fn, mesh, params, grid, origins, dirs, scalars,
                chunk_local, cfg=cfg)
            return (rgb.reshape(height, width, 3),
                    nrm.reshape(height, width, 3),
                    alpha.reshape(height, width, 1))
        # pad rays start outside the bound pointing away -> no work
        try:
            rgb, nrm, alpha = dp_render_chunked(
                renderer, mesh, params, grid, None, origins, dirs, scalars,
                chunk_local)
        except jax.errors.JaxRuntimeError as e:
            if not lod:
                raise
            # even split into two programs, an LOD stage can fail at
            # compile or execution time; the viewer must not die with it —
            # render exact instead and remember the failing shape
            LOD_FALLBACK_COUNT += 1
            _LOD_FAILED_KEYS.add(fail_key)
            print(f"[render_image] LOD DP render failed ({e!r:.200}); "
                  "falling back to exact render", flush=True)
            renderer = make_dp_ray_renderer(_eval_render_fn, mesh, 3, cfg=cfg)
            rgb, nrm, alpha = dp_render_chunked(
                renderer, mesh, params, grid, None, origins, dirs, scalars,
                chunk_local)
        return (rgb.reshape(height, width, 3), nrm.reshape(height, width, 3),
                alpha.reshape(height, width, 1))

    pad = (-n) % chunk
    origins = jnp.concatenate([origins, jnp.zeros((pad, 3))], 0)
    dirs = jnp.concatenate([dirs, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))], 0)
    fail_key = ("1dev", cfg, lod if not isinstance(lod, list) else tuple(lod),
                chunk)
    if lod and fail_key in _LOD_FAILED_KEYS:
        lod = False  # known-failing shape: go straight to exact

    # ONE dispatch for the whole view (device-side lax.map over chunks;
    # two dispatches for the two-stage LOD path) — the host chunk loop
    # costs one transport round-trip PER CHUNK, which on the remote
    # tunnel dwarfs the render itself (finding 27)
    o_c = origins.reshape(-1, chunk, 3)
    d_c = dirs.reshape(-1, chunk, 3)

    def _exact():
        return render_rays_eval_batched(params, grid, o_c, d_c,
                                        iter_nr_anneal, 1.0,
                                        forced_variance, cfg)

    try:
        if lod:
            cl, tk = lod if isinstance(lod, tuple) else (12, 32)
            mid = _lod_coarse_mlpconst_jit(
                params, grid, o_c, d_c, iter_nr_anneal, 1.0,
                forced_variance, cfg, cl, tk, batched=True)
            outs = _lod_fine_jit_batched(params, mid, o_c, d_c,
                                         iter_nr_anneal, 1.0,
                                         forced_variance, cfg)
        else:
            outs = _exact()
        # fetch inside the try: dispatch is async, so execution-time
        # failures surface here and still hit the fallback
        rgb, nrm, alpha = (np.asarray(o) for o in outs)
    except jax.errors.JaxRuntimeError as e:
        if not lod:
            raise
        LOD_FALLBACK_COUNT += 1
        _LOD_FAILED_KEYS.add(fail_key)
        print(f"[render_image] LOD render failed ({e!r:.200}); "
              "falling back to exact render", flush=True)
        rgb, nrm, alpha = (np.asarray(o) for o in _exact())
    return (rgb.reshape(-1, 3)[:n].reshape(height, width, 3),
            nrm.reshape(-1, 3)[:n].reshape(height, width, 3),
            alpha.reshape(-1)[:n].reshape(height, width, 1))


@functools.partial(jax.jit, static_argnames=("cfg", "nr_sphere_traces",
                                             "sdf_multiplier", "sdf_converged_tresh"))
def render_rays_sphere_traced(params, grid, origins, dirs, iter_nr_anneal,
                              cfg: PermutoSDFTrainConfig,
                              nr_sphere_traces: int = 15,
                              sdf_multiplier: float = 0.9,
                              sdf_converged_tresh: float = 2e-4,
                              dist_field=None):
    """run_net_sphere_traced equivalent (train_permuto_sdf.py:211-242):
    sphere trace to the surface, then shade ONE sample per ray with the RGB
    model; weights 1 inside occupied+bounded space else 0."""
    from permuto_sdf_tpu.ops.sphere_trace import sphere_trace

    def sdf_fn(p):
        return sdf_apply(params["sdf"], p, iter_nr_anneal, cfg.sdf_model)[0]

    grid_cfg = cfg.grid if (cfg.use_occupancy_grid and grid is not None) else None
    pos, sdf, converged, alive = sphere_trace(
        sdf_fn, origins, dirs, BOUND, nr_sphere_traces, sdf_multiplier,
        sdf_converged_tresh, grid_cfg=grid_cfg, grid=grid,
        dist_field=dist_field,
    )

    sdf_end, grads_end, geom_end = sdf_with_gradient(
        params["sdf"], pos, iter_nr_anneal, cfg.sdf_model
    )
    in_bounds = BOUND.check_point_inside_primitive(pos)[:, 0]
    if grid_cfg is not None:
        in_bounds = in_bounds & og.check_occupancy(grid_cfg, grid, pos)
    weights = (in_bounds & alive).astype(jnp.float32)[:, None]

    rgb = rgb_apply(
        params["rgb"], pos, dirs, grads_end, geom_end, iter_nr_anneal,
        cfg.rgb_model,
    )
    pred_rgb = rgb * weights
    normals = grads_end / (jnp.linalg.norm(grads_end, axis=-1, keepdims=True) + 1e-12)
    pred_normals = normals * weights
    return pred_rgb, pred_normals, weights


@functools.partial(jax.jit, static_argnames=("cfg", "nr_rounds",
                                              "iters_per_round",
                                              "sdf_multiplier",
                                              "sdf_converged_tresh",
                                              "first_bucket_fraction"))
def render_rays_sphere_traced_compacted(
        params, grid, origins, dirs, iter_nr_anneal,
        cfg: PermutoSDFTrainConfig, nr_rounds: int = 5,
        iters_per_round: int = 3, sdf_multiplier: float = 0.9,
        sdf_converged_tresh: float = 2e-4,
        first_bucket_fraction: float = 0.25,
        dist_field=None):
    """Interactive-path renderer: static-shape ray compaction for BOTH the
    trace (ops/sphere_trace.py::sphere_trace_compacted) and the final
    shading pass — only converged surface hits pay the full-resolution
    SDF-gradient + RGB evaluation; background rays cost one grid traversal.
    Handles full frames in one call (no chunking needed)."""
    from permuto_sdf_tpu.ops.sphere_trace import sphere_trace_compacted

    def sdf_fn(p):
        return sdf_apply(params["sdf"], p, iter_nr_anneal, cfg.sdf_model)[0]

    grid_cfg = cfg.grid if (cfg.use_occupancy_grid and grid is not None) else None
    pos, sdf, converged, alive = sphere_trace_compacted(
        sdf_fn, origins, dirs, BOUND, nr_rounds, iters_per_round,
        sdf_multiplier, sdf_converged_tresh, grid_cfg=grid_cfg, grid=grid,
        first_bucket_fraction=first_bucket_fraction, dist_field=dist_field,
    )

    in_bounds = BOUND.check_point_inside_primitive(pos)[:, 0]
    if grid_cfg is not None:
        in_bounds = in_bounds & og.check_occupancy(grid_cfg, grid, pos)
    # reference gate: alive + in-bounds/occupied, convergence NOT required
    # (train_permuto_sdf.py:215-222; see _lit_and_state)
    lit = alive & in_bounds

    # compacted shading: gather the hits, shade, scatter back
    R = origins.shape[0]
    bucket = min(R, max(256, int(R * first_bucket_fraction)))
    (idx,) = jnp.nonzero(lit, size=bucket, fill_value=R)
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), pos.dtype)], 0)
    dirs_p = jnp.concatenate([dirs, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]],
                                                         dirs.dtype), (1, 1))], 0)
    sub_pos = pos_p[idx]
    sub_dirs = dirs_p[idx]
    sdf_end, grads_end, geom_end = sdf_with_gradient(
        params["sdf"], sub_pos, iter_nr_anneal, cfg.sdf_model
    )
    sub_rgb = rgb_apply(params["rgb"], sub_pos, sub_dirs, grads_end, geom_end,
                        iter_nr_anneal, cfg.rgb_model)
    sub_normals = grads_end / (
        jnp.linalg.norm(grads_end, axis=-1, keepdims=True) + 1e-12
    )
    valid = (idx < R)[:, None].astype(sub_rgb.dtype)
    pred_rgb = jnp.zeros((R + 1, 3), sub_rgb.dtype).at[idx].set(sub_rgb * valid)[:R]
    pred_normals = jnp.zeros((R + 1, 3), sub_rgb.dtype).at[idx].set(
        sub_normals * valid)[:R]
    # weights clamp to the rays ACTUALLY shaded: if the static bucket was
    # smaller than the lit count, overflow rays fall back to background
    # instead of rendering as weight-1 black holes. (The adaptive path —
    # render_image_sphere_traced_fast — sizes the bucket from the true lit
    # count and never overflows; this fixed-budget variant exists for
    # fully-jitted single-graph use.)
    shaded = jnp.zeros((R + 1,), bool).at[idx].set(idx < R)[:R]
    weights = (lit & shaded).astype(jnp.float32)[:, None]
    return pred_rgb * weights, pred_normals * weights, weights


@functools.lru_cache(maxsize=None)
def _make_sdf_eval(sdf_cfg: SDFConfig, max_levels):
    """Stable (lru-cached) sdf-eval closures for the adaptive tracer — jit
    static args must keep their identity across calls."""

    def eval_fn(ctx, pts):
        params_sdf, it = ctx
        return sdf_apply(params_sdf, pts, it, sdf_cfg,
                         max_levels=max_levels)[0].reshape(-1)

    return eval_fn


@functools.partial(jax.jit, static_argnames=("cfg", "bucket", "grid_cfg"))
def _lit_and_state(pos, converged, alive, grid, grid_cfg, cfg, bucket=None):
    """Reference shading gate (train_permuto_sdf.py:215-222): weight 1 for
    every ALIVE ray whose final position is in bounds and in occupied
    space — convergence is NOT required. Gating on ``converged`` turned
    grazing/silhouette rays that ran out of trace steps into black holes
    inside the GT mask (the r2 5.8 dB sphere-traced PSNR deficit)."""
    in_bounds = BOUND.check_point_inside_primitive(pos)[:, 0]
    if grid_cfg is not None:
        in_bounds = in_bounds & og.check_occupancy(grid_cfg, grid, pos)
    return alive & in_bounds


@functools.partial(jax.jit, static_argnames=("cfg", "bucket"))
def _shade_hits(params, pos, dirs, lit, iter_nr_anneal, cfg: PermutoSDFTrainConfig,
                bucket: int):
    """Shade exactly the lit rays (host-sized power-of-two bucket): full-res
    SDF gradient for normals + RGB model, scattered back to the frame."""
    R = pos.shape[0]
    (idx,) = jnp.nonzero(lit, size=bucket, fill_value=R)
    sub_pos = _pad_one(pos)[idx]
    sub_dirs = _pad_one(dirs)[idx]
    _, grads_end, geom_end = sdf_with_gradient(
        params["sdf"], sub_pos, iter_nr_anneal, cfg.sdf_model
    )
    sub_rgb = rgb_apply(params["rgb"], sub_pos, sub_dirs, grads_end, geom_end,
                        iter_nr_anneal, cfg.rgb_model)
    sub_normals = grads_end / (
        jnp.linalg.norm(grads_end, axis=-1, keepdims=True) + 1e-12
    )
    valid = (idx < R)[:, None].astype(sub_rgb.dtype)
    rgb = jnp.zeros((R + 1, 3), sub_rgb.dtype).at[idx].set(sub_rgb * valid)[:R]
    normals = jnp.zeros((R + 1, 3), sub_rgb.dtype).at[idx].set(
        sub_normals * valid)[:R]
    weights = lit.astype(jnp.float32)[:, None]
    return rgb * weights, normals * weights, weights


_DIST_FIELD_CACHE: dict = {}


def _cached_dist_field(grid_cfg, grid):
    """One Chebyshev distance field per grid STATE, so repeated frames of
    the same checkpoint (orbits, interactive viewing) skip the 63 min-pool
    sweeps. The cache HOLDS the occupancy buffer it was built from and
    compares by identity-of-that-held-object: a bare ``id()`` key could be
    recycled by the allocator after the old buffer is garbage-collected and
    silently serve a stale field to a new grid."""
    from permuto_sdf_tpu.ops.sphere_trace import _grid_distance_field

    if (_DIST_FIELD_CACHE.get("occ") is not grid.occupancy
            or _DIST_FIELD_CACHE.get("cfg") != grid_cfg):
        _DIST_FIELD_CACHE["occ"] = grid.occupancy
        _DIST_FIELD_CACHE["cfg"] = grid_cfg
        _DIST_FIELD_CACHE["field"] = _grid_distance_field(grid_cfg, grid)
    return _DIST_FIELD_CACHE["field"]


@jax.jit
def _quantize_frame(rgb, normals, weights):
    """Device-side uint8 packing of a frame before the device->host copy.

    Through this environment's remote-TPU transport, float32 transfers run
    at ~2 MB/s while uint8 runs at ~53 MB/s (measured) — a full-HD float
    frame costs 12 s JUST to fetch. Quantizing rgb/normals/alpha to uint8
    on device makes the copy ~25x cheaper at invisible precision cost
    (displays and PNGs are uint8 anyway)."""
    q = lambda x: jnp.clip(x * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    return q(rgb), q(normals * 0.5 + 0.5), q(weights)


def _dequantize_frame(rgb_q, normals_q, weights_q):
    rgb = np.asarray(rgb_q, np.float32) / 255.0
    normals = np.asarray(normals_q, np.float32) / 255.0 * 2.0 - 1.0
    weights = np.asarray(weights_q, np.float32) / 255.0
    return rgb, normals, weights


@functools.partial(
    jax.jit, static_argnames=("cfg", "bucket", "shade_sdf_levels"))
def _shade_hits_compact(params, pos, dirs, lit, iter_nr_anneal,
                        cfg: PermutoSDFTrainConfig, bucket: int,
                        shade_sdf_levels: int | None = None):
    """Like :func:`_shade_hits` but returns the COMPACTED uint8 results +
    hit indices instead of scattered full-frame float buffers: through the
    remote-TPU transport, fetching ~n_hit*10 bytes beats fetching the full
    float frame by >10x (see _quantize_frame's note).

    ``shade_sdf_levels`` evaluates the shading SDF gradient (normals +
    geom_feat) on the coarsest K levels only — a candidate ST speed lever
    (the gradient vjp is the instance-heaviest shading stage); quality
    must be A/B'd since a trained model's fine features are not zero."""
    R = pos.shape[0]
    (idx,) = jnp.nonzero(lit, size=bucket, fill_value=R)
    sub_pos = _pad_one(pos)[idx]
    sub_dirs = _pad_one(dirs)[idx]
    sdf_cfg = cfg.sdf_model
    if shade_sdf_levels is not None:
        sdf_cfg = dataclasses.replace(sdf_cfg, active_levels=shade_sdf_levels)
    _, grads_end, geom_end = sdf_with_gradient(
        params["sdf"], sub_pos, iter_nr_anneal, sdf_cfg
    )
    sub_rgb = rgb_apply(params["rgb"], sub_pos, sub_dirs, grads_end, geom_end,
                        iter_nr_anneal, cfg.rgb_model)
    sub_normals = grads_end / (
        jnp.linalg.norm(grads_end, axis=-1, keepdims=True) + 1e-12
    )
    q = lambda x: jnp.clip(x * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    return idx.astype(jnp.int32), q(sub_rgb), q(sub_normals * 0.5 + 0.5), lit


@functools.lru_cache(maxsize=None)
def _make_dp_shade(mesh, cfg: PermutoSDFTrainConfig, bucket: int, grid_cfg):
    """Mesh-sharded hit shading: each device computes its slice's lit mask,
    gathers its hits into the shared ``bucket``, shades (full-res SDF
    gradient + RGB model) and returns compacted uint8 results — the same
    transport-frugal contract as :func:`_shade_hits_compact`, x D."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from permuto_sdf_tpu.parallel.mesh import RAY_AXIS

    def body(params, grid, origins_sh, dirs_sh, t_sh, conv_sh, alive_sh, it):
        o, d_, t = origins_sh[0], dirs_sh[0], t_sh[0]
        conv, alive = conv_sh[0], alive_sh[0]
        pos = o + t[:, None] * d_
        in_bounds = BOUND.check_point_inside_primitive(pos)[:, 0]
        if grid_cfg is not None:
            in_bounds = in_bounds & og.check_occupancy(grid_cfg, grid, pos)
        # reference gate: alive + in-bounds/occupied, NOT convergence
        # (see _lit_and_state)
        lit = alive & in_bounds
        R = pos.shape[0]
        (idx,) = jnp.nonzero(lit, size=bucket, fill_value=R)
        sub_pos = _pad_one(pos)[idx]
        sub_dirs = _pad_one(d_)[idx]
        _, grads_end, geom_end = sdf_with_gradient(
            params["sdf"], sub_pos, it, cfg.sdf_model
        )
        sub_rgb = rgb_apply(params["rgb"], sub_pos, sub_dirs, grads_end,
                            geom_end, it, cfg.rgb_model)
        sub_normals = grads_end / (
            jnp.linalg.norm(grads_end, axis=-1, keepdims=True) + 1e-12
        )
        q = lambda x: jnp.clip(x * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
        return (idx[None].astype(jnp.int32), q(sub_rgb)[None],
                q(sub_normals * 0.5 + 0.5)[None], lit[None])

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS),
                  P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=(P(RAY_AXIS),) * 4,
        check_vma=False,
    )
    return jax.jit(sharded)


def _make_trace_lod_evals(cfg, ctx, lod_levels, lod_schedule):
    """Shared construction of the sphere-trace march/refine/round SDF
    evaluators for a LOD setting (single-device and DP paths)."""
    full_eval = _make_sdf_eval(cfg.sdf_model, None)
    round_evals = ()
    if lod_schedule is not None:
        # explicit per-round LOD ramp (last entry repeats); full-res refine
        march_eval = _make_sdf_eval(cfg.sdf_model, lod_schedule[-1])
        refine_eval, refine_ctx = full_eval, ctx
        round_evals = tuple(_make_sdf_eval(cfg.sdf_model, l)
                            for l in lod_schedule)
    elif lod_levels is not None and lod_levels < cfg.nr_levels:
        march_eval = _make_sdf_eval(cfg.sdf_model, lod_levels)
        refine_eval, refine_ctx = full_eval, ctx
        # round 0 runs at an even coarser LOD: it is the only round that
        # processes EVERY bound-hitting ray (misses die in it via the
        # distance-field jumps), so its per-point cost matters most
        round_evals = (_make_sdf_eval(cfg.sdf_model, max(4, lod_levels // 2)),)
    else:
        march_eval, refine_eval, refine_ctx = full_eval, None, None
    return march_eval, refine_eval, refine_ctx, round_evals


def _render_sphere_traced_dp(
        params, grid, origins, dirs, n, iter_nr_anneal, cfg, mesh, chunk,
        lod_levels, nr_rounds, iters_per_round, nr_refine_iters,
        sdf_multiplier, sdf_converged_tresh, dist_field,
        jump_substeps: int = 4, prepass_jumps: int = 16,
        lod_schedule: tuple | None = None,
        jump_gate_voxels: float = 1.0):
    """DP drive of the adaptive sphere tracer: rays interleave-sharded over
    the mesh, trace + shade fully device-side, one compacted uint8 fetch
    per device slice. Returns flat (rgb, nrm, w) host arrays of length n."""
    from permuto_sdf_tpu.ops.sphere_trace import (
        sphere_trace_adaptive_dp, pow2_bucket,
    )
    from permuto_sdf_tpu.parallel.render import interleave_shard

    D = mesh.devices.size
    it = jnp.asarray(iter_nr_anneal)
    ctx = (params["sdf"], it)
    march_eval, refine_eval, refine_ctx, round_evals = _make_trace_lod_evals(
        cfg, ctx, lod_levels, lod_schedule)

    grid_cfg = cfg.grid if (cfg.use_occupancy_grid and grid is not None) else None
    if grid_cfg is not None and dist_field is None:
        dist_field = _cached_dist_field(grid_cfg, grid)

    chunk_local = min(chunk, -(-n // D))
    sc = chunk_local * D
    pad = (-n) % sc
    origins = jnp.concatenate(
        [origins, jnp.tile(jnp.asarray([[10.0, 0.0, 0.0]]), (pad, 1))], 0)
    dirs = jnp.concatenate(
        [dirs, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (pad, 1))], 0)

    rgb = np.zeros((n + pad, 3), np.float32)
    nrm = np.zeros((n + pad, 3), np.float32)
    w = np.zeros((n + pad,), np.float32)
    for i in range(0, n + pad, sc):
        o_sh = interleave_shard(origins[i : i + sc], D)
        d_sh = interleave_shard(dirs[i : i + sc], D)
        t_sh, alive_sh, conv_sh, sdf_sh, n_alive_max = sphere_trace_adaptive_dp(
            mesh, march_eval, ctx, o_sh, d_sh, BOUND, nr_rounds,
            iters_per_round, sdf_multiplier, sdf_converged_tresh,
            grid_cfg=grid_cfg, grid=grid, refine_sdf_eval=refine_eval,
            refine_ctx=refine_ctx, nr_refine_iters=nr_refine_iters,
            dist_field=dist_field, round_sdf_evals=round_evals,
            jump_substeps=jump_substeps, prepass_jumps=prepass_jumps,
            jump_gate_voxels=jump_gate_voxels,
        )
        bucket = pow2_bucket(max(n_alive_max, 1), lo=256,
                             hi=max(256, chunk_local))
        idx, rgb_u8, nrm_u8, lit = _make_dp_shade(mesh, cfg, bucket, grid_cfg)(
            params, grid, o_sh, d_sh, t_sh, conv_sh, alive_sh, it)
        idx_np = np.asarray(idx)          # [D, bucket] local hit indices
        rgb_np = np.asarray(rgb_u8)
        nrm_np = np.asarray(nrm_u8)
        lit_np = np.asarray(lit)          # [D, chunk_local]
        for d in range(D):
            valid = idx_np[d] < chunk_local
            # interleave layout: local slot c on device d is ray c*D + d
            rows = i + idx_np[d][valid] * D + d
            rgb[rows] = rgb_np[d][valid] / 255.0
            nrm[rows] = nrm_np[d][valid] / 255.0 * 2.0 - 1.0
        w[i : i + sc] = np.moveaxis(lit_np, 0, 1).reshape(-1)
    w = w[:n, None]
    return rgb[:n] * w, nrm[:n] * w, w


def render_image_sphere_traced_fast(
        params, grid, K, tf_world_cam, width, height, iter_nr_anneal,
        cfg: PermutoSDFTrainConfig, chunk: int = 1 << 21,
        lod_levels: int | None = 12, nr_rounds: int = 5,
        iters_per_round: int = 3, nr_refine_iters: int = 4,
        sdf_multiplier: float = 0.9, sdf_converged_tresh: float = 2e-4,
        dist_field=None, mesh=None, lod_schedule: tuple | None = None,
        jump_substeps: int = 4, prepass_jumps: int = 16,
        jump_gate_voxels: float = 1.0,
        shade_sdf_levels: int | None = None):
    """The interactive rendering fast path (reference: "render at
    interactive speeds" via sphere tracing, README.md:19 +
    run_net_sphere_traced, train_permuto_sdf.py:211-242).

    Host-adaptive compaction everywhere: trace buckets sized from measured
    active counts (ops/sphere_trace.sphere_trace_adaptive) with
    distance-field empty-space skipping (the field is computed once per
    call — pass ``dist_field`` to amortize it across frames of the same
    checkpoint), LOD march on the coarsest ``lod_levels`` encoding levels
    with full-res refinement of the hits, and a shading bucket sized from
    the true lit count (no silent black holes — every lit ray is shaded).

    Multi-chip: with more than one visible device (or an explicit ``mesh``)
    the frame's rays are interleave-sharded over the mesh and traced/shaded
    SPMD (ops/sphere_trace.sphere_trace_adaptive_dp) — pixel-identical, and
    the per-frame wall clock divides by ~device_count (the reference's
    interactive renderer is single-GPU)."""
    from permuto_sdf_tpu.datasets.tensor_reel import rays_from_frame
    from permuto_sdf_tpu.ops.sphere_trace import (
        sphere_trace_adaptive, pow2_bucket, _grid_distance_field,
    )

    origins, dirs = rays_from_frame(K, tf_world_cam, width, height)
    n = origins.shape[0]

    if mesh is None and jax.device_count() > 1:
        from permuto_sdf_tpu.parallel import make_ray_mesh

        mesh = make_ray_mesh()
    if mesh is not None and mesh.devices.size > 1:
        rgb, nrm, w = _render_sphere_traced_dp(
            params, grid, origins, dirs, n, iter_nr_anneal, cfg, mesh, chunk,
            lod_levels, nr_rounds, iters_per_round, nr_refine_iters,
            sdf_multiplier, sdf_converged_tresh, dist_field, jump_substeps,
            prepass_jumps, lod_schedule=lod_schedule,
            jump_gate_voxels=jump_gate_voxels)
        return (rgb.reshape(height, width, 3), nrm.reshape(height, width, 3),
                w.reshape(height, width, 1))
    # clamp the chunk to the frame's ray count (bucket-ladder granularity):
    # a fixed 2^21 chunk is right for 1080p (2.07M rays) but at lower
    # resolutions the pad-to-chunk would trace up to 13x dummy rays
    # (measured 39 s for a 400^2 frame whose real work is ~3 s)
    chunk = min(chunk, pow2_bucket(n, lo=256, hi=chunk))
    pad = (-n) % chunk
    # pad rays start far OUTSIDE the bound sphere pointing away -> the
    # boundary intersection kills them before any SDF evaluation
    origins = jnp.concatenate(
        [origins, jnp.tile(jnp.asarray([[10.0, 0.0, 0.0]]), (pad, 1))], 0)
    dirs = jnp.concatenate(
        [dirs, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (pad, 1))], 0)

    it = jnp.asarray(iter_nr_anneal)
    ctx = (params["sdf"], it)
    march_eval, refine_eval, refine_ctx, round_evals = _make_trace_lod_evals(
        cfg, ctx, lod_levels, lod_schedule)

    grid_cfg = cfg.grid if (cfg.use_occupancy_grid and grid is not None) else None
    if grid_cfg is not None and dist_field is None:
        dist_field = _cached_dist_field(grid_cfg, grid)
    rgbs, normals, alphas = [], [], []
    for i in range(0, n + pad, chunk):
        o, d = origins[i : i + chunk], dirs[i : i + chunk]
        pos, sdf, conv, alive, n_alive = sphere_trace_adaptive(
            march_eval, ctx, o, d, BOUND, nr_rounds, iters_per_round,
            sdf_multiplier, sdf_converged_tresh, grid_cfg=grid_cfg, grid=grid,
            refine_sdf_eval=refine_eval, refine_ctx=refine_ctx,
            nr_refine_iters=nr_refine_iters, dist_field=dist_field,
            return_n_hit=True, round_sdf_evals=round_evals,
            final_refresh=False,  # the shading pass re-evaluates the hits
            jump_substeps=jump_substeps, prepass_jumps=prepass_jumps,
            jump_gate_voxels=jump_gate_voxels,
        )
        lit = _lit_and_state(pos, conv, alive, grid, grid_cfg, cfg)
        # n_alive >= n_lit (lit additionally requires in-bounds+occupied),
        # so it sizes the shading bucket without another device round-trip
        bucket = pow2_bucket(max(n_alive, 1), lo=256, hi=max(256, chunk))
        idx, rgb_u8, nrm_u8, lit = _shade_hits_compact(
            params, pos, d, lit, it, cfg, bucket,
            shade_sdf_levels=shade_sdf_levels)
        # host-side frame reconstruction from the compacted transfer
        R = o.shape[0]
        idx_np = np.asarray(idx)
        valid = idx_np < R
        w = np.asarray(lit, np.float32)[:, None]
        rgb = np.zeros((R, 3), np.float32)
        nrm = np.zeros((R, 3), np.float32)
        rgb[idx_np[valid]] = np.asarray(rgb_u8)[valid] / 255.0
        nrm[idx_np[valid]] = np.asarray(nrm_u8)[valid] / 255.0 * 2.0 - 1.0
        rgbs.append(rgb * w)
        normals.append(nrm * w)
        alphas.append(w)
    rgb = np.concatenate(rgbs)[:n].reshape(height, width, 3)
    nrm = np.concatenate(normals)[:n].reshape(height, width, 3)
    alpha = np.concatenate(alphas)[:n].reshape(height, width, 1)
    return rgb, nrm, alpha


def render_image_sphere_traced(params, grid, K, tf_world_cam, width, height,
                               iter_nr_anneal, cfg: PermutoSDFTrainConfig,
                               chunk: int = 8192, **trace_kwargs):
    from permuto_sdf_tpu.datasets.tensor_reel import rays_from_frame

    if (cfg.use_occupancy_grid and grid is not None
            and "dist_field" not in trace_kwargs):
        # build the Chebyshev empty-space field once per image, not per chunk
        trace_kwargs["dist_field"] = _cached_dist_field(cfg.grid, grid)
    origins, dirs = rays_from_frame(K, tf_world_cam, width, height)
    n = origins.shape[0]
    pad = (-n) % chunk
    origins = jnp.concatenate([origins, jnp.zeros((pad, 3))], 0)
    dirs = jnp.concatenate([dirs, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))], 0)
    rgbs, normals, alphas = [], [], []
    for i in range(0, n + pad, chunk):
        rgb, nrm, w = render_rays_sphere_traced(
            params, grid, origins[i : i + chunk], dirs[i : i + chunk],
            iter_nr_anneal, cfg, **trace_kwargs,
        )
        rgbs.append(np.asarray(rgb))
        normals.append(np.asarray(nrm))
        alphas.append(np.asarray(w))
    rgb = np.concatenate(rgbs)[:n].reshape(height, width, 3)
    nrm = np.concatenate(normals)[:n].reshape(height, width, 3)
    alpha = np.concatenate(alphas)[:n].reshape(height, width, 1)
    return rgb, nrm, alpha


# ---------------------------------------------------------------------------
# Training loop
# ---------------------------------------------------------------------------

def _c2f_active_levels(it_anneal: int, cfg: PermutoSDFTrainConfig):
    """Number of SDF encoding levels with a NONZERO c2f window weight at
    this iteration (level l eases in as t*nr_levels passes l —
    models/fields.py::_c2f_t), ceil'd to a multiple of 4 so the ease-in
    costs at most nr_levels/4 recompiles. None once every level is open.
    Skipping zero-weight levels is mathematically a no-op: the window
    multiplies their features by exactly 0; the gathers are simply never
    issued (VERDICT r3 item 1a)."""
    if it_anneal >= cfg.sdf_nr_iters_for_c2f:
        return None
    t = 0.3 + 0.7 * it_anneal / max(cfg.sdf_nr_iters_for_c2f, 1)
    act = int(np.ceil(t * cfg.nr_levels))
    act = min(cfg.nr_levels, -(-act // 4) * 4)
    return None if act >= cfg.nr_levels else act


def _precompile_ahead(pre, params, opt_state, grid, reel, optimizer, cfg,
                      it: int, extra_cfgs=()):
    """Predict the step graphs the loop is likely to need next and submit
    them for background AOT compilation (utils/precompile.py — the graphs
    land in the persistent compilation cache, turning the main loop's
    eventual blocking compile into a fast deserialize). Predictions are
    one rung away from the current operating point along each host-driven
    dimension: the c2f level front (a pure function of the iteration), the
    ray-bucket ladder and the hit-ray compaction ladder (both move as the
    grid sparsifies), plus every table-grad parity of the period and the
    curvature-off variant near its switch-off iteration. A misprediction
    costs only background compile time; the sets are deduplicated."""
    if pre is None or grid is None:
        return
    key = jax.random.PRNGKey(0)
    it_arr = jnp.asarray(it)
    it_anneal = max(it - cfg.nr_iter_sphere_fit, 0)

    cands = [cfg]
    if cfg.c2f_level_skip and it < cfg.nr_iter_sphere_fit:
        # during sphere init, the first TRAIN step will run at the c2f
        # front's initial level count, not at the live cfg's (None)
        act0 = _c2f_active_levels(0, cfg)
        if act0 != cfg.sdf_active_levels:
            cands = [dataclasses.replace(cfg, sdf_active_levels=act0)]
    if cfg.c2f_level_skip:
        # submit the next TWO c2f fronts: cold compiles run 60-110 s
        # while the front moves every ~100 iters, so one-ahead drains
        # too late when the worker queue is deep (BENCH r5 cold,
        # events at iters 320-605)
        seen_fronts = []
        for da in (0, 50, 100, 200, 400, 800):
            act = _c2f_active_levels(it_anneal + da, cfg)
            if act != cfg.sdf_active_levels and act not in seen_fronts:
                seen_fronts.append(act)
                cands.append(dataclasses.replace(cfg, sdf_active_levels=act))
                if len(seen_fronts) >= 2:
                    break
    nxt = _ray_bucket(cfg.nr_rays + 1)
    if nxt != cfg.nr_rays:
        cands.append(dataclasses.replace(cfg, nr_rays=nxt))
    if cfg.hit_ray_frac is not None:
        below = [f for f in _HIT_FRAC_LADDER if f < cfg.hit_ray_frac]
        if below:
            cands.append(dataclasses.replace(cfg, hit_ray_frac=below[-1]))
            if nxt != cfg.nr_rays:
                # cross rung: when the sparsifying grid moves BOTH
                # ladders in close succession (bucket up, then frac
                # down at the new bucket), the one-rung-per-dimension
                # prediction misses the combined graph — exactly the
                # 40-100 s main-loop stalls at BENCH r5 preview iters
                # 1026-1301
                cands.append(dataclasses.replace(
                    cfg, nr_rays=nxt, hit_ray_frac=below[-1]))
    if (cfg.enable_curvature
            and it_anneal + 300 >= cfg.iter_finish_reduce_curv):
        cands.append(dataclasses.replace(cfg, enable_curvature=False))
    cands.extend(extra_cfgs)

    for c in cands:
        parities = (tuple(range(c.table_grad_period))
                    if c.table_grad_alternate else (None,))
        for p in parities:
            cp = dataclasses.replace(c, table_grad_parity=p)
            k = ("grads", cp.nr_rays, cp.sdf_active_levels, p,
                 cp.hit_ray_frac, cp.enable_curvature)
            pre.ensure(k, lambda cp=cp: _grads_step.lower(
                params, grid, reel, key, it_arr, cp).compile())
        co = _canon_occ_cfg(c)
        pre.ensure(("occ", c.sdf_active_levels),
                   lambda co=co: _occupancy_update_jit.lower(
                       params, grid, key, jnp.asarray(it, jnp.int32),
                       jnp.asarray(1.0, jnp.float32), co).compile())
    cu = _canon_update_cfg(cfg)
    pre.ensure(("update",), lambda: _update_step.lower(
        params, opt_state, params, it_arr, cu, optimizer).compile())


def _ray_bucket(n: int, lo: int = 128, hi: int = 4096,
                current: int | None = None) -> int:
    """Snap a desired ray count UP to the {2^k, 3*2^(k-1)} rung ladder
    (..., 512, 768, 1024, 1536, 2048, 3072, 4096): the 1.33-1.5x spacing
    lets the dynamic rebalancer actually HOLD the reference's fixed
    valid-sample budget (49k — train_permuto_sdf.py:104) once the grid
    sparsifies, where pure power-of-2 rungs overshoot/undershoot by up
    to 2x and settle far under budget. Costs at most one extra re-jit
    per octave vs the r3 pow2 ladder. ``lo`` must be a power of 2.

    With ``current`` set, stays on the current rung while the desired
    count is within +-20% of it (hysteresis: per-step valid-count noise
    must not flip adjacent 1.33x rungs and churn re-jits)."""
    if current is not None and 0.8 * current <= n <= 1.2 * current:
        return current
    b = lo
    while b < n and b < hi:
        b = (b * 3 // 2) if (b & (b - 1)) == 0 else (b * 4 // 3)
    return min(b, hi)


_HIT_FRAC_LADDER = (0.25, 0.375, 0.5, 0.625, 0.75, 1.0)


def _hit_frac_bucket(hit_frac: float, current: float) -> float:
    """Pick the hit-ray compaction fraction from a static rung ladder
    given the measured hit fraction: the smallest rung with >=1.3x
    headroom (so per-batch hit-count noise never overflows the bucket),
    moving DOWN only when the lower rung still has >=1.8x headroom
    (hysteresis — each move is a re-jit). 1.0 = compaction off (the dense
    path; early training, grid still dense, every ray hits)."""
    want = min(1.0, hit_frac * 1.3)
    up = next((f for f in _HIT_FRAC_LADDER if f >= want), 1.0)
    if up > current:
        return up
    # down-move margin 1.45: just above the 1.3 up-trigger so a move
    # down can't bounce straight back, but low enough that the ladder
    # actually REACHES the right rung (the old 1.8 margin left the
    # bench settled one rung high: hit frac 0.311 could never descend
    # past 0.625 even though 0.5 carries 1.6x headroom — BENCH r5
    # preview, settled_hit_ray_frac 0.625)
    down = next((f for f in _HIT_FRAC_LADDER
                 if f >= min(1.0, hit_frac * 1.45)), 1.0)
    return down if down < current else current


def train(reel: TensorReel, cfg: PermutoSDFTrainConfig,
          nr_iters: int | None = None, seed: int = 0, log_every: int = 1000,
          checkpoint_path: str | None = None,
          experiment_name: str = "permuto_sdf", save_every: int = 10000,
          callbacks=None, dynamic_nr_rays: bool = True,
          resume_from: str | None = None,
          data_parallel: bool | None = None,
          shard_reel_over_mesh: bool = False,
          precompile_ahead: bool = False):
    """``dynamic_nr_rays`` is the reference's load-balancing trick
    (train_permuto_sdf.py:394-397): rescale the ray count so the total
    packed sample count stays near target_nr_of_samples — here snapped to
    power-of-2 buckets to keep shapes static per compiled variant.

    ``resume_from`` points at a ``<ckpt>/<exp>/<iter>/models`` dir written
    by a previous run; training continues from the saved iteration with
    exact optimizer state (capability the reference lacks — its checkpoints
    are inference-only, permuto_sdf_utils.py:222-237).

    ``data_parallel`` (default: auto — on iff more than one device is
    visible) shards ray batches over a 1-D device mesh with pmean'd
    gradients over ICI (parallel/data_parallel.py). ``cfg.nr_rays`` is the
    PER-DEVICE ray count; params/grid/reel are replicated. The dynamic
    rebalancer then holds the per-device sample budget, so adding chips
    scales total rays/step linearly. For DTU-scale image stacks pass the
    reel through :func:`datasets.tensor_reel.quantize_reel` first — uint8
    storage quarters the per-chip HBM and upload cost of the replication,
    losslessly for 8-bit sources (dequant happens after the per-ray
    gather). The reference has no multi-GPU path (SURVEY.md §2.3) — this
    is a new capability under the same API."""
    nr_iters = nr_iters or cfg.iter_finish_training
    if data_parallel is None:
        data_parallel = jax.device_count() > 1
    nr_cams = reel.nr_images  # BEFORE sharding: colorcal is per global image
    if not data_parallel:
        # one bulk upload; host-backed reel buffers would otherwise be
        # re-shipped into EVERY step on the remote-TPU transport
        # (PERFORMANCE.md finding 17 — ruinous for DTU-scale image
        # stacks). The DP path shards/replicates the reel itself.
        reel = _device_resident(reel)
    mesh = None
    dp_step_cache = {}
    if data_parallel:
        from permuto_sdf_tpu.parallel import make_ray_mesh, make_dp_train_step, dp_keys

        mesh = make_ray_mesh()
        if shard_reel_over_mesh and mesh.devices.size > 1:
            from permuto_sdf_tpu.datasets.tensor_reel import shard_reel

            # each device holds 1/D of the images (SURVEY §5.8); samplers
            # report global image ids so colorcal stays per global image
            reel = shard_reel(reel, mesh.devices.size)
        else:
            shard_reel_over_mesh = False

        def get_dp_step(step_cfg):
            if step_cfg not in dp_step_cache:
                dp_step_cache[step_cfg] = make_dp_train_step(
                    compute_loss_and_grads, apply_updates, mesh, step_cfg,
                    optimizer, reel_sharded=shard_reel_over_mesh,
                )
            return dp_step_cache[step_cfg]
    target_nr_samples = cfg.nr_rays * (
        cfg.max_nr_samples_per_ray + 2 * cfg.nr_samples_imp_sampling
    )
    key = jax.random.PRNGKey(seed)
    optimizer = make_optimizer(cfg)
    start_iter = 0
    last_inv_s = jnp.asarray(jnp.exp(0.3 * 10.0), jnp.float32)
    if resume_from:
        st = ckpt.load_train_state(resume_from)
        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        params = as_jnp(st["params"])
        opt_state = as_jnp(st["opt_state"])
        grid = as_jnp(st["grid"]) if st["grid"] is not None else None
        start_iter = int(st["iter"]) + 1
        last_inv_s = jnp.asarray(st["last_inv_s"])
        if dynamic_nr_rays and int(st["nr_rays"]) != cfg.nr_rays:
            cfg = dataclasses.replace(cfg, nr_rays=int(st["nr_rays"]))
        print(f"resumed from {resume_from} at iter {start_iter}")
    else:
        params = init_params(jax.random.fold_in(key, 0), cfg, nr_cams)
        opt_state = optimizer.init(params)
        grid = og.make_occupancy_grid(cfg.grid) if cfg.use_occupancy_grid else None

    # lever gating (cfg.lever_start_iter): the approximating levers are
    # stripped for the formation phase and restored at the gate (one
    # re-jit each way, predicted by the precompiler). None = AUTO —
    # no-mask training gates at the end of the cos/variance anneal
    # (nomask_bisect_r5.json), with_mask runs levers from iter 0.
    gate_iter = cfg.lever_start_iter
    if gate_iter is None:
        gate_iter = 0 if cfg.with_mask else cfg.forced_variance_finish_iter
    cfg = dataclasses.replace(cfg, lever_start_iter=gate_iter)
    gated_levers = None
    if (cfg.lever_start_iter
            and start_iter - cfg.nr_iter_sphere_fit < cfg.lever_start_iter
            and (cfg.train_lod_top_k is not None or cfg.table_grad_alternate)):
        gated_levers = dict(train_lod_top_k=cfg.train_lod_top_k,
                            table_grad_alternate=cfg.table_grad_alternate)
        cfg = dataclasses.replace(cfg, train_lod_top_k=None,
                                  table_grad_alternate=False)

    pre = None
    if precompile_ahead and not data_parallel:
        from permuto_sdf_tpu.utils.precompile import StepPrecompiler

        pre = StepPrecompiler()
        # first train-step graphs compile in the background DURING the
        # sphere-init phase (VERDICT r4 missing #5)
        _precompile_ahead(pre, params, opt_state, grid, reel, optimizer,
                          cfg, start_iter)

    history = []
    t0 = time.perf_counter()
    for it in range(start_iter, nr_iters):
        # per-iteration keys derived by fold_in so a resumed run sees the
        # exact same randomness stream as an uninterrupted one
        k_step, k_grid = jax.random.split(jax.random.fold_in(key, it + 1))
        in_sphere_init = it < cfg.nr_iter_sphere_fit
        if in_sphere_init:
            params, opt_state, loss = sphere_init_step(
                params, opt_state, k_step, it, cfg, optimizer
            )
            aux = {}
        else:
            it_anneal = it - cfg.nr_iter_sphere_fit
            if gated_levers is not None and it_anneal >= cfg.lever_start_iter:
                cfg = dataclasses.replace(cfg, **gated_levers)
                gated_levers = None
            if cfg.enable_curvature and it_anneal >= cfg.iter_finish_reduce_curv:
                # curvature weight annealed to 0 — drop the double-backprop
                # term from the compiled graph (one re-jit), like the
                # reference's `if global_weight_curvature>0` python branch
                cfg = dataclasses.replace(cfg, enable_curvature=False)
            if cfg.c2f_level_skip:
                act = _c2f_active_levels(it_anneal, cfg)
                if act != cfg.sdf_active_levels:
                    cfg = dataclasses.replace(cfg, sdf_active_levels=act)
            if cfg.use_occupancy_grid and it % cfg.grid_update_every == 0:
                if data_parallel:
                    # probe-point SDF evals sharded over the mesh (the
                    # update itself is replicated — grid stays bitwise
                    # identical on every device)
                    grid = make_dp_occupancy_update(mesh, _canon_occ_cfg(cfg))(
                        params, grid, k_grid, jnp.asarray(it_anneal),
                        last_inv_s)
                else:
                    grid = occupancy_update(params, grid, k_grid, it_anneal,
                                            last_inv_s, cfg)
            # parity alternation is per-step and kept OUT of the cfg used by
            # occupancy updates (their graph does not depend on it)
            step_cfg = cfg
            if cfg.table_grad_alternate:
                step_cfg = dataclasses.replace(
                    cfg, table_grad_parity=it % cfg.table_grad_period)
            if data_parallel:
                from permuto_sdf_tpu.parallel import dp_keys

                params, opt_state, loss, aux = get_dp_step(step_cfg)(
                    params, opt_state, grid, reel, dp_keys(k_step, mesh),
                    jnp.asarray(it),
                )
            else:
                params, opt_state, loss, aux = train_step(
                    params, opt_state, grid, reel, k_step, it, step_cfg,
                    optimizer
                )
            last_inv_s = aux["inv_s"]
            if dynamic_nr_rays and it % 50 == 0:
                # rebalance ray count toward the fixed sample budget
                # (host-side; fetches one scalar)
                cur = max(float(aux["nr_samples"]), 1.0)
                prev_rays = cfg.nr_rays  # the bucket aux was measured at
                want = int(cfg.nr_rays * target_nr_samples / cur)
                bucket = _ray_bucket(want, current=cfg.nr_rays)
                if bucket != cfg.nr_rays:
                    cfg = dataclasses.replace(cfg, nr_rays=bucket)
                # drive the hit-ray compaction fraction from the measured
                # hit fraction (dense while the grid is dense; tightens as
                # the scene sparsifies)
                if cfg.hit_ray_frac is not None and "nr_hit_rays" in aux:
                    hf = float(aux["nr_hit_rays"]) / max(prev_rays, 1)
                    frac = _hit_frac_bucket(hf, cfg.hit_ray_frac)
                    if frac != cfg.hit_ray_frac:
                        cfg = dataclasses.replace(cfg, hit_ray_frac=frac)
                extra = (() if gated_levers is None else
                         (dataclasses.replace(cfg, **gated_levers),))
                _precompile_ahead(pre, params, opt_state, grid, reel,
                                  optimizer, cfg, it, extra_cfgs=extra)

        if it % log_every == 0 or it == nr_iters - 1:
            lv = float(loss)
            history.append((it, lv, float(aux["loss_rgb"]) if aux else None))
            extra = (
                f"  rgb {float(aux['loss_rgb']):.4f} eik {float(aux['loss_eikonal']):.4f}"
                if aux else "  (sphere init)"
            )
            print(f"iter {it:6d}  loss {lv:.6f}{extra}  ({time.perf_counter()-t0:.1f}s)")
            if callbacks:
                for cb in callbacks:
                    cb(it, loss, aux, params, grid)
        if checkpoint_path and save_every and it > 0 and it % save_every == 0:
            _save(checkpoint_path, experiment_name, it, params, grid,
                  opt_state=opt_state, cfg=cfg, last_inv_s=last_inv_s)
    if checkpoint_path:
        _save(checkpoint_path, experiment_name, nr_iters, params, grid,
              opt_state=opt_state, cfg=cfg, last_inv_s=last_inv_s,
              final_iter=nr_iters - 1)
    return params, grid, history


def _save(checkpoint_path, experiment_name, it, params, grid, opt_state=None,
          cfg=None, last_inv_s=None, final_iter=None):
    ckpt.save_model(checkpoint_path, experiment_name, it, "sdf_model", params["sdf"])
    ckpt.save_model(checkpoint_path, experiment_name, it, "rgb_model", params["rgb"])
    ckpt.save_model(checkpoint_path, experiment_name, it, "nerf_hash_model_bg",
                    params["bg"])
    ckpt.save_model(checkpoint_path, experiment_name, it, "variance",
                    params["variance"])
    if "colorcal" in params:
        ckpt.save_model(checkpoint_path, experiment_name, it, "colorcal_model",
                        params["colorcal"])
    if grid is not None:
        ckpt.save_model(checkpoint_path, experiment_name, it, "occupancy_grid", grid)
    if opt_state is not None:
        ckpt.save_train_state(checkpoint_path, experiment_name, it, {
            "params": params,
            "opt_state": opt_state,
            "grid": grid,
            "iter": final_iter if final_iter is not None else it,
            "last_inv_s": last_inv_s,
            "nr_rays": cfg.nr_rays if cfg is not None else 0,
        })


def load_from_checkpoint(ckpt_path_full: str, cfg: PermutoSDFTrainConfig):
    """permuto_sdf_utils.load_from_checkpoint equivalent: returns
    (params, grid)."""
    params = {
        "sdf": ckpt.load_model(ckpt_path_full, "sdf_model"),
        "rgb": ckpt.load_model(ckpt_path_full, "rgb_model"),
        "bg": ckpt.load_model(ckpt_path_full, "nerf_hash_model_bg"),
        "variance": ckpt.load_model(ckpt_path_full, "variance"),
    }
    try:
        params["colorcal"] = ckpt.load_model(ckpt_path_full, "colorcal_model")
    except FileNotFoundError:
        pass
    try:
        grid_tree = ckpt.load_model(ckpt_path_full, "occupancy_grid")
        if isinstance(grid_tree, og.OccupancyGridState):
            grid = og.OccupancyGridState(
                values=jnp.asarray(grid_tree.values),
                occupancy=jnp.asarray(grid_tree.occupancy),
            )
        else:
            grid = og.OccupancyGridState(
                values=jnp.asarray(grid_tree["values"]),
                occupancy=jnp.asarray(grid_tree["occupancy"]),
            )
    except FileNotFoundError:
        grid = None
    # Launder everything through a jit identity so the leaves become
    # genuine DEVICE-RESIDENT jit-output buffers. On this remote-TPU
    # transport, host numpy leaves (and even jax.device_put results) are
    # re-shipped on EVERY jitted call at a pathological per-call rate
    # (~150 MB of params -> tens of seconds PER FRAME measured in the
    # round-2 eval); jit outputs are passed by reference. One bulk upload
    # here (~1.4 s) makes every downstream render/eval device-bound.
    params = _device_resident(params)
    if grid is not None:
        grid = _device_resident(grid)
    return params, grid


@jax.jit
def _device_resident(tree):
    """Value-identity whose outputs are fresh device buffers.

    A pure pass-through could be input-output aliased by the runtime (and
    behave like the slow device_put buffers), so each leaf goes through a
    trivial compute op instead."""
    def fresh(a):
        a = jnp.asarray(a)
        if a.dtype == jnp.bool_:
            return a | False
        return a + jnp.zeros((), a.dtype)

    return jax.tree_util.tree_map(fresh, tree)


def main():
    parser = argparse.ArgumentParser(description="Train PermutoSDF")
    parser.add_argument("--dataset", default="synthetic",
                        help="synthetic | dtu | bmvs | multiface | custom | "
                             "phenorobcp1 (datasets/factory.py)")
    parser.add_argument("--scene", default=None,
                        help="scene name under --scene_dir (or multiface "
                             "subject preset id)")
    parser.add_argument("--scene_dir", default=None)
    parser.add_argument("--nr_iters", type=int, default=None)
    parser.add_argument("--low_res", action="store_true")
    parser.add_argument("--with_mask", action="store_true")
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--checkpoint_path", default=None)
    parser.add_argument("--exp_info", default="")
    parser.add_argument("--resume", nargs="?", const="latest", default=None,
                        help="resume training: pass a <...>/models dir, or no "
                             "value to auto-pick the latest checkpoint under "
                             "--checkpoint_path/<experiment>")
    parser.add_argument("--config", default=None,
                        help="hjson-style config file (see config/"
                             "train_permuto_sdf.cfg) loaded onto "
                             "PermutoSDFTrainConfig")
    parser.add_argument("--set", action="append", default=[],
                        metavar="KEY=VALUE", dest="overrides",
                        help="config override, repeatable (e.g. --set "
                             "nr_rays=1024)")
    args = parser.parse_args()

    if args.dataset == "synthetic":
        from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

        reel = make_synthetic_reel(
            nr_views=8 if args.smoke else 24,
            width=64 if args.smoke else 200,
            height=64 if args.smoke else 200,
        )
    else:
        from permuto_sdf_tpu.datasets.factory import create_reel

        reel = create_reel(args.dataset, scene=args.scene,
                           data_root=args.scene_dir, low_res=args.low_res,
                           with_mask=args.with_mask)

    from permuto_sdf_tpu.config import apply_file_and_cli

    if args.smoke:
        cfg = PermutoSDFTrainConfig(
            with_mask=args.with_mask, capacity=2 ** 14, nr_levels=8,
            nr_rays=128, nr_iter_sphere_fit=100, sphere_init_points=4096,
            grid_nr_voxels_per_dim=64, grid_nr_random_samples=8192,
            sdf_nr_iters_for_c2f=200, forced_variance_finish_iter=400,
            max_nr_samples_per_ray=32, nr_samples_imp_sampling=8,
            warmup_iters=100,
        )
        cfg = apply_file_and_cli(cfg, args.config, args.overrides)
        params, grid, history = train(reel, cfg, nr_iters=600, log_every=50)
        post = [h for h in history if h[0] >= cfg.nr_iter_sphere_fit]
        assert post[-1][2] < post[0][2] * 0.9, (
            f"smoke: rgb loss did not improve {post[0]} -> {post[-1]}"
        )
        print("SMOKE OK:", post[0], "->", post[-1])
    else:
        cfg = apply_file_and_cli(
            PermutoSDFTrainConfig(with_mask=args.with_mask),
            args.config, args.overrides)
        exp = "permuto_sdf" + (f"_{args.exp_info}" if args.exp_info else "")
        resume_from = args.resume
        if resume_from == "latest":
            resume_from = ckpt.latest_checkpoint_dir(args.checkpoint_path, exp)
            if resume_from is None:
                print("no checkpoint to resume from — starting fresh")
        train(reel, cfg, nr_iters=args.nr_iters,
              checkpoint_path=args.checkpoint_path, experiment_name=exp,
              resume_from=resume_from)


if __name__ == "__main__":
    main()
