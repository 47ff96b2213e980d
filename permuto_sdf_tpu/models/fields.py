"""Neural field models: SDF, RGB (Lipschitz), NerfHash, Colorcal.

Functional equivalents of the torch modules in
``/root/reference/permuto_sdf_py/models/models.py``; every model is an
``init_*`` returning a param pytree plus a pure ``*_apply``. Gradients of
the SDF w.r.t. positions use ``jax.jvp``/``jax.grad`` instead of torch's
``autograd.grad(create_graph=True)`` (``models.py:236-251``) — double
backprop composes for free.

All models share one permutohedral encoding config: capacity 2^18, 24
levels, 2 feats/level, scales geomspace(1, 1e-4) (``models.py:141-148``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from permuto_sdf_tpu.models.mlp import (
    init_mlp,
    mlp_apply,
    init_lipshitz_mlp,
    lipshitz_mlp_apply,
)
from permuto_sdf_tpu.ops.permuto_encoding import (
    PermutoEncodingSpec,
    init_encoding_params,
    permuto_encode,
    coarse2fine_window,
)
from permuto_sdf_tpu.ops.spherical_harmonics import spherical_harmonics


def _c2f_t(iter_nr, nr_iters_for_c2f):
    """map_range_val(iter, 0, nr_iters_for_c2f, 0.3, 1.0) — models.py:183."""
    x = jnp.clip(iter_nr / jnp.maximum(nr_iters_for_c2f, 1e-8), 0.0, 1.0)
    return 0.3 + 0.7 * x


# ---------------------------------------------------------------------------
# SDF field (models.py:131-307)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SDFConfig:
    in_channels: int = 3
    geom_feat_size_out: int = 32
    nr_iters_for_c2f: int = 10000
    capacity: int = 2 ** 18
    nr_levels: int = 24
    sdf_shift: float = 1e-2  # init bias so the SDF starts positive
    # Spatial-gradient AD direction: "reverse" (vjp, the literal
    # torch.autograd.grad analog; measured fastest on TPU v5e) or
    # "forward" (jvp). Identical values either way — see sdf_with_gradient.
    gradient_mode: str = "reverse"
    # bf16-pair-packed table gathers (1 gather instance per vertex instead
    # of 2 — see ops/permuto_encoding.py). Master table stays f32; forward
    # values round to bf16. Forward-mode AD needs the unpacked path.
    table_bf16: bool = True
    # sorted-scatter backward for the packed gathers (finding 18 A/B)
    sorted_scatter: bool = False
    # ONE row-2 gather per vertex instead of the packed-bf16 word gather:
    # faster (4.29 vs 7.12 ns/instance on v5e, roofline2.json) AND exact
    # f32 — supersedes packed_bf16 when on. Needs reverse-mode AD.
    table_row_gather: bool = True
    # alternating-level table gradients (ops/permuto_encoding.py docstring)
    grad_level_parity: int | None = None
    grad_level_period: int = 2
    # coarse-to-fine level skipping: when set, every encode behaves as if
    # max_levels=active_levels — the trainer drives this from the c2f
    # window front so levels whose window weight is still exactly 0 never
    # pay their gathers (VERDICT r3 item 1a). None = all levels.
    active_levels: int | None = None

    @property
    def encoding(self) -> PermutoEncodingSpec:
        return PermutoEncodingSpec(
            pos_dim=self.in_channels,
            capacity=self.capacity,
            nr_levels=self.nr_levels,
            concat_points=True,
            concat_points_scaling=1e-3,  # models.py:149
            packed_bf16=self.table_bf16 and self.gradient_mode != "forward",
            row_gather=self.table_row_gather and self.gradient_mode != "forward",
            sorted_scatter=self.sorted_scatter,
            grad_level_parity=self.grad_level_parity,
            grad_level_period=self.grad_level_period,
        )


def init_sdf(key, cfg: SDFConfig) -> dict:
    k_enc, k_mlp = jax.random.split(key)
    enc = init_encoding_params(k_enc, cfg.encoding)
    mlp = init_mlp(
        k_mlp,
        [cfg.encoding.output_dims, 32, 32, 32, 1 + cfg.geom_feat_size_out],
        last_layer_linear_init=True,
    )
    # +1e-2 bias on the sdf output so the field starts positive (models.py:164-165)
    mlp[-1]["b"] = mlp[-1]["b"].at[0].add(cfg.sdf_shift)
    return {"encoding": enc, "mlp_sdf": mlp}


def sdf_apply(params, points, iter_nr, cfg: SDFConfig, max_levels=None):
    """points [N, d] -> (sdf [N, 1], geom_feat [N, G] or None).

    ``max_levels`` (static) evaluates only the coarsest K encoding levels —
    a cheap geometry proxy for sample placement / occupancy updates /
    LOD sphere-trace marches. Instead of zero-filling the skipped levels
    (which costs a fusion-breaking concat — PERFORMANCE.md finding 6), the
    first MLP layer's input rows for those levels are statically sliced
    away: mathematically identical (skipped features are zero, so their
    weight rows contribute nothing), and the finest levels' gathers are
    never issued."""
    window = coarse2fine_window(_c2f_t(iter_nr, cfg.nr_iters_for_c2f), cfg.nr_levels)
    L = cfg.nr_levels
    if cfg.active_levels is not None:
        # c2f front skipping: levels past the front have window weight 0;
        # their gathers are mathematically no-ops and are never issued
        max_levels = (cfg.active_levels if max_levels is None
                      else min(max_levels, cfg.active_levels))
    if max_levels is not None and max_levels < L:
        spec = cfg.encoding
        K = max_levels
        feats = permuto_encode(params["encoding"], points, spec, window,
                               max_levels=K, zero_fill=False)
        mlp = params["mlp_sdf"]
        W0 = mlp[0]["w"]  # [L*F (+d), H]
        F = spec.nr_feat_per_level
        W0_sliced = jnp.concatenate([W0[: K * F], W0[L * F :]], axis=0)
        mlp = [{**mlp[0], "w": W0_sliced}] + list(mlp[1:])
        out = mlp_apply(mlp, feats)
    else:
        feats = permuto_encode(params["encoding"], points, cfg.encoding, window)
        out = mlp_apply(params["mlp_sdf"], feats)
    if cfg.geom_feat_size_out:
        return out[:, 0:1], out[:, -cfg.geom_feat_size_out:]
    return out, None


def sdf_with_gradient(params, points, iter_nr, cfg: SDFConfig):
    """(sdf, d sdf / d points, geom_feat) — equivalent of
    ``get_sdf_and_gradient`` (models.py:236-251).

    Dispatches on ``cfg.gradient_mode``:

    - ``"reverse"`` (default): ONE reverse-mode pass (vjp with unit
      cotangent), the literal analog of
      ``torch.autograd.grad(create_graph=True)``. Measured fastest at
      flagship scale on TPU v5e (737 vs 780 ms/step).
    - ``"forward"``: d-tangent forward-mode Jacobian. The tangent of a
      hash-table gather w.r.t. the *points* reuses the already-gathered
      features (only barycentric weights carry derivatives), so it issues
      no extra gathers and no gather-transpose (scatter) at first order —
      but the 3x tangent flow through the MLPs costs more than it saves
      (XLA already CSEs the shared gathers in the reverse path).
      Mathematically identical to reverse mode.
    """
    if getattr(cfg, "gradient_mode", "reverse") == "forward":
        return _sdf_with_gradient_fwd(params, points, iter_nr, cfg)
    return _sdf_with_gradient_rev(params, points, iter_nr, cfg)


def _sdf_with_gradient_rev(params, points, iter_nr, cfg: SDFConfig):
    def f(p):
        return sdf_apply(params, p, iter_nr, cfg)

    (sdf, geom_feat), vjp_fn = jax.vjp(f, points)
    cot_geom = (
        jnp.zeros_like(geom_feat) if geom_feat is not None else None
    )
    if geom_feat is None:
        (grads,) = vjp_fn((jnp.ones_like(sdf), None))
    else:
        (grads,) = vjp_fn((jnp.ones_like(sdf), cot_geom))
    return sdf, grads, geom_feat


def _sdf_with_gradient_fwd(params, points, iter_nr, cfg: SDFConfig):
    d = points.shape[-1]

    def f_jvp(tangent):
        return jax.jvp(
            lambda p: sdf_apply(params, p, iter_nr, cfg), (points,), (tangent,)
        )

    eye = jnp.eye(d, dtype=points.dtype)
    tangents = jnp.broadcast_to(eye[:, None, :], (d,) + points.shape)
    (sdf, geom_feat), (dsdf, _) = jax.vmap(f_jvp, out_axes=((None, None), 0))(
        tangents
    )
    # dsdf: [d, N, 1] -> grads [N, d]
    grads = jnp.moveaxis(dsdf[..., 0], 0, -1)
    return sdf, grads, geom_feat


def sdf_curvature_from_gradient(params, key, points, sdf_gradients, iter_nr,
                                cfg: SDFConfig, epsilon: float = 1e-4):
    """Curvature along a random tangent direction (models.py:261-294):
    normal at p vs normal at p + eps*tangent, angle mapped to [0,1]."""
    rand_dirs = jax.random.normal(key, points.shape)
    rand_dirs = rand_dirs / (jnp.linalg.norm(rand_dirs, axis=-1, keepdims=True) + 1e-12)
    normals = sdf_gradients / (
        jnp.linalg.norm(sdf_gradients, axis=-1, keepdims=True) + 1e-12
    )
    tangent = jnp.cross(normals, rand_dirs)
    points_shifted = points + tangent * epsilon
    sdf_shifted, grads_shifted, _ = sdf_with_gradient(
        params, points_shifted, iter_nr, cfg
    )
    normals_shifted = grads_shifted / (
        jnp.linalg.norm(grads_shifted, axis=-1, keepdims=True) + 1e-12
    )
    dot = jnp.sum(normals * normals_shifted, axis=-1, keepdims=True)
    angle = jnp.arccos(jnp.clip(dot, -1.0 + 1e-6, 1.0 - 1e-6))
    return sdf_shifted, angle / jnp.pi


# ---------------------------------------------------------------------------
# RGB field (models.py:309-421)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RGBConfig:
    in_channels: int = 3
    geom_feat_size_in: int = 32
    nr_iters_for_c2f: int = 1
    capacity: int = 2 ** 18
    nr_levels: int = 24
    sh_degree: int = 5  # 25 channels (models.py:373)
    table_bf16: bool = True
    table_row_gather: bool = True
    sorted_scatter: bool = False
    grad_level_parity: int | None = None
    grad_level_period: int = 2

    @property
    def encoding(self) -> PermutoEncodingSpec:
        return PermutoEncodingSpec(
            pos_dim=self.in_channels,
            capacity=self.capacity,
            nr_levels=self.nr_levels,
            concat_points=True,
            concat_points_scaling=1.0,  # models.py:333
            packed_bf16=self.table_bf16,
            row_gather=self.table_row_gather,
            sorted_scatter=self.sorted_scatter,
            grad_level_parity=self.grad_level_parity,
            grad_level_period=self.grad_level_period,
        )

    @property
    def mlp_in_channels(self) -> int:
        return (
            self.encoding.output_dims
            + self.sh_degree ** 2
            + 3  # normals
            + self.geom_feat_size_in
        )


def init_rgb(key, cfg: RGBConfig) -> dict:
    k_enc, k_mlp = jax.random.split(key)
    return {
        "encoding": init_encoding_params(k_enc, cfg.encoding),
        "mlp": init_lipshitz_mlp(k_mlp, cfg.mlp_in_channels, [128, 128, 64, 3]),
    }


def rgb_apply(params, points, samples_dirs, sdf_gradients, geom_feat, iter_nr,
              cfg: RGBConfig, colorcal_params=None, per_sample_img_indices=None,
              return_logits: bool = False):
    """points/dirs/gradients/geom_feat [N, *] -> rgb [N, 3] in (0,1).

    ``per_sample_img_indices`` (for colorcal) is already per *sample* — the
    dense-layout caller expands per-ray image ids itself, replacing the
    reference's ``compute_per_sample_ray_idx`` CSR expansion
    (models.py:722-726).
    """
    window = coarse2fine_window(_c2f_t(iter_nr, cfg.nr_iters_for_c2f), cfg.nr_levels)
    feats = permuto_encode(params["encoding"], points, cfg.encoding, window)
    dirs_enc = jax.lax.stop_gradient(spherical_harmonics(samples_dirs, cfg.sh_degree))
    normals = sdf_gradients / (
        jnp.linalg.norm(sdf_gradients, axis=-1, keepdims=True) + 1e-12
    )
    x = jnp.concatenate([feats, dirs_enc, normals, geom_feat], axis=-1)
    x = lipshitz_mlp_apply(params["mlp"], x)
    if colorcal_params is not None:
        x = colorcal_apply(colorcal_params, x, per_sample_img_indices)
    if return_logits:
        return x
    return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# NerfHash — foreground NeRF & background model (models.py:425-563)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NerfHashConfig:
    in_channels: int = 3  # 4 for the background model (4D parameterization)
    nr_iters_for_c2f: int = 1
    capacity: int = 2 ** 18
    nr_levels: int = 24
    nr_feat_for_rgb: int = 64
    sh_degree: int = 4  # 16 channels (models.py:503)
    table_bf16: bool = True
    table_row_gather: bool = True
    sorted_scatter: bool = False
    grad_level_parity: int | None = None
    grad_level_period: int = 2

    @property
    def encoding(self) -> PermutoEncodingSpec:
        return PermutoEncodingSpec(
            pos_dim=self.in_channels,
            capacity=self.capacity,
            nr_levels=self.nr_levels,
            concat_points=True,
            concat_points_scaling=1.0,
            packed_bf16=self.table_bf16,
            row_gather=self.table_row_gather,
            sorted_scatter=self.sorted_scatter,
            grad_level_parity=self.grad_level_parity,
            grad_level_period=self.grad_level_period,
        )


def init_nerf_hash(key, cfg: NerfHashConfig) -> dict:
    k_enc, k_fd, k_rgb = jax.random.split(key, 3)
    return {
        "encoding": init_encoding_params(k_enc, cfg.encoding),
        # feat+density head keeps the default (non-linear) init for its last
        # layer — the reference does NOT linear-init it (models.py:460).
        "mlp_feat_and_density": init_mlp(
            k_fd,
            [cfg.encoding.output_dims, 64, 64, 64, cfg.nr_feat_for_rgb + 1],
            last_layer_linear_init=False,
        ),
        "mlp_rgb": init_mlp(
            k_rgb,
            [cfg.nr_feat_for_rgb + cfg.sh_degree ** 2, 64, 64, 3],
            last_layer_linear_init=True,
        ),
    }


def nerf_hash_apply(params, samples_pos, samples_dirs, iter_nr, cfg: NerfHashConfig,
                    colorcal_params=None, per_sample_img_indices=None):
    """-> (rgb [N,3], density [N,1]); density softplus, rgb sigmoid."""
    window = coarse2fine_window(_c2f_t(iter_nr, cfg.nr_iters_for_c2f), cfg.nr_levels)
    feats = permuto_encode(params["encoding"], samples_pos, cfg.encoding, window)
    dirs_enc = jax.lax.stop_gradient(spherical_harmonics(samples_dirs, cfg.sh_degree))

    fd = mlp_apply(params["mlp_feat_and_density"], feats)
    density = jax.nn.softplus(fd[:, 0:1])
    feat_rgb = fd[:, 1 : cfg.nr_feat_for_rgb + 1]

    x = jnp.concatenate([jax.nn.gelu(feat_rgb), dirs_enc], axis=-1)
    rgb = mlp_apply(params["mlp_rgb"], x)
    if colorcal_params is not None:
        rgb = colorcal_apply(colorcal_params, rgb, per_sample_img_indices)
    return jax.nn.sigmoid(rgb), density


def nerf_hash_density(params, samples_pos, iter_nr, cfg: NerfHashConfig):
    """Density-only path for occupancy updates (models.py:528-550)."""
    window = coarse2fine_window(_c2f_t(iter_nr, cfg.nr_iters_for_c2f), cfg.nr_levels)
    feats = permuto_encode(params["encoding"], samples_pos, cfg.encoding, window)
    fd = mlp_apply(params["mlp_feat_and_density"], feats)
    return jax.nn.softplus(fd[:, 0:1])


# ---------------------------------------------------------------------------
# Colorcal — per-image affine color calibration (models.py:678-741)
# ---------------------------------------------------------------------------

def init_colorcal(nr_cams: int) -> dict:
    return {
        "weight_delta": jnp.zeros((nr_cams, 3)),
        "bias": jnp.zeros((nr_cams, 3)),
    }


def colorcal_apply(params, rgb_samples, per_sample_img_indices,
                   idx_with_fixed_calib: int = 0):
    """rgb [N,3] calibrated by per-sample image index; the fixed-calib camera
    keeps identity (weight 1, bias 0)."""
    idx = per_sample_img_indices.astype(jnp.int32)
    w = 1.0 + jnp.take(params["weight_delta"], idx, axis=0)
    b = jnp.take(params["bias"], idx, axis=0)
    fixed = (idx == idx_with_fixed_calib)[:, None]
    w = jnp.where(fixed, 1.0, w)
    b = jnp.where(fixed, 0.0, b)
    return rgb_samples * w + b
