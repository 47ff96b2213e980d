"""TensorReel: device-resident image stack + fused random ray generation.

Equivalent of the reference's ``TensorReel`` (from the external DataLoaders
package) plus ``PermutoSDF::random_rays_from_reel``
(``/root/reference/src/PermutoSDF.cu:67-112``, kernel
``kernels/permuto_sdf/PermutoSDFGPU.cuh:24-127``): sample nr_rays random
(image, pixel) pairs from the stacked dataset and emit ray origins/dirs +
gt rgb/mask in one fused op.

Layout is channels-last ``[N, H, W, 3]`` (TPU-native) instead of the
reference's NCHW. The pixel->ray math matches the reference exactly:
pixel centers at +0.5, K^-1 to camera coords, rotate by the world-from-cam
rotation, gt rgb multiplied by the mask when present.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TensorReel:
    rgb: jnp.ndarray  # [N, H, W, 3] float32 in [0, 1] — or uint8 (see below)
    mask: Optional[jnp.ndarray]  # [N, H, W, 1] float32 / uint8 or None
    K: jnp.ndarray  # [N, 3, 3] intrinsics
    tf_world_cam: jnp.ndarray  # [N, 4, 4] camera-to-world transforms
    # Global image ids [N] int32 — only set on device-local SHARDS of a
    # bigger reel (see :func:`shard_reel`), where row i is globally image
    # img_ids[i]; None = identity (rows are globally numbered already).
    # Consumers that key per-image state (colorcal) always receive global
    # ids from the ray samplers.
    img_ids: Optional[jnp.ndarray] = None

    @property
    def nr_images(self) -> int:
        return self.rgb.shape[0]

    @property
    def height(self) -> int:
        return self.rgb.shape[1]

    @property
    def width(self) -> int:
        return self.rgb.shape[2]


def quantize_reel(reel: TensorReel) -> TensorReel:
    """uint8-storage copy of the reel: 4x less HBM and 4x less transport.

    The pixel sources are 8-bit images anyway, so dequantizing AFTER the
    per-ray gather (see :func:`_dequant_rgb`) reproduces the source data
    exactly — lossless for any loader that read uint8 files. This is the
    intended storage for DTU-scale stacks in data-parallel training,
    where the reel is replicated to every device (a 49-view 1600x1200
    DTU reel is ~1.1 GB f32 but ~276 MB u8 per chip)."""
    q = lambda x: jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)
    return dataclasses.replace(
        reel,
        rgb=q(reel.rgb) if reel.rgb.dtype != jnp.uint8 else reel.rgb,
        mask=(None if reel.mask is None else
              (q(reel.mask) if reel.mask.dtype != jnp.uint8 else reel.mask)),
    )


def _dequant(x):
    """Post-gather dequantization: u8 reels store pixels as 0..255."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


def shard_reel(reel: TensorReel, n_devices: int) -> TensorReel:
    """Prepare a reel for image-sharded data-parallel training: each
    device will hold only ``ceil(N / D)`` of the images instead of a full
    replica (SURVEY §2.3/§5.8's host-sharded reel — the memory-scaling
    upgrade over replication; the reference is single-GPU,
    ``src/PermutoSDF.cu:67-112``).

    Returns a reel whose image axis is padded to ``D * L`` by wrapping
    (images 0.. fill the remainder) with ``img_ids`` recording each row's
    global image id. Under ``shard_map`` with the reel's leaves sharded on
    axis 0, every device sees a valid local TensorReel of L images and
    samples rays only from it — no gather/all-to-all of pixel data ever
    happens. Per-ray loss expectation is unchanged when ``N % D == 0``
    (each image is equally likely overall); with wrap padding the first
    ``D*L - N`` images are sampled at most one shard-slot more often —
    negligible against the reference's own uniform-view sampling noise,
    and exact whenever N is a multiple of D.
    """
    n = reel.nr_images
    L = -(-n // n_devices)
    ids = jnp.arange(n_devices * L, dtype=jnp.int32) % n
    take = lambda x: jnp.take(x, ids, axis=0)
    return TensorReel(
        rgb=take(reel.rgb),
        mask=None if reel.mask is None else take(reel.mask),
        K=take(reel.K),
        tf_world_cam=take(reel.tf_world_cam),
        img_ids=(take(reel.img_ids) if reel.img_ids is not None else ids),
    )


def random_rays_from_reel(reel: TensorReel, key, nr_rays: int,
                          apply_mask: bool = True):
    """-> (ray_origins [R,3], ray_dirs [R,3], gt_rgb [R,3], gt_mask [R,1],
    img_indices [R]).

    ``apply_mask`` multiplies gt_rgb by the object mask (the reference
    kernel's behavior, PermutoSDFGPU.cuh:102-122). The reference only
    loads masks into its reel when training WITH mask supervision, so its
    unconditional multiply is equivalent to gating on with_mask; our
    reels carry masks whenever the dataset has them (eval/IoU need them),
    so trainers MUST pass ``apply_mask=cfg.with_mask`` — masking the
    targets in no-mask mode silently zeroes the background supervision
    and the NeRF++ background model learns black (found as the r2/r3
    full-image-PSNR collapse)."""
    k_img, k_pix = jax.random.split(key)
    n, h, w = reel.nr_images, reel.height, reel.width
    img_idx = jax.random.randint(k_img, (nr_rays,), 0, n)
    pix_idx = jax.random.randint(k_pix, (nr_rays,), 0, h * w)
    px = (pix_idx % w).astype(jnp.float32) + 0.5
    py = (pix_idx // w).astype(jnp.float32) + 0.5

    K = reel.K[img_idx]  # [R, 3, 3]
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    cam = jnp.stack([(px - cx) / fx, (py - cy) / fy, jnp.ones_like(px)], axis=-1)

    tf = reel.tf_world_cam[img_idx]  # [R, 4, 4]
    R_mat = tf[:, :3, :3]
    t = tf[:, :3, 3]
    world = jnp.einsum("rij,rj->ri", R_mat, cam) + t
    dirs = world - t
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    yi = (py - 0.5).astype(jnp.int32)
    xi = (px - 0.5).astype(jnp.int32)
    gt_rgb = _dequant(reel.rgb[img_idx, yi, xi])  # [R, 3]
    if reel.mask is not None:
        gt_mask = _dequant(reel.mask[img_idx, yi, xi])
        if apply_mask:
            gt_rgb = gt_rgb * gt_mask
    else:
        gt_mask = jnp.ones((nr_rays, 1), gt_rgb.dtype)
    if reel.img_ids is not None:  # sharded reel: report GLOBAL image ids
        img_idx = jnp.take(reel.img_ids, img_idx)
    return t, dirs, gt_rgb, gt_mask, img_idx


def rays_from_reprojection_reel(reel: TensorReel, key, points_reprojected,
                                apply_mask: bool = True):
    """Rays that look at given 3D points from random training cameras —
    equivalent of ``PermutoSDF::rays_from_reprojection_reel``
    (``src/PermutoSDF.cu:114-163``, kernel ``PermutoSDFGPU.cuh:130-268``).

    Each point is projected into one randomly chosen camera; if the
    projection lands outside the image, a uniformly random pixel of that
    camera is used instead (so every ray is always valid). The ray is then
    rebuilt from the (possibly replaced) pixel center's back-projection.

    -> (ray_origins [N,3], ray_dirs [N,3], gt_rgb [N,3], gt_mask [N,1],
    img_indices [N]).
    """
    pts = jnp.asarray(points_reprojected)
    n_pts = pts.shape[0]
    k_img, k_pix = jax.random.split(key)
    n, h, w = reel.nr_images, reel.height, reel.width
    img_idx = jax.random.randint(k_img, (n_pts,), 0, n)
    rand_pix = jax.random.randint(k_pix, (n_pts,), 0, h * w)

    tf = reel.tf_world_cam[img_idx]  # [N, 4, 4] cam->world
    R_wc = tf[:, :3, :3]
    t_wc = tf[:, :3, 3]
    # world->cam is the inverse rigid transform
    cam_pts = jnp.einsum("rji,rj->ri", R_wc, pts - t_wc)

    K = reel.K[img_idx]
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    sx = cam_pts[:, 0] * fx / cam_pts[:, 2] + cx
    sy = cam_pts[:, 1] * fy / cam_pts[:, 2] + cy

    in_bounds = (
        (jnp.floor(sx) >= 0) & (jnp.floor(sx) < w)
        & (jnp.floor(sy) >= 0) & (jnp.floor(sy) < h)
    )
    # out-of-bounds projections fall back to a random pixel center
    sx = jnp.where(in_bounds, sx, (rand_pix % w).astype(sx.dtype) + 0.5)
    sy = jnp.where(in_bounds, sy, (rand_pix // w).astype(sy.dtype) + 0.5)

    cam = jnp.stack([(sx - cx) / fx, (sy - cy) / fy, jnp.ones_like(sx)], axis=-1)
    world = jnp.einsum("rij,rj->ri", R_wc, cam) + t_wc
    dirs = world - t_wc
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    yi = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
    gt_rgb = _dequant(reel.rgb[img_idx, yi, xi])
    if reel.mask is not None:
        gt_mask = _dequant(reel.mask[img_idx, yi, xi])
        if apply_mask:  # see random_rays_from_reel — gate on with_mask
            gt_rgb = gt_rgb * gt_mask
    else:
        gt_mask = jnp.ones((n_pts, 1), gt_rgb.dtype)
    if reel.img_ids is not None:  # sharded reel: report GLOBAL image ids
        img_idx = jnp.take(reel.img_ids, img_idx)
    return t_wc, dirs, gt_rgb, gt_mask, img_idx


def rays_from_frame(K, tf_world_cam, width: int, height: int):
    """All-pixel ray generation for one frame — equivalent of
    ``create_rays_from_frame`` (``permuto_sdf_py/utils/nerf_utils.py:459-500``)
    / ``CreateRaysModule`` (``models/modules.py:165-238``).

    Returns (origins [H*W, 3], dirs [H*W, 3]) in row-major pixel order
    (x fastest), matching the reference's traversal."""
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    px, py = jnp.meshgrid(xs, ys, indexing="xy")  # [H, W]
    K = jnp.asarray(K)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    cam = jnp.stack(
        [(px - cx) / fx, (py - cy) / fy, jnp.ones_like(px)], axis=-1
    ).reshape(-1, 3)
    tf = jnp.asarray(tf_world_cam)
    world = cam @ tf[:3, :3].T + tf[:3, 3]
    dirs = world - tf[:3, 3]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(tf[:3, 3], dirs.shape)
    return origins, dirs


def look_at_cam_to_world(eye, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    """Camera-to-world 4x4 for a camera at ``eye`` looking at ``target``
    (OpenCV convention: +z forward, +x right, +y down)."""
    import numpy as np

    eye = np.asarray(eye, dtype=np.float64)
    fwd = np.asarray(target, dtype=np.float64) - eye
    fwd = fwd / np.linalg.norm(fwd)
    upv = np.asarray(up, dtype=np.float64)
    right = np.cross(fwd, upv)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    tf = np.eye(4)
    tf[:3, 0] = right
    tf[:3, 1] = down
    tf[:3, 2] = fwd
    tf[:3, 3] = eye
    return tf


def crop_reel_to_sphere(reel: TensorReel, radius: float = 0.5,
                        center=(0.0, 0.0, 0.0)) -> TensorReel:
    """Crop every frame to the projected bounding sphere, equal-sized.

    Equivalent of the reference's ``get_frames_cropped``
    (``/root/reference/permuto_sdf_py/utils/permuto_sdf_utils.py:99-179``,
    used by the multiface/phenorob pipelines): per frame, project the
    bound-sphere extremes along the camera's x/y axes to get a 2D box,
    clamp it into the image, equalize all boxes to the largest box that
    still fits every frame, and shift each frame's principal point by its
    crop offset. Rays generated from the cropped reel are identical to the
    corresponding rays of the original frames — only off-subject pixels
    are discarded (less wasted ray budget per batch).

    Host-side preprocessing (numpy): runs once at load time.
    """
    import numpy as np

    rgb = np.asarray(reel.rgb)
    mask = np.asarray(reel.mask) if reel.mask is not None else None
    Ks = np.asarray(reel.K).copy()
    tfs = np.asarray(reel.tf_world_cam)
    N, H, W = rgb.shape[:3]
    c = np.asarray(center, np.float64)

    def project(i, p_world):
        tf = tfs[i]
        R, t = tf[:3, :3], tf[:3, 3]
        cam = R.T @ (np.asarray(p_world, np.float64) - t)
        px = Ks[i] @ (cam / max(cam[2], 1e-9))
        return px[:2]

    crops = []
    max_w = max_h = 0
    for i in range(N):
        x_axis, y_axis = tfs[i][:3, 0], tfs[i][:3, 1]
        x_neg = project(i, c - x_axis * radius)
        x_pos = project(i, c + x_axis * radius)
        y_pos = project(i, c + y_axis * radius)  # +y is down in pixels
        y_neg = project(i, c - y_axis * radius)
        sx = int(np.floor(min(x_neg[0], x_pos[0])))
        sy = int(np.floor(min(y_pos[1], y_neg[1])))
        w = int(np.ceil(abs(x_pos[0] - x_neg[0])))
        h = int(np.ceil(abs(y_neg[1] - y_pos[1])))
        # valid-crop clamp (frame.get_valid_crop equivalent)
        sx, sy = max(sx, 0), max(sy, 0)
        w, h = min(w, W - sx), min(h, H - sy)
        crops.append([sx, sy, w, h])
        max_w, max_h = max(max_w, w), max(max_h, h)
    max_w, max_h = min(max_w, W), min(max_h, H)

    out_rgb = np.empty((N, max_h, max_w, 3), rgb.dtype)
    out_mask = (np.empty((N, max_h, max_w, mask.shape[-1]), mask.dtype)
                if mask is not None else None)
    for i, (sx, sy, w, h) in enumerate(crops):
        # enlarge_crop_to_size equivalent: grow to (max_w, max_h) while
        # staying inside the image
        sx = min(max(0, sx - (max_w - w) // 2), W - max_w)
        sy = min(max(0, sy - (max_h - h) // 2), H - max_h)
        out_rgb[i] = rgb[i, sy:sy + max_h, sx:sx + max_w]
        if out_mask is not None:
            out_mask[i] = mask[i, sy:sy + max_h, sx:sx + max_w]
        Ks[i][0, 2] -= sx
        Ks[i][1, 2] -= sy

    return TensorReel(
        rgb=jnp.asarray(out_rgb),
        mask=jnp.asarray(out_mask) if out_mask is not None else None,
        K=jnp.asarray(Ks),
        tf_world_cam=reel.tf_world_cam,
    )
