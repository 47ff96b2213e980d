"""DTU / BlendedMVS dataset loader (IDR ``cameras.npz`` convention).

Replaces the reference's external ``DataLoaderDTU`` (EasyPBR DataLoaders
package; configured at
``/root/reference/config/train_permuto_sdf.cfg`` ``loader_dtu`` block with
``scene_scale_multiplier 0.4`` and a scene rotation) for the standard
preprocessed DTU layout used by IDR/NeuS/PermutoSDF:

    <scene>/image/%06d.png    rgb images
    <scene>/mask/%06d.png     optional binary masks
    <scene>/cameras.npz       world_mat_%d (P = K[R|t]), scale_mat_%d

``scale_mat`` normalizes the scene into the unit sphere; after applying it
the object of interest sits inside ||x|| < 1, and ``scene_scale_multiplier``
(default 0.4, matching the reference DTU config) scales further so the
scene fits the r=0.5 bounding primitive.

The projection decomposition (K, R, t from P) uses the standard RQ
factorization, as in IDR's ``load_K_Rt_from_P``.
"""

from __future__ import annotations

import os
import glob

import numpy as np
import jax.numpy as jnp

from permuto_sdf_tpu.datasets.tensor_reel import TensorReel


def _load_image(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    img = imageio.imread(path)
    img = np.asarray(img, dtype=np.float32) / 255.0
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    return img[..., :3]


def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3x4 projection into (K [3,3], cam-to-world [4,4])."""
    import cv2

    out = cv2.decomposeProjectionMatrix(P)
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return K.astype(np.float32), pose


def export_dtu_scene(reel: TensorReel, out_dir: str,
                     scene_scale_multiplier: float = 0.4,
                     scale: float = 2.0,
                     center=(0.03, -0.02, 0.05)) -> str:
    """Write a :class:`TensorReel` to the DTU/IDR on-disk layout
    (``image/%06d.png``, ``mask/%06d.png``, ``cameras.npz`` with
    ``world_mat_%d``/``scale_mat_%d``) such that
    ``load_dtu_scene(out_dir, scene_scale_multiplier=...)`` reproduces the
    reel (images to 8-bit precision, cameras to float precision).

    This is the inverse of the reference pipeline's dataset preparation
    (``create_my_meshes.py:61-86`` builds world_mat = K [R|t] from frames;
    scale_mat normalizes the scene into the unit sphere): cameras are
    stored in a "raw capture" world frame derived from the reel's by a
    deliberately NON-trivial ``scale_mat`` (uniform ``scale`` + ``center``
    offset), so a roundtrip exercises the full world_mat @ scale_mat
    composite and the ``scene_scale_multiplier`` shrink, not just an
    identity path. Used to prove the real-data chain end-to-end without
    DTU bytes in the environment.
    """
    import imageio.v2 as imageio

    os.makedirs(os.path.join(out_dir, "image"), exist_ok=True)
    has_mask = reel.mask is not None
    if has_mask:
        os.makedirs(os.path.join(out_dir, "mask"), exist_ok=True)

    # scale_mat: normalized-world -> raw-world (x_raw = s * x_n + c)
    scale_mat = np.eye(4, dtype=np.float64)
    scale_mat[0, 0] = scale_mat[1, 1] = scale_mat[2, 2] = scale
    scale_mat[:3, 3] = np.asarray(center, np.float64)

    cams = {}
    rgb = np.asarray(reel.rgb)
    if rgb.dtype == np.uint8:  # quantize_reel storage
        rgb = rgb.astype(np.float32) / 255.0
    Ks = np.asarray(reel.K)
    tfs = np.asarray(reel.tf_world_cam)
    for i in range(reel.nr_images):
        img8 = np.clip(np.round(rgb[i] * 255.0), 0, 255).astype(np.uint8)
        imageio.imwrite(os.path.join(out_dir, "image", f"{i:06d}.png"), img8)
        if has_mask:
            m8 = (np.asarray(reel.mask)[i, ..., 0] > 0.5).astype(np.uint8) * 255
            imageio.imwrite(os.path.join(out_dir, "mask", f"{i:06d}.png"), m8)

        # the loader multiplies the decomposed camera centre by
        # scene_scale_multiplier — store poses in the pre-shrink frame
        pose_n = tfs[i].astype(np.float64).copy()
        pose_n[:3, 3] /= scene_scale_multiplier
        K4 = np.eye(4, dtype=np.float64)
        K4[:3, :3] = Ks[i]
        # world_mat @ scale_mat must equal K [R|t] of the normalized world
        world_mat = K4 @ np.linalg.inv(pose_n) @ np.linalg.inv(scale_mat)
        cams[f"world_mat_{i}"] = world_mat
        cams[f"scale_mat_{i}"] = scale_mat

    np.savez(os.path.join(out_dir, "cameras.npz"), **cams)
    return out_dir


def load_dtu_scene(scene_dir: str, low_res: bool = False, with_mask: bool = True,
                   scene_scale_multiplier: float = 0.4,
                   subsample: int | None = None) -> TensorReel:
    """Load a DTU/BMVS scene directory into a device-resident TensorReel."""
    cam_path = os.path.join(scene_dir, "cameras.npz")
    cams = np.load(cam_path)
    img_paths = sorted(
        glob.glob(os.path.join(scene_dir, "image", "*.png"))
        + glob.glob(os.path.join(scene_dir, "image", "*.jpg"))
    )
    if not img_paths:
        raise FileNotFoundError(f"no images under {scene_dir}/image")
    n = len(img_paths)

    sub = subsample or (2 if low_res else 1)

    rgbs, masks, Ks, tfs = [], [], [], []
    for i, p in enumerate(img_paths):
        world_mat = cams[f"world_mat_{i}"]
        scale_mat = cams.get(f"scale_mat_{i}", np.eye(4, dtype=world_mat.dtype))
        P = (world_mat @ scale_mat)[:3, :4]
        K, pose = load_K_Rt_from_P(P)

        img = _load_image(p)
        if sub > 1:
            img = img[::sub, ::sub]
            K = K.copy()
            K[:2] /= sub
        rgbs.append(img)
        Ks.append(K)
        # scene_scale_multiplier shrinks the normalized scene into the
        # r=0.5 bounding primitive (reference cfg: DTU 0.4)
        pose = pose.copy()
        pose[:3, 3] *= scene_scale_multiplier
        tfs.append(pose)

        mpath = os.path.join(scene_dir, "mask", os.path.basename(p))
        if with_mask and os.path.exists(mpath):
            m = _load_image(mpath)[..., :1]
            if sub > 1:
                m = m[::sub, ::sub]
            masks.append((m > 0.5).astype(np.float32))

    mask_arr = jnp.asarray(np.stack(masks)) if len(masks) == n else None

    return TensorReel(
        rgb=jnp.asarray(np.stack(rgbs)),
        mask=mask_arr,
        K=jnp.asarray(np.stack(Ks)),
        tf_world_cam=jnp.asarray(np.stack(tfs)),
    )
