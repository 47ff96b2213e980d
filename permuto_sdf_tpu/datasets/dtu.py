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
