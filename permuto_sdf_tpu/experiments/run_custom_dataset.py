"""Train PermutoSDF on a custom dataset of images + intrinsics + poses.

Equivalent of ``/root/reference/permuto_sdf_py/experiments/
run_custom_dataset/run_custom_dataset.py``: builds frames from a directory
of images plus per-image K and camera-to-world poses, applies the scene
scale/translation the user provides so the object of interest fits the
r=0.5 bounding sphere (``run_custom_dataset.py:32-51``), and runs the full
pipeline.

Expected layout::

    <dir>/images/*.png|jpg
    <dir>/cameras.json   # {"frames": [{"file": ..., "K": 3x3,
                         #              "tf_world_cam": 4x4}, ...]}

or the IDR ``cameras.npz`` convention (delegates to the DTU loader).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import jax.numpy as jnp


def load_custom_scene(scene_dir: str, scene_scale_multiplier: float = 1.0,
                      scene_translation=(0.0, 0.0, 0.0), subsample: int = 1):
    from permuto_sdf_tpu.datasets.tensor_reel import TensorReel

    cam_json = os.path.join(scene_dir, "cameras.json")
    if not os.path.exists(cam_json):
        from permuto_sdf_tpu.datasets.dtu import load_dtu_scene

        return load_dtu_scene(scene_dir, scene_scale_multiplier=scene_scale_multiplier)

    with open(cam_json) as f:
        meta = json.load(f)
    import imageio.v2 as imageio

    rgbs, Ks, tfs = [], [], []
    t = np.asarray(scene_translation, np.float32)
    for fr in meta["frames"]:
        img = np.asarray(
            imageio.imread(os.path.join(scene_dir, "images", fr["file"])),
            np.float32,
        )[..., :3] / 255.0
        K = np.asarray(fr["K"], np.float32)
        if subsample > 1:
            img = img[::subsample, ::subsample]
            K = K.copy()
            K[:2] /= subsample
        tf = np.asarray(fr["tf_world_cam"], np.float32)
        tf[:3, 3] = (tf[:3, 3] + t) * scene_scale_multiplier
        rgbs.append(img)
        Ks.append(K)
        tfs.append(tf)

    return TensorReel(
        rgb=jnp.asarray(np.stack(rgbs)), mask=None,
        K=jnp.asarray(np.stack(Ks)), tf_world_cam=jnp.asarray(np.stack(tfs)),
    )


def main():
    parser = argparse.ArgumentParser(description="Train on a custom dataset")
    parser.add_argument("--scene_dir", required=True)
    parser.add_argument("--scene_scale_mult", type=float, default=1.0)
    parser.add_argument("--scene_translation", type=float, nargs=3,
                        default=[0.0, 0.0, 0.0])
    parser.add_argument("--subsample", type=int, default=1)
    parser.add_argument("--nr_iters", type=int, default=None)
    parser.add_argument("--checkpoint_path", default="./checkpoints")
    parser.add_argument("--exp_info", default="custom")
    args = parser.parse_args()

    from permuto_sdf_tpu.train import train_permuto_sdf as tps

    reel = load_custom_scene(args.scene_dir, args.scene_scale_mult,
                             tuple(args.scene_translation), args.subsample)
    cfg = tps.PermutoSDFTrainConfig()
    tps.train(reel, cfg, nr_iters=args.nr_iters,
              checkpoint_path=args.checkpoint_path,
              experiment_name=f"permuto_sdf_{args.exp_info}")


if __name__ == "__main__":
    main()
