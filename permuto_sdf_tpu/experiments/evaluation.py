"""Evaluation driver: meshes, rendered test images, Chamfer, PSNR.

Covers the reference's evaluation experiment scripts
(``/root/reference/permuto_sdf_py/experiments/evaluation/``):
``create_my_meshes.py`` (marching cubes at high res from checkpoints),
``create_my_images.py`` (render test views), ``evaluate_chamfer_distance.py``
(DTUeval protocol) and ``evaluate_psnr.py`` (PSNR/SSIM on test views) — as
one CLI with subcommands operating on this framework's checkpoints.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _train_cfg(args):
    from permuto_sdf_tpu.config import load_config
    from permuto_sdf_tpu.train import train_permuto_sdf as tps

    return load_config(tps.PermutoSDFTrainConfig,
                       getattr(args, "config", None),
                       getattr(args, "overrides", None))


def cmd_create_mesh(args):
    import jax
    from permuto_sdf_tpu.train import train_permuto_sdf as tps
    from permuto_sdf_tpu.models.fields import sdf_apply
    from permuto_sdf_tpu.ops.marching_cubes import extract_mesh_from_sdf_fn
    from permuto_sdf_tpu.datasets.mesh_io import Mesh, save_obj

    cfg = _train_cfg(args)
    params, grid = tps.load_from_checkpoint(args.ckpt, cfg)

    @jax.jit
    def sdf_fn(pts):
        return sdf_apply(params["sdf"], pts, 9_999_999, cfg.sdf_model)[0]

    V, F = extract_mesh_from_sdf_fn(sdf_fn, args.res, -0.5, 0.5)
    save_obj(args.out, Mesh(V, F))
    print(f"mesh: {len(V)} verts {len(F)} faces -> {args.out}")


def cmd_render_images(args):
    from permuto_sdf_tpu.train import train_permuto_sdf as tps
    from permuto_sdf_tpu.datasets.dtu import load_dtu_scene

    cfg = _train_cfg(args)
    params, grid = tps.load_from_checkpoint(args.ckpt, cfg)
    reel = load_dtu_scene(args.scene_dir, low_res=args.low_res)
    os.makedirs(args.out_dir, exist_ok=True)
    import imageio.v2 as imageio

    for i in range(reel.nr_images):
        rgb, nrm, alpha = tps.render_image(
            params, grid, reel.K[i], reel.tf_world_cam[i],
            reel.width, reel.height, 9_999_999, cfg,
        )
        imageio.imwrite(os.path.join(args.out_dir, f"{i:06d}.png"),
                        (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
    print(f"rendered {reel.nr_images} views -> {args.out_dir}")


def _maybe_clean(V, F, args):
    """NeuS mask mesh-cleaning (reference evaluate_chamfer_distance.py:
    110-167) when --clean_masks_npz is given: the npz holds ``masks``
    [N, H, W] (bool/uint8) and ``world_mats`` [N, 3or4, 4]."""
    if not getattr(args, "clean_masks_npz", None):
        return V, F
    from permuto_sdf_tpu.eval.mesh_cleaning import clean_mesh

    data = np.load(args.clean_masks_npz)
    V, F = clean_mesh(V, F, data["world_mats"],
                      np.asarray(data["masks"]) > 0.5,
                      dilate_kernel=args.dilate_kernel)
    print(f"mask-cleaned mesh: {len(V)} verts {len(F)} faces remain")
    return V, F


def cmd_chamfer(args):
    from permuto_sdf_tpu.datasets.mesh_io import load_obj
    from permuto_sdf_tpu.eval.chamfer import point_mesh_chamfer, dtu_chamfer

    pred = load_obj(args.pred_mesh)
    V, F = _maybe_clean(pred.V, pred.F, args)

    if args.protocol == "dtu":
        # GT is the structured-light point cloud; optional official
        # ObsMask/Plane .mat files engage the full DTUeval filtering
        if args.gt_points.endswith(".npy"):
            gt_pts = np.load(args.gt_points)
        else:
            gt = load_obj(args.gt_points)
            gt_pts = gt.V
        obs_mask = bb = res = plane = None
        if args.obsmask_mat:
            from scipy.io import loadmat

            m = loadmat(args.obsmask_mat)
            obs_mask, bb, res = m["ObsMask"], m["BB"], float(m["Res"])
        if args.plane_mat:
            from scipy.io import loadmat

            plane = loadmat(args.plane_mat)["P"]
        both, d2s, s2d = dtu_chamfer(
            V, F, gt_pts, downsample_density=args.downsample or 0.2,
            max_dist=args.max_dist if np.isfinite(args.max_dist) else 20.0,
            obs_mask=obs_mask, bb=bb, res=res, ground_plane=plane,
        )
        print(json.dumps({"chamfer": both, "mean_d2s": d2s, "mean_s2d": s2d,
                          "protocol": "dtu"}))
        return

    gt = load_obj(args.gt_mesh)
    both, a2b, b2a = point_mesh_chamfer(
        V, F, gt.V, gt.F,
        downsample=args.downsample, max_dist=args.max_dist,
    )
    print(json.dumps({"chamfer": both, "pred_to_gt": a2b, "gt_to_pred": b2a}))


def cmd_psnr(args):
    import imageio.v2 as imageio
    from permuto_sdf_tpu.eval.metrics import (psnr, ssim, ms_ssim, lpips,
                                              _lpips_params)

    preds = sorted(os.listdir(args.pred_dir))
    gts = sorted(os.listdir(args.gt_dir))
    lp_params = _lpips_params()
    scores_p, scores_s, scores_m, scores_l = [], [], [], []
    for p, g in zip(preds, gts):
        a = np.asarray(imageio.imread(os.path.join(args.pred_dir, p)), np.float32) / 255
        b = np.asarray(imageio.imread(os.path.join(args.gt_dir, g)), np.float32) / 255
        scores_p.append(float(psnr(a, b)))
        scores_s.append(float(ssim(a, b)))
        if min(a.shape[:2]) >= 176:  # 11 * 2^4 — 5-scale validity bound
            scores_m.append(float(ms_ssim(a, b)))
        scores_l.append(float(lpips(a, b, params=lp_params)))
    print(json.dumps({
        "psnr_mean": float(np.mean(scores_p)),
        "ssim_mean": float(np.mean(scores_s)),
        # calibrated perceptual metric: standard 5-scale MS-SSIM (fully
        # formula-specified, comparable across implementations)
        "ms_ssim_mean": float(np.mean(scores_m)) if scores_m else None,
        # deliberately NOT named "lpips_mean": this is the random-feature
        # substitute (pretrained VGG weights are unobtainable in this
        # environment) — the values rank image pairs but are NOT comparable
        # to published pretrained-VGG LPIPS numbers
        "lpips_randfeat_mean": float(np.mean(scores_l)),
        "lpips_randfeat_note": "UNCALIBRATED random-VGG-feature perceptual "
                               "distance (see eval/metrics.py) — not "
                               "comparable to pretrained-VGG LPIPS",
        "per_image_psnr": scores_p,
    }))


def main():
    parser = argparse.ArgumentParser(description="Evaluation tools")
    sub = parser.add_subparsers(dest="cmd", required=True)

    def _cfg_args(p):
        p.add_argument("--config", default=None,
                       help="hjson-style trainer config the checkpoint was "
                            "trained with (shape must match)")
        p.add_argument("--set", action="append", default=[],
                       metavar="KEY=VALUE", dest="overrides",
                       help="config override, repeatable")

    p = sub.add_parser("create_mesh")
    p.add_argument("--ckpt", required=True, help="checkpoint models dir")
    p.add_argument("--res", type=int, default=700)
    p.add_argument("--out", required=True)
    _cfg_args(p)
    p.set_defaults(fn=cmd_create_mesh)

    p = sub.add_parser("render_images")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--scene_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--low_res", action="store_true")
    _cfg_args(p)
    p.set_defaults(fn=cmd_render_images)

    p = sub.add_parser("chamfer")
    p.add_argument("--pred_mesh", required=True)
    p.add_argument("--gt_mesh", default=None,
                   help="GT mesh (generic protocol)")
    p.add_argument("--protocol", default="generic", choices=["generic", "dtu"])
    p.add_argument("--gt_points", default=None,
                   help="DTU protocol: GT point cloud (.npy or .obj)")
    p.add_argument("--obsmask_mat", default=None,
                   help="DTU ObsMask<scan>_10.mat (optional)")
    p.add_argument("--plane_mat", default=None,
                   help="DTU Plane<scan>.mat ground plane (optional)")
    p.add_argument("--clean_masks_npz", default=None,
                   help="npz with masks [N,H,W] + world_mats [N,3,4]: "
                        "NeuS-style mask cleaning before Chamfer")
    p.add_argument("--dilate_kernel", type=int, default=101)
    p.add_argument("--downsample", type=float, default=0.0)
    p.add_argument("--max_dist", type=float, default=float("inf"))
    p.set_defaults(fn=cmd_chamfer)

    p = sub.add_parser("psnr")
    p.add_argument("--pred_dir", required=True)
    p.add_argument("--gt_dir", required=True)
    p.set_defaults(fn=cmd_psnr)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
