"""Visualization tools: orbit rendering, SDF isolines, 4D time sweeps.

Headless equivalents of the reference's viewer-bound visualization scripts
(``/root/reference/permuto_sdf_py/experiments/visualization/``):
``render_orbit.py`` (camera circling the scene, volumetric or
sphere-traced), ``visualize_sdf_isolines.py`` (a 2D slice of the SDF with
isoline banding), and ``vis_4d_sdf.py`` (sphere-traced time sweep of a 4D
SDF). Instead of the EasyPBR GL viewer (an external GUI dependency), frames
are written as PNGs — the reference's own NGPGui knobs (isoline layer
height, time value, sphere-trace params) become CLI flags.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _orbit_cam(radius: float, height: float, angle: float):
    from permuto_sdf_tpu.datasets.tensor_reel import look_at_cam_to_world

    eye = np.array([radius * np.cos(angle), height, radius * np.sin(angle)])
    return look_at_cam_to_world(eye)


def cmd_orbit(args):
    from permuto_sdf_tpu.train import train_permuto_sdf as tps

    cfg = tps.PermutoSDFTrainConfig()
    params, grid = tps.load_from_checkpoint(args.ckpt, cfg)
    f = 0.5 * args.width / np.tan(np.radians(35.0) / 2)
    K = np.array([[f, 0, args.width / 2], [0, f, args.height / 2], [0, 0, 1]],
                 np.float32)
    os.makedirs(args.out_dir, exist_ok=True)
    import imageio.v2 as imageio

    for i in range(args.nr_frames):
        tf = _orbit_cam(args.orbit_radius, args.orbit_height,
                        2 * np.pi * i / args.nr_frames)
        if args.sphere_traced:
            rgb, nrm, alpha = tps.render_image_sphere_traced(
                params, grid, K, tf, args.width, args.height, 9_999_999, cfg,
            )
        else:
            rgb, nrm, alpha = tps.render_image(
                params, grid, K, tf, args.width, args.height, 9_999_999, cfg,
            )
        imageio.imwrite(os.path.join(args.out_dir, f"orbit_{i:04d}.png"),
                        (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
        if args.with_normals:
            vis = (nrm + 1.0) * 0.5
            imageio.imwrite(os.path.join(args.out_dir, f"orbit_{i:04d}_normals.png"),
                            (np.clip(vis, 0, 1) * 255).astype(np.uint8))
    print(f"wrote {args.nr_frames} orbit frames -> {args.out_dir}")


def sdf_isolines_image(sdf_fn, layer_y: float = 0.0, res: int = 512,
                       isoline_spacing: float = 0.02, line_width: float = 0.15):
    """[res, res, 3] image of the SDF slice at height ``layer_y``: blue/red
    inside/outside shading with dark isoline bands (the viewer shader of
    visualize_sdf_isolines, done in numpy)."""
    import jax.numpy as jnp

    ax = np.linspace(-0.5, 0.5, res, dtype=np.float32)
    xx, zz = np.meshgrid(ax, ax, indexing="ij")
    pts = np.stack([xx, np.full_like(xx, layer_y), zz], -1).reshape(-1, 3)
    sdf = np.asarray(sdf_fn(jnp.asarray(pts))).reshape(res, res)

    inside = sdf < 0
    base = np.where(inside[..., None],
                    np.array([0.3, 0.45, 0.9]), np.array([0.9, 0.55, 0.3]))
    shade = 1.0 - 0.55 * np.clip(np.abs(sdf) / 0.25, 0, 1)[..., None]
    img = base * shade
    frac = np.abs(((sdf / isoline_spacing) % 1.0) - 0.5) * 2.0  # 0 at line
    line = (frac > (1.0 - line_width)).astype(np.float32)[..., None]
    img = img * (1.0 - 0.65 * line)
    zero_band = (np.abs(sdf) < isoline_spacing * 0.25)[..., None]
    img = np.where(zero_band, np.array([1.0, 1.0, 1.0]), img)
    return np.clip(img, 0, 1)


def cmd_isolines(args):
    import jax
    from permuto_sdf_tpu.train import train_permuto_sdf as tps
    from permuto_sdf_tpu.models.fields import sdf_apply

    cfg = tps.PermutoSDFTrainConfig()
    params, _ = tps.load_from_checkpoint(args.ckpt, cfg)

    @jax.jit
    def sdf_fn(pts):
        return sdf_apply(params["sdf"], pts, 9_999_999, cfg.sdf_model)[0]

    img = sdf_isolines_image(sdf_fn, args.layer_y, args.res)
    import imageio.v2 as imageio

    imageio.imwrite(args.out, (img * 255).astype(np.uint8))
    print(f"isolines slice y={args.layer_y} -> {args.out}")


def cmd_vis4d(args):
    import jax
    import jax.numpy as jnp
    from permuto_sdf_tpu.train.train_4d_sdf import extract_mesh_at_time
    from permuto_sdf_tpu.train import checkpoint as ckpt
    from permuto_sdf_tpu.models.fields import SDFConfig
    from permuto_sdf_tpu.datasets.mesh_io import Mesh, save_obj

    from permuto_sdf_tpu.train.train_permuto_sdf import _device_resident

    cfg = SDFConfig(in_channels=4, geom_feat_size_out=0, nr_iters_for_c2f=3000)
    params = _device_resident(ckpt.load_model(args.ckpt, "sdf_model"))
    os.makedirs(args.out_dir, exist_ok=True)
    if args.render_sweep:
        from permuto_sdf_tpu.train.train_4d_sdf import render_time_sweep

        render_time_sweep(params, cfg, args.out_dir, nr_times=args.nr_times,
                          width=args.width, height=args.height)
    for i in range(args.nr_times):
        t = i / max(args.nr_times - 1, 1)
        V, F = extract_mesh_at_time(params, cfg, t, nr_points_per_dim=args.res)
        save_obj(os.path.join(args.out_dir, f"time_{i:03d}.obj"), Mesh(V, F))
    print(f"wrote {args.nr_times} time-slice meshes -> {args.out_dir}")


def main():
    parser = argparse.ArgumentParser(description="Visualization tools")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("orbit")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--nr_frames", type=int, default=60)
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--height", type=int, default=400)
    p.add_argument("--orbit_radius", type=float, default=1.2)
    p.add_argument("--orbit_height", type=float, default=0.3)
    p.add_argument("--sphere_traced", action="store_true")
    p.add_argument("--with_normals", action="store_true")
    p.set_defaults(fn=cmd_orbit)

    p = sub.add_parser("isolines")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--layer_y", type=float, default=0.0)
    p.add_argument("--res", type=int, default=512)
    p.set_defaults(fn=cmd_isolines)

    p = sub.add_parser("vis4d")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--nr_times", type=int, default=10)
    p.add_argument("--res", type=int, default=96)
    p.add_argument("--render_sweep", action="store_true",
                   help="also render sphere-traced normal-shaded PNGs of "
                        "the time sweep (vis_4d_sdf equivalent)")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.set_defaults(fn=cmd_vis4d)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
