"""Overview-figure composer.

Headless equivalent of the reference's paper-figure script
(``/root/reference/permuto_sdf_py/experiments/figures/create_overview_image.py``),
which drives the EasyPBR viewer through hand-placed cameras to produce the
overview image (volumetric render, normals, mesh views). Here the same
artifact is produced offline: for a trained checkpoint, a grid of views x
modes (volumetric rgb | shaded normals | sphere-traced rgb) is rendered
and tiled into one PNG, plus a JSON sidecar describing the layout (the
reference hard-codes its camera poses at the top of the script; ours come
from an orbit or from explicit ``--angles``).

Usage:
  python -m permuto_sdf_tpu.experiments.figures \
      --ckpt <ckpt>/<exp>/<iter>/models --out overview.png \
      --nr_views 4 --width 400 --height 400
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


MODES = ("rgb", "normals", "sphere_traced")


def render_overview(params, grid, cfg, nr_views: int = 4, width: int = 400,
                    height: int = 400, orbit_radius: float = 1.3,
                    orbit_height: float = 0.45, angles=None,
                    modes=MODES, gutter: int = 4):
    """Returns (figure [H', W', 3] float, layout dict)."""
    from permuto_sdf_tpu.train import train_permuto_sdf as tps
    from permuto_sdf_tpu.experiments.visualization import _orbit_cam

    f = 0.5 * width / np.tan(np.radians(35.0) / 2)
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32)
    if angles is None:
        angles = [2 * np.pi * i / nr_views for i in range(nr_views)]

    rows = []
    for angle in angles:
        tf = _orbit_cam(orbit_radius, orbit_height, float(angle))
        cells = {}
        if "rgb" in modes or "normals" in modes:
            rgb, nrm, _ = tps.render_image(params, grid, K, tf, width, height,
                                           9_999_999, cfg)
            cells["rgb"] = np.clip(rgb, 0, 1)
            cells["normals"] = np.clip(nrm * 0.5 + 0.5, 0, 1)
        if "sphere_traced" in modes:
            rgb_st, _, _ = tps.render_image_sphere_traced_fast(
                params, grid, K, tf, width, height, 9_999_999, cfg)
            cells["sphere_traced"] = np.clip(rgb_st, 0, 1)
        rows.append([cells[m] for m in modes if m in cells])

    nr, nc = len(rows), len(rows[0])
    fig = np.ones((nr * height + (nr - 1) * gutter,
                   nc * width + (nc - 1) * gutter, 3), np.float32)
    for i, row in enumerate(rows):
        for j, cell in enumerate(row):
            y, x = i * (height + gutter), j * (width + gutter)
            fig[y:y + height, x:x + width] = cell
    layout = {
        "rows": [f"orbit angle {a:.3f} rad" for a in angles],
        "cols": [m for m in modes],
        "cell": [height, width], "gutter": gutter,
    }
    return fig, layout


def main(argv=None):
    parser = argparse.ArgumentParser(description="Compose an overview figure")
    parser.add_argument("--ckpt", required=True,
                        help="<ckpt>/<exp>/<iter>/models directory")
    parser.add_argument("--out", default="overview.png")
    parser.add_argument("--nr_views", type=int, default=4)
    parser.add_argument("--width", type=int, default=400)
    parser.add_argument("--height", type=int, default=400)
    parser.add_argument("--orbit_radius", type=float, default=1.3)
    parser.add_argument("--orbit_height", type=float, default=0.45)
    parser.add_argument("--angles", type=float, nargs="*", default=None,
                        help="explicit orbit angles (rad); overrides nr_views")
    parser.add_argument("--modes", nargs="*", default=list(MODES),
                        choices=MODES)
    args = parser.parse_args(argv)

    from permuto_sdf_tpu.train import train_permuto_sdf as tps

    cfg = tps.PermutoSDFTrainConfig()
    params, grid = tps.load_from_checkpoint(args.ckpt, cfg)
    fig, layout = render_overview(
        params, grid, cfg, nr_views=args.nr_views, width=args.width,
        height=args.height, orbit_radius=args.orbit_radius,
        orbit_height=args.orbit_height, angles=args.angles,
        modes=tuple(args.modes),
    )
    import imageio.v2 as imageio

    imageio.imwrite(args.out, (fig * 255).astype(np.uint8))
    with open(os.path.splitext(args.out)[0] + "_layout.json", "w") as f:
        json.dump(layout, f, indent=1)
    print(f"wrote {args.out} ({fig.shape[1]}x{fig.shape[0]})")


if __name__ == "__main__":
    main()
