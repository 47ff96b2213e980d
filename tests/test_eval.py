"""Tests for the evaluation stack: DTUeval-protocol Chamfer, NeuS mask
mesh-cleaning, PSNR/SSIM/LPIPS."""

import numpy as np
import pytest

from permuto_sdf_tpu.eval.chamfer import (
    dtueval_sample_mesh, radius_downsample, dtu_chamfer, point_mesh_chamfer,
)
from permuto_sdf_tpu.eval.mesh_cleaning import (
    clean_points_by_mask, clean_mesh, largest_connected_component, dilate_mask,
)
from permuto_sdf_tpu.datasets.mesh_io import make_uv_sphere


def _sphere(radius=10.0):
    m = make_uv_sphere(radius=radius, n_lat=24, n_lon=32)
    return np.asarray(m.V, np.float64), np.asarray(m.F, np.int64)


def test_dtueval_sample_mesh_density_and_planarity():
    V, F = _sphere()
    pts = dtueval_sample_mesh(V, F, density=0.5)
    assert len(pts) > len(V) * 3  # grids added beyond vertices
    # all samples lie on the sphere's surface (triangles are chords, so
    # radius is slightly inside — within the largest triangle's sagitta)
    r = np.linalg.norm(pts, axis=-1)
    assert (r <= 10.0 + 1e-6).all() and (r > 9.0).all()


def test_radius_downsample_min_separation():
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(5000, 3))
    down = radius_downsample(pts, radius=0.1)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(down).query(down, k=2)
    assert (d[:, 1] >= 0.1 - 1e-12).all(), "kept points closer than radius"
    # and every original point is within radius of some kept point
    d1, _ = cKDTree(down).query(pts, k=1)
    assert (d1 <= 0.1 + 1e-12).all()


def test_dtu_chamfer_zero_for_identical_and_scales_with_offset():
    V, F = _sphere()
    gt_pts = dtueval_sample_mesh(V, F, density=0.3)
    overall, d2s, s2d = dtu_chamfer(V, F, gt_pts, downsample_density=0.3,
                                    max_dist=20.0)
    assert overall < 0.15  # sampling-resolution floor

    overall2, _, _ = dtu_chamfer(V + np.asarray([0.5, 0, 0]), F, gt_pts,
                                 downsample_density=0.3, max_dist=20.0)
    assert 0.2 < overall2 < 0.6  # ~offset-dominated


def test_dtu_chamfer_discards_far_outliers():
    """max_dist semantics: distances >= max_dist are DISCARDED from the
    mean (DTUeval eval.py:121), not clamped."""
    V, F = _sphere()
    gt_pts = dtueval_sample_mesh(V, F, density=0.3)
    # an outlier blob far away on the pred side
    V_out = np.concatenate([V, V * 0.05 + 100.0], axis=0)
    F_out = np.concatenate([F, F + len(V)], axis=0)
    overall, d2s, s2d = dtu_chamfer(V_out, F_out, gt_pts,
                                    downsample_density=0.3, max_dist=20.0)
    assert overall < 0.15, "outliers beyond max_dist must not affect the mean"


def test_clean_points_by_mask_culls_outside_view():
    # one synthetic camera looking down -z at the origin
    K = np.asarray([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    Rt = np.eye(4)[:3]  # identity pose: camera at origin looking +z
    P = K @ Rt
    mask = np.zeros((100, 100), bool)
    mask[40:60, 40:60] = True  # center square
    pts = np.asarray([
        [0.0, 0.0, 2.0],     # projects to (50, 50) — inside the mask
        [0.3, 0.0, 2.0],     # projects to (65, 50) — in frame, outside mask
    ])
    keep = clean_points_by_mask(pts, P[None], mask[None],
                                already_dilated=True)
    assert keep.tolist() == [True, False]
    # with dilation a point just outside the mask survives
    pts2 = np.asarray([[0.25, 0.0, 2.0]])  # projects to (62.5, 50)
    keep2 = clean_points_by_mask(pts2, P[None], mask[None],
                                 already_dilated=True)
    keep3 = clean_points_by_mask(pts2, P[None], mask[None],
                                 dilate_kernel=31)
    assert keep2.tolist() == [False] and keep3.tolist() == [True]


def test_largest_connected_component():
    V1, F1 = _sphere(radius=1.0)
    V2 = V1 * 0.1 + 5.0  # much smaller disjoint copy
    V = np.concatenate([V1, V2])
    F = np.concatenate([F1, F1 + len(V1)])
    Vc, Fc = largest_connected_component(V, F)
    assert len(Vc) == len(V1) and len(Fc) == len(F1)
    assert np.linalg.norm(Vc, axis=-1).max() < 2.0  # kept the big one


def test_clean_mesh_end_to_end():
    V, F = _sphere(radius=1.0)
    K = np.asarray([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    tf = np.eye(4)
    tf[2, 3] = 5.0  # camera at origin, sphere pushed to z=5
    V_pushed = V + np.asarray([0.0, 0.0, 5.0])
    P = K @ np.eye(4)[:3]
    mask = np.ones((100, 100), bool)  # everything visible
    Vc, Fc = clean_mesh(V_pushed, F, P[None], mask[None], dilate_kernel=3)
    assert len(Vc) == len(V)  # nothing culled

    mask_half = np.zeros((100, 100), bool)
    mask_half[:, :50] = True  # only x<0 side visible
    Vc2, Fc2 = clean_mesh(V_pushed, F, P[None], mask_half[None],
                          dilate_kernel=3)
    assert 0 < len(Vc2) < len(V)
    assert np.isfinite(Vc2).all() and (Fc2 < len(Vc2)).all() and (Fc2 >= 0).all()


def test_lpips_orders_pairs():
    from permuto_sdf_tpu.eval.metrics import lpips, _lpips_params

    rng = np.random.default_rng(0)
    a = rng.uniform(size=(48, 48, 3)).astype(np.float32)
    noisy = np.clip(a + rng.normal(scale=0.05, size=a.shape), 0, 1).astype(np.float32)
    shuffled = np.roll(a, 16, axis=0)
    p = _lpips_params()
    d_self = float(lpips(a, a, params=p))
    d_noisy = float(lpips(a, noisy, params=p))
    d_far = float(lpips(a, shuffled, params=p))
    assert d_self < 1e-6 < d_noisy < d_far


def test_ms_ssim_properties():
    """MS-SSIM (standard 5-scale Wang et al. 2003): 1 on identical images,
    monotonically degrading with noise amplitude, and less punishing than
    single-scale SSIM for a small global shift (its multi-scale pooling is
    exactly what makes it a better perceptual proxy)."""
    import numpy as np
    from permuto_sdf_tpu.eval.metrics import ms_ssim, ssim

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(192, 192, 3)).astype(np.float32)
    # smooth it so structure exists at all scales
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(img, sigma=(6, 6, 0)).astype(np.float32)
    img = (img - img.min()) / (img.max() - img.min())

    assert abs(float(ms_ssim(img, img)) - 1.0) < 1e-6

    vals = []
    for amp in (0.02, 0.05, 0.1, 0.2):
        noisy = np.clip(img + rng.normal(0, amp, img.shape), 0, 1).astype(np.float32)
        vals.append(float(ms_ssim(img, noisy)))
    assert all(a > b for a, b in zip(vals, vals[1:])), vals
    assert vals[0] > 0.9 and vals[-1] < vals[0]

    shifted = np.roll(img, 2, axis=1)
    assert float(ms_ssim(img, shifted)) > float(ssim(img, shifted))
