"""Tests for the TensorReel ray generators.

Covers the TPU-native equivalents of the reference's reel kernels:
``random_rays_from_reel`` (src/PermutoSDF.cu:67-112) and
``rays_from_reprojection_reel`` (src/PermutoSDF.cu:114-163).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from permuto_sdf_tpu.datasets.tensor_reel import (
    TensorReel,
    random_rays_from_reel,
    rays_from_reprojection_reel,
    rays_from_frame,
    look_at_cam_to_world,
)


def _toy_reel(n=3, h=12, w=16, with_mask=True, seed=0):
    rng = np.random.default_rng(seed)
    rgb = jnp.asarray(rng.uniform(size=(n, h, w, 3)).astype(np.float32))
    mask = (
        jnp.asarray((rng.uniform(size=(n, h, w, 1)) > 0.5).astype(np.float32))
        if with_mask else None
    )
    K = jnp.tile(
        jnp.asarray([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]]), (n, 1, 1)
    )
    tfs = [look_at_cam_to_world(eye) for eye in
           [(0, 0, -2.0), (1.5, 0.5, -1.5), (-1.0, 1.0, -1.8)][:n]]
    tf = jnp.stack([jnp.asarray(t) for t in tfs])
    return TensorReel(rgb=rgb, mask=mask, K=K, tf_world_cam=tf)


def test_random_rays_gt_pixels_match_reel():
    reel = _toy_reel()
    o, d, gt_rgb, gt_mask, img_idx = random_rays_from_reel(
        reel, jax.random.PRNGKey(0), 64
    )
    assert o.shape == (64, 3) and d.shape == (64, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=-1), 1.0, rtol=1e-5
    )
    # origins are the camera centers of the sampled images
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(reel.tf_world_cam[img_idx][:, :3, 3]), rtol=1e-6
    )
    # gt rgb is masked rgb from the reel (spot check: values must appear in
    # the corresponding image once divided by the mask)
    gt = np.asarray(gt_rgb)
    m = np.asarray(gt_mask)
    assert ((gt == 0) | (m > 0)).all()


def test_reprojection_rays_point_at_visible_points():
    reel = _toy_reel(with_mask=False)
    # points near the origin are visible from every toy camera
    pts = jnp.asarray(
        np.random.default_rng(1).uniform(-0.1, 0.1, size=(32, 3)).astype(np.float32)
    )
    o, d, gt_rgb, gt_mask, img_idx = rays_from_reprojection_reel(
        reel, jax.random.PRNGKey(2), pts
    )
    assert o.shape == (32, 3) and gt_mask.shape == (32, 1)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=-1), 1.0, rtol=1e-5
    )
    # each ray must pass close to its target point (within one pixel's
    # footprint at the point's depth: tan(1/fx) * depth ~ 0.1)
    to_pt = np.asarray(pts) - np.asarray(o)
    depth = np.linalg.norm(to_pt, axis=-1)
    cos = np.sum(to_pt * np.asarray(d), axis=-1) / depth
    miss = depth * np.sqrt(np.maximum(0.0, 1.0 - cos ** 2))
    assert (miss < 0.15).all(), miss.max()


def test_reprojection_out_of_bounds_falls_back_to_random_pixel():
    reel = _toy_reel(with_mask=True)
    # points far behind every camera always reproject out of bounds
    pts = jnp.tile(jnp.asarray([[0.0, 50.0, 0.0]]), (16, 1))
    o, d, gt_rgb, gt_mask, img_idx = rays_from_reprojection_reel(
        reel, jax.random.PRNGKey(3), pts
    )
    assert np.isfinite(np.asarray(d)).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=-1), 1.0, rtol=1e-5
    )
    # gt values still come from inside the image (mask in {0,1})
    assert set(np.unique(np.asarray(gt_mask))) <= {0.0, 1.0}


def test_rays_from_frame_row_major_and_consistent_with_reel_sampler():
    reel = _toy_reel(n=1, with_mask=False)
    h, w = reel.height, reel.width
    o, d = rays_from_frame(reel.K[0], reel.tf_world_cam[0], w, h)
    assert o.shape == (h * w, 3)
    # the reel sampler and the frame generator must agree pixel-for-pixel
    _, d_reel, _, _, _ = random_rays_from_reel(reel, jax.random.PRNGKey(4), 128)
    # (can't control which pixels the sampler picked; instead check that a
    # central pixel's dir from rays_from_frame points toward the scene)
    center = np.asarray(d[(h // 2) * w + w // 2])
    fwd = np.asarray(reel.tf_world_cam[0][:3, 2])
    assert float(center @ fwd) > 0.9


def test_multiface_loader_parses_krt_and_builds_reel(tmp_path):
    """Synthetic multiface layout: KRT with 3 cameras + per-camera images;
    the loader must split train/test by the preset's test cameras and map
    world->cam extrinsics into scene-scaled cam-to-world poses."""
    import os
    import numpy as np
    import imageio.v2 as imageio
    from permuto_sdf_tpu.datasets.multiface import (
        load_multiface_scene, MultifaceSubject, parse_krt,
    )

    subj = MultifaceSubject(
        subject_name="m--test--0--1--GHS", sequence="E001_Test",
        test_cameras=(400002,), timestep=0,
        scene_rotate_x_angle=0.0, scene_translation=(0.0, 0.0, 0.0),
        scene_scale_multiplier=0.001,
    )
    root = tmp_path / "mf"
    sdir = root / subj.subject_name
    cams = ["400002", "400013", "400060"]
    lines = []
    rng = np.random.default_rng(0)
    for i, cam in enumerate(cams):
        K = np.asarray([[1000.0, 0, 32], [0, 1000.0, 32], [0, 0, 1]])
        Rt = np.concatenate([np.eye(3), np.asarray([[0.0], [0.0], [1000.0 * (i + 1)]])], 1)
        lines.append(cam)
        lines += [" ".join(str(v) for v in row) for row in K]
        lines.append("0 0 0 0 0")
        lines += [" ".join(str(v) for v in row) for row in Rt]
        lines.append("")
        d = sdir / "images" / subj.sequence / cam
        os.makedirs(d)
        imageio.imwrite(str(d / "000000.png"),
                        (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8))
    os.makedirs(sdir, exist_ok=True)
    (sdir / "KRT").write_text("\n".join(lines))

    krt = parse_krt(str(sdir / "KRT"))
    assert set(krt) == set(cams)

    reel_train = load_multiface_scene(str(root), subj, mode="train")
    reel_test = load_multiface_scene(str(root), subj, mode="test")
    assert reel_train.nr_images == 2 and reel_test.nr_images == 1
    assert reel_train.rgb.shape == (2, 64, 64, 3)
    # identity R, t=(0,0,1000mm) world->cam => camera center (0,0,-1000mm)
    # => scaled cam-to-world translation (0,0,-1.0)
    tf = np.asarray(reel_test.tf_world_cam[0])
    np.testing.assert_allclose(tf[:3, 3], [0, 0, -1.0], atol=1e-6)
    np.testing.assert_allclose(tf[:3, :3], np.eye(3), atol=1e-6)


def test_dataset_factory_dispatch():
    from permuto_sdf_tpu.datasets.factory import create_reel

    reel = create_reel("synthetic", low_res=True)
    assert reel.nr_images == 24
    import pytest

    with pytest.raises(ValueError):
        create_reel("nope")


def test_crop_reel_to_sphere_preserves_rays():
    """get_frames_cropped equivalent (permuto_sdf_utils.py:99-179): frames
    crop to equal sizes around the projected bound sphere, and a cropped
    pixel's ray equals the same pixel's ray in the original frame."""
    import numpy as np
    from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel
    from permuto_sdf_tpu.datasets.tensor_reel import (
        crop_reel_to_sphere, rays_from_frame)

    reel = make_synthetic_reel(nr_views=3, width=64, height=48)
    cropped = crop_reel_to_sphere(reel, radius=0.5)
    N, Hc, Wc = cropped.rgb.shape[:3]
    assert N == 3 and Hc <= 48 and Wc <= 64
    assert cropped.mask.shape[:3] == (N, Hc, Wc)

    # ray consistency: pixel (u, v) of the cropped frame == pixel
    # (u + sx, v + sy) of the original; recover (sx, sy) from the K shift
    i = 1
    sx = int(round(float(reel.K[i][0, 2] - cropped.K[i][0, 2])))
    sy = int(round(float(reel.K[i][1, 2] - cropped.K[i][1, 2])))
    o_c, d_c = rays_from_frame(cropped.K[i], cropped.tf_world_cam[i], Wc, Hc)
    o_f, d_f = rays_from_frame(reel.K[i], reel.tf_world_cam[i], 64, 48)
    d_c = np.asarray(d_c).reshape(Hc, Wc, 3)
    d_f = np.asarray(d_f).reshape(48, 64, 3)
    np.testing.assert_allclose(d_c, d_f[sy:sy + Hc, sx:sx + Wc], atol=1e-5)
    # cropped pixels match the source image region
    np.testing.assert_allclose(
        np.asarray(cropped.rgb[i]),
        np.asarray(reel.rgb[i])[sy:sy + Hc, sx:sx + Wc], atol=1e-7)


def test_textured_background_is_parallax_bearing():
    """bg_mode="textured" puts a finite-radius procedural sky sphere behind
    the scene: background pixels must be non-constant within a view AND
    differ between views (parallax) — the signal the NeRF++ background
    model trains on (VERDICT r2 item 4)."""
    from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

    reel = make_synthetic_reel(nr_views=2, width=32, height=32,
                               bg_mode="textured")
    rgb = np.asarray(reel.rgb)
    mask = np.asarray(reel.mask)[..., 0].astype(bool)
    bg0, bg1 = rgb[0][~mask[0]], rgb[1][~mask[1]]
    assert bg0.std() > 0.05 and bg1.std() > 0.05  # textured, not constant
    # different views see different background statistics (parallax)
    assert np.abs(bg0.mean(axis=0) - bg1.mean(axis=0)).max() > 0.01
    # default mode stays the constant color (backward compatibility)
    reel_c = make_synthetic_reel(nr_views=1, width=32, height=32)
    bgc = np.asarray(reel_c.rgb[0])[~np.asarray(reel_c.mask[0])[..., 0].astype(bool)]
    assert bgc.std(axis=0).max() < 1e-5


def test_dtu_export_load_roundtrip(tmp_path):
    """Synthetic reel -> DTU on-disk layout (image/ mask/ cameras.npz with
    a NON-identity scale_mat) -> load_dtu_scene reproduces the reel: the
    real-data chain's loader math (world_mat @ scale_mat decomposition,
    scene_scale_multiplier shrink, 8-bit image IO, mask thresholding) is
    exercised end-to-end without DTU bytes (VERDICT r2 item 7). Reference
    chain: create_my_meshes.py:61-86 frame conventions."""
    from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel
    from permuto_sdf_tpu.datasets.dtu import export_dtu_scene, load_dtu_scene

    reel = make_synthetic_reel(nr_views=3, width=40, height=32)
    scene = export_dtu_scene(reel, str(tmp_path / "scan_fake"),
                             scene_scale_multiplier=0.4)
    loaded = load_dtu_scene(scene, scene_scale_multiplier=0.4)

    assert loaded.nr_images == reel.nr_images
    np.testing.assert_allclose(np.asarray(loaded.K), np.asarray(reel.K),
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(loaded.tf_world_cam),
                               np.asarray(reel.tf_world_cam),
                               rtol=0, atol=1e-4)
    # images to 8-bit quantization; masks exactly
    assert np.abs(np.asarray(loaded.rgb) - np.asarray(reel.rgb)).max() < 1 / 254
    np.testing.assert_array_equal(np.asarray(loaded.mask),
                                  np.asarray(reel.mask))
    # subsampled (low_res) load halves the sizes and the intrinsics
    half = load_dtu_scene(scene, scene_scale_multiplier=0.4, low_res=True)
    assert half.width == reel.width // 2 and half.height == reel.height // 2
    np.testing.assert_allclose(np.asarray(half.K)[:, :2] * 2,
                               np.asarray(loaded.K)[:, :2], atol=4e-3)


def test_dtu_format_train_eval_chain(tmp_path):
    """Full real-data chain on DTU-format files: export -> load_dtu_scene
    -> train (smoke scale) -> eval CLI create_mesh (--config/--set) ->
    mask mesh-cleaning -> chamfer, all through the public entry points."""
    import json
    import sys

    from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel
    from permuto_sdf_tpu.datasets.dtu import export_dtu_scene, load_dtu_scene
    from permuto_sdf_tpu.train import train_permuto_sdf as t
    from permuto_sdf_tpu.experiments import evaluation as ev

    reel_src = make_synthetic_reel(nr_views=3, width=24, height=24)
    scene = export_dtu_scene(reel_src, str(tmp_path / "scan_fake"))
    reel = load_dtu_scene(scene)

    # the sphere fit needs ~300 iters to carve a real zero-level set (the
    # 20-iter variant used by pure-smoke tests leaves the SDF all-positive
    # and marching cubes finds nothing)
    smoke = dict(
        capacity=2 ** 10, nr_levels=4, nr_rays=32, nr_iter_sphere_fit=300,
        sphere_init_points=1024, grid_nr_voxels_per_dim=16,
        grid_nr_random_samples=512, max_nr_samples_per_ray=8,
        nr_samples_imp_sampling=4, nr_samples_bg=4, warmup_iters=20,
        sdf_nr_iters_for_c2f=50, forced_variance_finish_iter=100,
    )
    cfg = t.PermutoSDFTrainConfig(**smoke)
    params, grid, _ = t.train(reel, cfg, nr_iters=400, log_every=200)
    ckpt_root = tmp_path / "ckpt"
    t._save(str(ckpt_root), "exp", 400, params, grid)
    ckpt = ckpt_root / "exp" / "400" / "models"

    # eval CLI: mesh from the checkpoint with the smoke config via --set
    mesh_path = tmp_path / "pred.obj"
    argv = ["evaluation.py", "create_mesh", "--ckpt", str(ckpt),
            "--res", "33", "--out", str(mesh_path)]
    for k, v in smoke.items():
        argv += ["--set", f"{k}={v}"]
    old = sys.argv
    try:
        sys.argv = argv
        ev.main()

        # mask-cleaning inputs from the DTU scene's own cameras
        Ks = np.asarray(reel.K)
        tfs = np.asarray(reel.tf_world_cam)
        wm = np.stack([
            (np.block([[Ks[i], np.zeros((3, 1))], [np.zeros((1, 3)), 1.0]])
             @ np.linalg.inv(tfs[i]))[:3]
            for i in range(reel.nr_images)
        ])
        masks_npz = tmp_path / "clean_masks.npz"
        np.savez(masks_npz, masks=np.asarray(reel.mask)[..., 0] > 0.5,
                 world_mats=wm)

        gt_path = tmp_path / "gt.obj"
        from permuto_sdf_tpu.ops.marching_cubes import extract_mesh_from_sdf_fn
        from permuto_sdf_tpu.datasets.mesh_io import Mesh, save_obj
        from permuto_sdf_tpu.datasets.synthetic import scene_sdf

        Vg, Fg = extract_mesh_from_sdf_fn(scene_sdf, 49, -0.5, 0.5)
        save_obj(str(gt_path), Mesh(Vg, Fg))

        sys.argv = ["evaluation.py", "chamfer",
                    "--pred_mesh", str(mesh_path), "--gt_mesh", str(gt_path),
                    "--clean_masks_npz", str(masks_npz),
                    "--dilate_kernel", "5", "--max_dist", "1.0"]
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            ev.main()
    finally:
        sys.argv = old
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    # 60 smoke iters on 24^2 views: the mesh is crude — the assertion is
    # that the full chain runs and produces a finite, sane distance
    assert np.isfinite(out["chamfer"]) and out["chamfer"] < 0.5


def test_quantized_reel_matches_float_reel():
    """quantize_reel stores pixels as uint8 (4x less HBM/transport for
    DP-replicated DTU-scale reels); dequant happens AFTER the per-ray
    gather, so ray sampling must agree with the float reel to 8-bit
    precision — and exactly when the float reel itself came from 8-bit
    sources."""
    import jax
    from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel
    from permuto_sdf_tpu.datasets.tensor_reel import (
        quantize_reel, random_rays_from_reel)

    reel = make_synthetic_reel(nr_views=3, width=32, height=32)
    qreel = quantize_reel(reel)
    assert np.asarray(qreel.rgb).dtype == np.uint8
    assert np.asarray(qreel.mask).dtype == np.uint8

    key = jax.random.PRNGKey(3)
    o_f, d_f, rgb_f, m_f, i_f = random_rays_from_reel(reel, key, 256)
    o_q, d_q, rgb_q, m_q, i_q = random_rays_from_reel(qreel, key, 256)
    np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_q))
    np.testing.assert_array_equal(np.asarray(o_f), np.asarray(o_q))
    np.testing.assert_array_equal(np.asarray(d_f), np.asarray(d_q))
    assert np.abs(np.asarray(rgb_f) - np.asarray(rgb_q)).max() <= 1 / 254
    assert np.abs(np.asarray(m_f) - np.asarray(m_q)).max() <= 1 / 254
    assert np.asarray(rgb_q).dtype == np.float32  # dequanted output


def test_train_accepts_quantized_reel():
    """The full train() path (incl. mask BCE) runs on a uint8-storage reel
    without dtype surprises and losses stay finite."""
    from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel
    from permuto_sdf_tpu.datasets.tensor_reel import quantize_reel
    from permuto_sdf_tpu.train import train_permuto_sdf as t

    reel = quantize_reel(make_synthetic_reel(nr_views=2, width=24, height=24))
    cfg = t.PermutoSDFTrainConfig(
        capacity=2 ** 10, nr_levels=4, nr_rays=32, nr_iter_sphere_fit=10,
        sphere_init_points=256, grid_nr_voxels_per_dim=16,
        grid_nr_random_samples=256, max_nr_samples_per_ray=8,
        nr_samples_imp_sampling=4, nr_samples_bg=4, warmup_iters=10,
        with_mask=True,
    )
    params, grid, hist = t.train(reel, cfg, nr_iters=25, log_every=10)
    assert np.isfinite(hist[-1][1])


def test_no_mask_training_sees_unmasked_background_targets():
    """REGRESSION (r3): random_rays_from_reel multiplied gt_rgb by the
    object mask whenever the reel carried one — in no-mask mode that
    zeroes the background supervision and the NeRF++ background field
    trains to black (the r2/r3 full-image-PSNR collapse). The reference
    only loads masks in with_mask mode (create_dataloader(..., with_mask),
    PermutoSDFGPU.cuh:102-122 multiplies unconditionally); our reels
    always carry masks, so the multiply must gate on apply_mask."""
    import jax
    from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel
    from permuto_sdf_tpu.datasets.tensor_reel import random_rays_from_reel

    reel = make_synthetic_reel(nr_views=2, width=32, height=32,
                               bg_mode="textured")
    key = jax.random.PRNGKey(0)
    _, _, rgb_nomask, m, _ = random_rays_from_reel(reel, key, 512,
                                                   apply_mask=False)
    _, _, rgb_masked, _, _ = random_rays_from_reel(reel, key, 512,
                                                   apply_mask=True)
    bg = np.asarray(m)[:, 0] < 0.5
    assert bg.any()
    # masked mode zeroes background targets; unmasked mode must not
    assert float(np.abs(np.asarray(rgb_masked)[bg]).max()) == 0.0
    assert float(np.asarray(rgb_nomask)[bg].min()) > 0.1  # textured sky

    # and the no-mask trainer consumes the UNMASKED targets
    from permuto_sdf_tpu.train import train_permuto_sdf as t
    cfg = t.PermutoSDFTrainConfig(
        capacity=2 ** 10, nr_levels=4, nr_rays=64, nr_iter_sphere_fit=5,
        sphere_init_points=256, grid_nr_voxels_per_dim=16,
        grid_nr_random_samples=256, max_nr_samples_per_ray=8,
        nr_samples_imp_sampling=4, nr_samples_bg=4, with_mask=False)
    params = t.init_params(jax.random.PRNGKey(1), cfg, reel.nr_images)
    grid = None
    cfg2 = t.PermutoSDFTrainConfig(**{**cfg.__dict__, "use_occupancy_grid": False})
    _, aux, _ = t.compute_loss_and_grads(params, grid, reel,
                                         jax.random.PRNGKey(2),
                                         jnp.asarray(100), cfg2)
    # an untrained model on a bright textured bg cannot have near-zero rgb
    # loss unless the targets were zeroed
    assert float(aux["loss_rgb"]) > 0.05


@pytest.mark.quick
def test_bench_scene_occupancy_and_rendering():
    """bench_scene_sdf (PERFORMANCE.md finding 32): everything inside the
    r=0.5 training bound with clearance, band occupancy in the DTU-like
    range (the reason the scene exists), and the GT renderer produces a
    well-covered mask (the conservative Lipschitz-scaled field must still
    sphere-trace correctly)."""
    import numpy as np
    from permuto_sdf_tpu.datasets.synthetic import (bench_scene_sdf,
                                                    make_synthetic_reel)

    # bound clearance on a shell just inside the training sphere
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(8192, 3)).astype(np.float32)
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True) * 0.49
    assert float(jnp.min(bench_scene_sdf(jnp.asarray(pts)))) > 0.0

    # band occupancy at 128^3: several times busier than the toy scene
    # (whose emptiness starved the bench's samples normalization) while
    # still a sparse surface band, not a filled volume
    from permuto_sdf_tpu.datasets.synthetic import scene_sdf
    ax = np.linspace(-0.5, 0.5, 128, dtype=np.float32)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    sdf = np.asarray(jax.jit(bench_scene_sdf)(jnp.asarray(g)))
    sdf_toy = np.asarray(jax.jit(scene_sdf)(jnp.asarray(g)))
    band = 1.0 / 128
    frac = float(np.mean(np.abs(sdf) < band))
    frac_toy = float(np.mean(np.abs(sdf_toy) < band))
    assert frac > 4.0 * frac_toy, (frac, frac_toy)
    assert frac < 0.12, frac

    reel = make_synthetic_reel(nr_views=2, width=64, height=64,
                               sdf_fn=bench_scene_sdf, fov_deg=45.0)
    m = np.asarray(reel.mask)
    cov = m.reshape(2, -1).mean(axis=1)
    assert (cov > 0.25).all() and (cov < 0.7).all(), cov
    assert np.isfinite(np.asarray(reel.rgb)).all()
