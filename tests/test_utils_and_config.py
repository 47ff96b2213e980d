"""Tests for config system, misc utils, legacy modules, schedules."""

import dataclasses
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from permuto_sdf_tpu.config import load_config, load_config_dict, apply_overrides
from permuto_sdf_tpu.utils import misc
from permuto_sdf_tpu.models import legacy_modules as legacy
from permuto_sdf_tpu.train import schedules


def test_config_hjson_and_overrides():
    from permuto_sdf_tpu.train.train_nerf import NerfTrainConfig

    text = """
    {
        // hjson-style comment
        lr: 2e-4,
        nr_rays: 128,  /* block comment */
        with_mask: true,
    }
    """
    p = tempfile.mktemp(suffix=".cfg")
    with open(p, "w") as f:
        f.write(text)
    cfg = load_config(NerfTrainConfig, p, cli_overrides=["nr_samples_bg=16"])
    assert cfg.lr == 2e-4 and cfg.nr_rays == 128 and cfg.with_mask
    assert cfg.nr_samples_bg == 16
    try:
        apply_overrides(cfg, {"not_a_knob": 1})
        assert False
    except KeyError as e:
        assert "not_a_knob" in str(e)


def test_misc_layout_converters():
    x = jnp.arange(2 * 3 * 4.0).reshape(-1, 4)  # [6, 4] lin
    img = misc.lin2hwc(x, 2, 3)
    assert img.shape == (2, 3, 4)
    np.testing.assert_array_equal(np.asarray(misc.hwc2lin(img)), np.asarray(x))
    nchw = misc.lin2nchw(x, 2, 3)
    assert nchw.shape == (1, 4, 2, 3)
    np.testing.assert_array_equal(np.asarray(misc.nchw2lin(nchw)), np.asarray(x))


def test_srgb_roundtrip():
    x = jnp.linspace(0.001, 0.999, 64)
    rt = misc.srgb_to_linear(misc.linear_to_srgb(x))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x), atol=1e-5)


def test_update_errors_of_matching_indices():
    old_idx = jnp.asarray([5, 9, 2, 7])
    old_err = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    new_idx = jnp.asarray([9, 7, 100])
    new_err = jnp.asarray([20.0, 40.0, 99.0])
    out = misc.update_errors_of_matching_indices(old_idx, old_err, new_idx, new_err)
    np.testing.assert_allclose(np.asarray(out), [1.0, 20.0, 3.0, 40.0])


def test_low_discrepancy_sampling_is_stratified():
    pts = np.asarray(misc.low_discrepancy2d_sampling(jax.random.PRNGKey(0), 256, 16))
    assert pts.shape == (256, 2) and (pts >= 0).all() and (pts <= 1).all()
    # exactly one point per 16x16 cell
    cells = (pts * 16).astype(int)
    _, counts = np.unique(cells[:, 0] * 16 + cells[:, 1], return_counts=True)
    assert (counts == 1).all() and len(counts) == 256


def test_summary_and_check_finite():
    import io

    params = {"a": jnp.ones((3, 4)), "b": {"c": jnp.zeros(5)}}
    buf = io.StringIO()
    total = misc.summary(params, "m", file=buf)
    assert total == 17
    misc.check_finite(params)
    bad = {"x": jnp.asarray([jnp.nan])}
    try:
        misc.check_finite(bad)
        assert False
    except FloatingPointError:
        pass


def test_pixel_pickers():
    key = jax.random.PRNGKey(0)
    idx = legacy.rand_pixel_picker(key, 100, 32, 24)
    assert idx.shape == (100,) and int(idx.max()) < 32 * 24
    patch = np.asarray(legacy.patch_pixel_picker(key, 4, 32, 24))
    assert patch.shape == (16,)
    ys, xs = patch // 32, patch % 32
    assert ys.max() - ys.min() == 3 and xs.max() - xs.min() == 3
    err = jnp.zeros((24 * 32,)).at[100].set(1.0)
    picked = legacy.error_pixel_picker(key, 50, err)
    assert (np.asarray(picked) == 100).all()


def test_positional_encoding():
    p = legacy.init_positional_encoding(jax.random.PRNGKey(1), 3, 16)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    enc = legacy.positional_encoding_apply(p, x)
    assert enc.shape == (8, legacy.positional_encoding_output_dims(3, 16))
    # frozen: no gradient into B
    g = jax.grad(lambda B: jnp.sum(legacy.positional_encoding_apply({"B": B}, x)))(p["B"])
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_schedules():
    ms = schedules.multistep_lr(1.0, [10, 20], gamma=0.1)
    assert float(ms(5)) == 1.0
    np.testing.assert_allclose(float(ms(15)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(ms(25)), 0.01, rtol=1e-6)
    warm = schedules.gradual_warmup(ms, 10)
    np.testing.assert_allclose(float(warm(5)), 0.5, rtol=1e-6)
    lin = schedules.linear_lr(1.0, 0.5, 1.0, 10)
    np.testing.assert_allclose(float(lin(0)), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(lin(10)), 1.0, rtol=1e-6)


def test_flagship_lr_schedule():
    from permuto_sdf_tpu.train.train_permuto_sdf import (
        PermutoSDFTrainConfig, lr_schedule,
    )

    cfg = PermutoSDFTrainConfig()
    np.testing.assert_allclose(float(lr_schedule(cfg, 100)), cfg.lr,
                               rtol=1e-6)  # sphere init: flat
    np.testing.assert_allclose(
        float(lr_schedule(cfg, cfg.nr_iter_sphere_fit + 1500)),
        cfg.lr * 0.5, rtol=1e-5,
    )  # warmup halfway
    np.testing.assert_allclose(
        float(lr_schedule(cfg, cfg.nr_iter_sphere_fit + 120000)),
        cfg.lr * 0.3, rtol=1e-5,
    )  # one milestone passed


def test_ray_bucket_rung_ladder_and_hysteresis():
    from permuto_sdf_tpu.train.train_permuto_sdf import _ray_bucket

    # the {2^k, 3*2^(k-1)} ladder from lo=512
    assert [_ray_bucket(n, lo=512) for n in (1, 512, 513, 769, 1025, 1537,
                                             2049, 3073, 9999)] == \
        [512, 512, 768, 1024, 1536, 2048, 3072, 4096, 4096]
    # snaps UP: the chosen rung always covers the desired count (until hi)
    for n in range(1, 4097, 37):
        assert _ray_bucket(n, lo=128) >= min(n, 4096)
    # hysteresis: within +-20% of the current rung, stay put
    assert _ray_bucket(1100, lo=512, current=1024) == 1024
    assert _ray_bucket(900, lo=512, current=1024) == 1024
    # outside the deadband, move
    assert _ray_bucket(1400, lo=512, current=1024) == 1536
    assert _ray_bucket(700, lo=512, current=1024) == 768
