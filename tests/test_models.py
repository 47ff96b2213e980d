"""Tests for the field models (SDF / RGB / NerfHash / Colorcal / MLPs)."""

import numpy as np
import jax
import jax.numpy as jnp

from permuto_sdf_tpu.models import (
    SDFConfig, RGBConfig, NerfHashConfig,
    init_sdf, sdf_apply, sdf_with_gradient, sdf_curvature_from_gradient,
    init_rgb, rgb_apply,
    init_nerf_hash, nerf_hash_apply, nerf_hash_density,
    init_colorcal, colorcal_apply,
    init_lipshitz_mlp, lipshitz_mlp_apply, lipshitz_bound_full,
)

# small lattice so CPU tests stay fast
SMALL = dict(capacity=2 ** 12, nr_levels=6)


def test_sdf_shapes_and_positive_init():
    cfg = SDFConfig(**SMALL)
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.5, maxval=0.5)
    sdf, geom = sdf_apply(params, pts, 0, cfg)
    assert sdf.shape == (64, 1) and geom.shape == (64, 32)
    # the +1e-2 bias shift puts the mean initial SDF near +0.01
    assert 0.0 < float(jnp.mean(sdf)) < 0.05


def test_sdf_gradient_matches_fd():
    cfg = SDFConfig(**SMALL)
    params = init_sdf(jax.random.PRNGKey(2), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(3), (16, 3), minval=-0.4, maxval=0.4)
    sdf, grads, geom = sdf_with_gradient(params, pts, 5000, cfg)
    assert grads.shape == (16, 3)
    eps = 1e-4
    for dim in range(3):
        dp = jnp.zeros((16, 3)).at[:, dim].set(eps)
        plus, _ = sdf_apply(params, pts + dp, 5000, cfg)
        minus, _ = sdf_apply(params, pts - dp, 5000, cfg)
        fd = (plus - minus)[:, 0] / (2 * eps)
        np.testing.assert_allclose(np.asarray(grads[:, dim]), np.asarray(fd),
                                   atol=2e-3, rtol=5e-2)


def test_sdf_curvature_finite():
    cfg = SDFConfig(**SMALL)
    params = init_sdf(jax.random.PRNGKey(4), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(5), (32, 3), minval=-0.4, maxval=0.4)
    _, grads, _ = sdf_with_gradient(params, pts, 0, cfg)
    _, curv = sdf_curvature_from_gradient(params, jax.random.PRNGKey(6), pts, grads, 0, cfg)
    curv = np.asarray(curv)
    assert curv.shape == (32, 1)
    assert np.isfinite(curv).all() and (curv >= 0).all() and (curv <= 1).all()


def test_4d_sdf_supported():
    cfg = SDFConfig(in_channels=4, **SMALL)
    params = init_sdf(jax.random.PRNGKey(7), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(8), (8, 4), minval=-0.5, maxval=0.5)
    sdf, grads, _ = sdf_with_gradient(params, pts, 0, cfg)
    assert sdf.shape == (8, 1) and grads.shape == (8, 4)


def test_rgb_model():
    cfg = RGBConfig(**SMALL)
    params = init_rgb(jax.random.PRNGKey(9), cfg)
    n = 32
    pts = jax.random.uniform(jax.random.PRNGKey(10), (n, 3), minval=-0.5, maxval=0.5)
    dirs = jax.random.normal(jax.random.PRNGKey(11), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    grads = jax.random.normal(jax.random.PRNGKey(12), (n, 3))
    geom = jax.random.normal(jax.random.PRNGKey(13), (n, 32))
    rgb = rgb_apply(params, pts, dirs, grads, geom, 0, cfg)
    rgb = np.asarray(rgb)
    assert rgb.shape == (n, 3) and (rgb > 0).all() and (rgb < 1).all()


def test_nerf_hash_fg_and_bg():
    for in_ch in (3, 4):
        cfg = NerfHashConfig(in_channels=in_ch, **SMALL)
        params = init_nerf_hash(jax.random.PRNGKey(14), cfg)
        pts = jax.random.uniform(jax.random.PRNGKey(15), (16, in_ch))
        dirs = jax.random.normal(jax.random.PRNGKey(16), (16, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        rgb, density = nerf_hash_apply(params, pts, dirs, 0, cfg)
        assert rgb.shape == (16, 3) and density.shape == (16, 1)
        assert (np.asarray(density) >= 0).all()  # softplus
        d2 = nerf_hash_density(params, pts, 0, cfg)
        np.testing.assert_allclose(np.asarray(density), np.asarray(d2), rtol=1e-5)


def test_colorcal_fixed_camera_identity():
    params = init_colorcal(4)
    params = {
        "weight_delta": jnp.ones((4, 3)) * 0.5,
        "bias": jnp.ones((4, 3)) * 0.1,
    }
    rgb = jnp.ones((6, 3)) * 0.4
    idx = jnp.asarray([0, 0, 1, 2, 3, 0])
    out = np.asarray(colorcal_apply(params, rgb, idx, idx_with_fixed_calib=0))
    np.testing.assert_allclose(out[idx == 0], 0.4)  # identity for fixed cam
    np.testing.assert_allclose(out[np.asarray(idx) != 0], 0.4 * 1.5 + 0.1)


def test_lipshitz_mlp_bound_limits_output_scale():
    layers = init_lipshitz_mlp(jax.random.PRNGKey(17), 8, [16, 16, 4])
    x = jax.random.normal(jax.random.PRNGKey(18), (32, 8))
    y0 = lipshitz_mlp_apply(layers, x)
    assert y0.shape == (32, 4)
    bound = lipshitz_bound_full(layers)
    assert float(bound) > 0
    # shrinking every c to a tiny value must shrink the network's Lipschitz
    # constant: outputs for two inputs get closer together
    tiny = [{**p, "c": jnp.full_like(p["c"], -5.0)} for p in layers]
    a = lipshitz_mlp_apply(tiny, x)
    b = lipshitz_mlp_apply(tiny, x + 1.0)
    big_a = lipshitz_mlp_apply(layers, x)
    big_b = lipshitz_mlp_apply(layers, x + 1.0)
    assert float(jnp.abs(a - b).max()) < float(jnp.abs(big_a - big_b).max())


def test_models_are_jittable_and_differentiable():
    cfg = SDFConfig(**SMALL)
    params = init_sdf(jax.random.PRNGKey(19), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(20), (16, 3), minval=-0.4, maxval=0.4)

    @jax.jit
    def eik_loss(p):
        _, grads, _ = sdf_with_gradient(p, pts, 1000, cfg)
        return jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)

    g = jax.grad(eik_loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_sdf_gradient_forward_vs_reverse_mode():
    """Forward-mode (jvp) and reverse-mode (vjp) spatial gradients must be
    identical — including the PARAMETER gradients of a second-order
    (eikonal-style) loss built on top of them."""
    import dataclasses as _dc
    from permuto_sdf_tpu.models.fields import (
        SDFConfig, init_sdf, sdf_with_gradient,
    )

    # table_bf16=False: this test isolates AD-direction equivalence, so both
    # modes must run the same (exact) gather path — the packed-bf16 path is
    # reverse-only and quantizes values (covered by test_encoding.py).
    cfg_f = SDFConfig(capacity=2 ** 9, nr_levels=4, nr_iters_for_c2f=1,
                      gradient_mode="forward", table_bf16=False)
    cfg_r = _dc.replace(cfg_f, gradient_mode="reverse")
    params = init_sdf(jax.random.PRNGKey(0), cfg_f)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (40, 3), minval=-0.4,
                             maxval=0.4)

    s_f, g_f, gf_f = sdf_with_gradient(params, pts, 100, cfg_f)
    s_r, g_r, gf_r = sdf_with_gradient(params, pts, 100, cfg_r)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_r), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf_f), np.asarray(gf_r), rtol=1e-5,
                               atol=1e-7)

    def eikonal(p, cfg):
        _, grads, _ = sdf_with_gradient(p, pts, 100, cfg)
        return jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)

    from jax.flatten_util import ravel_pytree
    tg_f = jax.grad(eikonal)(params, cfg_f)
    tg_r = jax.grad(eikonal)(params, cfg_r)
    flat_f, _ = ravel_pytree(tg_f)
    flat_r, _ = ravel_pytree(tg_r)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_r),
                               rtol=1e-4, atol=1e-7)
    assert float(jnp.abs(flat_f).sum()) > 0


def test_deferred_render_bilinear_matches_manual():
    """Bilinear UV sampling: exact texel centers return exact values;
    midpoints return the average (grid_sample align_corners=False
    semantics on the reference's uv*2-1 grid)."""
    import jax.numpy as jnp
    from permuto_sdf_tpu.models.deferred_render import sample_texture_bilinear

    tex = jnp.arange(16.0).reshape(4, 4, 1)
    # texel centers: uv = (i + 0.5) / 4
    uv = jnp.asarray([[(1 + 0.5) / 4, (2 + 0.5) / 4]])
    v = sample_texture_bilinear(tex, uv)
    np.testing.assert_allclose(np.asarray(v), [[tex[2, 1, 0]]], atol=1e-6)
    # midpoint between texels (1,1) (1,2) (2,1) (2,2)
    uv = jnp.asarray([[0.5, 0.5]])
    v = sample_texture_bilinear(tex, uv)
    np.testing.assert_allclose(
        np.asarray(v), [[float(tex[1, 1, 0] + tex[1, 2, 0]
                               + tex[2, 1, 0] + tex[2, 2, 0]) / 4]], atol=1e-6)


def test_deferred_render_pyramid_heads_and_gradients():
    """Pyramid sum + MLP and UNet heads run, differentiate, and fit a tiny
    target (the module's whole job: a learnable texture-space field)."""
    import jax
    import jax.numpy as jnp
    from permuto_sdf_tpu.models.deferred_render import (
        DeferredRenderConfig, init_deferred_render, deferred_render_apply)

    cfg = DeferredRenderConfig(tex_size=16, tex_nr_channels=4, nr_textures=3,
                               use_mlp=True)
    params = init_deferred_render(jax.random.PRNGKey(0), cfg)
    assert [t.shape[0] for t in params["textures"]] == [16, 8, 4]
    uv = jax.random.uniform(jax.random.PRNGKey(1), (64, 2))
    target = jnp.sin(uv[:, :1] * 7) * jnp.cos(uv[:, 1:] * 5)

    def loss(p):
        out = deferred_render_apply(p, uv, cfg)
        return jnp.mean((out[:, :1] - target) ** 2)

    import optax
    opt = optax.adam(3e-2)
    st = opt.init(params)
    l0 = float(loss(params))
    step = jax.jit(lambda p, s: (lambda g: opt.update(g, s, p))(jax.grad(loss)(p)))
    for _ in range(200):
        upd, st = step(params, st)
        params = optax.apply_updates(params, upd)
    assert float(loss(params)) < l0 * 0.2

    # UNet head on an image-shaped uv grid
    cfg_u = DeferredRenderConfig(tex_size=16, tex_nr_channels=4,
                                 nr_textures=2, use_unet=True)
    pu = init_deferred_render(jax.random.PRNGKey(2), cfg_u)
    ys, xs = jnp.meshgrid(jnp.linspace(0, 1, 12), jnp.linspace(0, 1, 12),
                          indexing="ij")
    uv_img = jnp.stack([xs, ys], -1)
    out = deferred_render_apply(pu, uv_img, cfg_u)
    assert out.shape == (12, 12, 3)
    g = jax.grad(lambda p: jnp.sum(deferred_render_apply(p, uv_img, cfg_u) ** 2))(pu)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
