"""DeferredRender: learned multi-resolution neural texture, UV-sampled.

Equivalent of the reference's experimental ``DeferredRender`` module
(``/root/reference/permuto_sdf_py/models/models.py:566-594``): a pyramid
of ``nr_textures`` learned feature textures (sizes ``tex_size / 2^i``),
bilinearly sampled at UV coordinates and SUMMED across levels, with an
optional small MLP head and an optional UNet head (the reference's
``forward`` uses the texture sum + UNet; its MLP is constructed but never
applied — we expose both heads explicitly instead of mirroring that dead
wiring). No entry point in the reference uses the module (it is
experimental scaffolding for deferred/texture-space shading); it is
provided for API completeness.

TPU-native notes: textures are stored channels-last ``[H, W, C]`` and
sampled with an explicit 4-corner gather + lerp (there is no
``grid_sample`` primitive in JAX; the gather count is 4 per level per
point, dwarfed by any conv in the head). The UNet is a minimal
2-downsample conv U-Net built from ``lax.conv_general_dilated`` in NHWC —
convs map onto the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DeferredRenderConfig:
    tex_size: int = 512
    tex_nr_channels: int = 16
    nr_textures: int = 4      # mip pyramid depth (models.py:580-587)
    use_mlp: bool = False
    use_unet: bool = False
    unet_start_channels: int = 8
    unet_nr_downsamples: int = 2
    out_channels: int = 3


def init_deferred_render(key, cfg: DeferredRenderConfig):
    """Textures init to zero like the reference (models.py:587 multiplies
    the randn by 0); heads get standard inits."""
    params = {
        "textures": [
            jnp.zeros((cfg.tex_size // (2 ** i),) * 2 + (cfg.tex_nr_channels,))
            for i in range(cfg.nr_textures)
        ]
    }
    k = iter(jax.random.split(key, 16))
    if cfg.use_mlp:
        sizes = [cfg.tex_nr_channels, 32, 32, 32, cfg.out_channels]
        params["mlp"] = [
            {"w": jax.random.normal(next(k), (a, b)) * jnp.sqrt(2.0 / a),
             "b": jnp.zeros((b,))}
            for a, b in zip(sizes[:-1], sizes[1:])
        ]
    if cfg.use_unet:
        ch = [cfg.tex_nr_channels]
        c = cfg.unet_start_channels
        for _ in range(cfg.unet_nr_downsamples + 1):
            ch.append(min(c, 128))
            c *= 2

        def conv_p(cin, cout):
            return {"w": jax.random.normal(next(k), (3, 3, cin, cout))
                    * jnp.sqrt(2.0 / (9 * cin)),
                    "b": jnp.zeros((cout,))}

        params["unet"] = {
            "down": [conv_p(ch[i], ch[i + 1])
                     for i in range(cfg.unet_nr_downsamples + 1)],
            "up": [conv_p(ch[i + 1] + ch[i], ch[i])
                   for i in range(cfg.unet_nr_downsamples, 0, -1)],
            "out": conv_p(ch[1], cfg.out_channels),
        }
    return params


def sample_texture_bilinear(tex, uv):
    """tex [H, W, C], uv [N, 2] in [0, 1] -> [N, C].

    Matches ``grid_sample(..., mode='bilinear', align_corners=False)``
    semantics on the reference's ``uv*2-1`` grid: uv=0 maps to half a
    texel outside the first texel center, border values clamp."""
    H, W, C = tex.shape
    x = uv[:, 0] * W - 0.5
    y = uv[:, 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def at(yi, xi):
        yi = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        return tex[yi, xi]

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _conv(p, x, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def _unet_apply(p, x):
    """Minimal U-Net, NHWC: stride-2 downs, bilinear-free nearest ups with
    skip concat (UNet(in, start=8, nr_downsamples=2, out=3) equivalent,
    models.py:606)."""
    act = jax.nn.mish
    skips = []
    h = x
    for i, cp in enumerate(p["down"]):
        h = act(_conv(cp, h, stride=1 if i == 0 else 2))
        skips.append(h)
    for cp, skip in zip(p["up"], skips[-2::-1]):
        n, hh, ww, c = h.shape
        h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        h = h[:, : skip.shape[1], : skip.shape[2]]
        h = act(_conv(cp, jnp.concatenate([h, skip], axis=-1)))
    return _conv(p["out"], h)


def deferred_render_apply(params, uv, cfg: DeferredRenderConfig,
                          image_shape: Optional[tuple] = None):
    """uv [N, 2] in [0, 1] (or [H, W, 2] with ``image_shape`` implied) ->
    features/rgb.

    Reference forward (models.py:624-668): sum of bilinear samples over
    the texture pyramid (no c2f window — the window multiply is commented
    out there), then the UNet head when enabled. The MLP head (which the
    reference constructs but never calls) is applied pointwise when
    ``use_mlp``. UNet requires image-shaped input."""
    if uv.ndim == 3:
        image_shape = uv.shape[:2]
        uv = uv.reshape(-1, 2)
    x = sum(sample_texture_bilinear(t, uv) for t in params["textures"])
    if cfg.use_mlp:
        h = x
        for i, layer in enumerate(params["mlp"]):
            h = h @ layer["w"] + layer["b"]
            if i < len(params["mlp"]) - 1:
                h = jax.nn.mish(h)
        x = h
    if cfg.use_unet:
        assert image_shape is not None, "UNet head needs [H, W, 2] uv input"
        H, W = image_shape
        x = _unet_apply(params["unet"], x.reshape(1, H, W, -1))[0]
        return x  # [H, W, out_channels]
    if image_shape is not None:
        return x.reshape(*image_shape, -1)
    return x
