"""Color conversion kernels: BT.709 RGB<->YUV, 444<->420.

Capability parity with PCCInternalColorConverter (/root/reference/source/lib/
PccLibColorConverter/include/PCCInternalColorConverter.h:63-129) as batched
XLA ops over (frames, H, W) planes.  BT.709 matrix coefficients per
Rec. ITU-R BT.709-6 (Kr=0.2126, Kb=0.0722).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_KR, _KB = 0.2126, 0.0722
_KG = 1.0 - _KR - _KB


@jax.jit
def rgb_to_yuv709(r: jax.Array, g: jax.Array, b: jax.Array):
    """Normalised [0,1] RGB -> [0,1] Y, [-0.5,0.5]+0.5 U/V (full range)."""
    y = _KR * r + _KG * g + _KB * b
    u = 0.5 * (b - y) / (1.0 - _KB) + 0.5
    v = 0.5 * (r - y) / (1.0 - _KR) + 0.5
    return y, u, v


@jax.jit
def yuv709_to_rgb(y: jax.Array, u: jax.Array, v: jax.Array):
    """Inverse of rgb_to_yuv709."""
    u = u - 0.5
    v = v - 0.5
    r = y + 2.0 * (1.0 - _KR) * v
    b = y + 2.0 * (1.0 - _KB) * u
    g = (y - _KR * r - _KB * b) / _KG
    return r, g, b


def rgb8_to_yuv420(rgb: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(F, H, W, 3) uint8 -> (y (F,H,W), u (F,H/2,W/2), v) uint8 planes."""
    x = rgb.astype(jnp.float32) / 255.0
    y, u, v = rgb_to_yuv709(x[..., 0], x[..., 1], x[..., 2])

    def down(p):
        f, h, w = p.shape
        return p.reshape(f, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    to8 = lambda p: jnp.clip(jnp.round(p * 255.0), 0, 255).astype(jnp.uint8)
    return to8(y), to8(down(u)), to8(down(v))


def yuv420_to_rgb8(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """uint8 planes -> (F, H, W, 3) uint8 RGB (nearest chroma upsample)."""
    yf = y.astype(jnp.float32) / 255.0
    up = lambda p: jnp.repeat(jnp.repeat(p, 2, axis=1), 2, axis=2)
    uf = up(u.astype(jnp.float32) / 255.0)[:, : y.shape[1], : y.shape[2]]
    vf = up(v.astype(jnp.float32) / 255.0)[:, : y.shape[1], : y.shape[2]]
    r, g, b = yuv709_to_rgb(yf, uf, vf)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)


def yuv16_to_rgb8(yuv: jax.Array) -> jax.Array:
    """(N, 3) uint16 YUV (full-range, 16-bit) -> (N, 3) uint8 RGB.
    Device analog of PCCPointSet3::convertYUV16ToRGB8 (PCCPointSet.h:133)."""
    x = yuv.astype(jnp.float32) / 65535.0
    r, g, b = yuv709_to_rgb(x[..., 0], x[..., 1], x[..., 2])
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)
