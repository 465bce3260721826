"""Single-map pixel interleaving (asps_pixel_deinterleaving_flag).

Capability parity with the reference's singleMapPixelInterleaving mode
(PCCEncoderParameters.h:218, PCCCodec pixel-deinterleave reconstruction):
both depth maps ride ONE video, checkerboarded by pixel parity —
(x + y) even carries D0, odd carries D1.  The missing map value at a pixel
is interpolated from its horizontal neighbors, which by construction carry
exactly the needed map.

Device ops: pure elementwise selects + shifts, fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.aot import aot_jit


def _parity0(h: int, w: int) -> jax.Array:
    yy, xx = jnp.mgrid[0:h, 0:w]
    return ((yy + xx) % 2) == 0


@aot_jit
def interleave_maps(m0: jax.Array, m1: jax.Array) -> jax.Array:
    """(F, H, W) x2 -> (F, H, W): even-parity pixels from map 0, odd from
    map 1."""
    par0 = _parity0(m0.shape[1], m0.shape[2])
    return jnp.where(par0[None], m0, m1)


@aot_jit
def deinterleave_maps(plane: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(F, H, W) interleaved -> (map0, map1).

    The missing map at (x, y) is the mean of the (x-1, y) and (x+1, y)
    samples — opposite parity, i.e. exactly the needed map; atlas edge
    columns use their single available neighbor.  (No near/far clamp: plane
    values are absolute pixel depths whose ordering flips with the patch's
    projection mode.)"""
    f, h, w = plane.shape
    p = plane.astype(jnp.int32)
    left = jnp.roll(p, 1, axis=2)
    right = jnp.roll(p, -1, axis=2)
    xx = jnp.arange(w)
    has_l = (xx > 0)[None, None, :]
    has_r = (xx < w - 1)[None, None, :]
    interp = jnp.where(
        has_l & has_r, (left + right) // 2,
        jnp.where(has_l, left, right),
    )
    par0 = _parity0(h, w)[None]
    m0 = jnp.where(par0, p, interp)
    m1 = jnp.where(par0, interp, p)
    return m0.astype(plane.dtype), m1.astype(plane.dtype)
