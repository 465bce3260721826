"""Occupancy-map scaling ops.

The transcoder's occupancy 2x2 max-pool downscale (PCCTranscoder.cpp:594-646,
resizeOccupancyMap :341-372) and the decoder's occupancy upsample
(PCCCodec::generateOccupancyMap, PCCCodec.cpp:1584) as batched XLA ops over
(frames, H, W).  These lower to single fused reduce/broadcast kernels on TPU —
the reference's per-pixel double loops are the anti-pattern we avoid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("factor",))
def downscale_maxpool(occ: jax.Array, factor: int) -> jax.Array:
    """(F, H, W) -> (F, H/f, W/f) max-pool.  Max (not mean) preserves any
    occupied pixel, matching the reference's conservative downscale."""
    f, h, w = occ.shape
    x = occ.reshape(f, h // factor, factor, w // factor, factor)
    return x.max(axis=(2, 4))


@partial(jax.jit, static_argnames=("factor",))
def upsample_nearest(occ: jax.Array, factor: int) -> jax.Array:
    """(F, h, w) -> (F, h*f, w*f) nearest-neighbour upsample."""
    return jnp.repeat(jnp.repeat(occ, factor, axis=1), factor, axis=2)


@partial(jax.jit, static_argnames=("threshold",))
def binarize(occ: jax.Array, threshold: int = 0) -> jax.Array:
    """Occupancy video plane -> binary map (lossy-occupancy threshold,
    OccupancyInformation.oi_lossy_occupancy_compression_threshold)."""
    return (occ > threshold).astype(jnp.uint8)
