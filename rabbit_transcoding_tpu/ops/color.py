"""Color conversion kernels: BT.709 RGB<->YUV, 444<->420.

Capability parity with PCCInternalColorConverter (/root/reference/source/lib/
PccLibColorConverter/include/PCCInternalColorConverter.h:63-129) as batched
XLA ops over (frames, H, W) planes.  BT.709 matrix coefficients per
Rec. ITU-R BT.709-6 (Kr=0.2126, Kb=0.0722).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

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


# ===========================================================================
# Chroma resampling filter banks
# ===========================================================================
# 444->420 bank (g_filter444to420, PCCInternalColorConverter.cpp:37-65):
# per entry (horizontal kernel centered at the even column, vertical kernel
# centered between the two rows).  Coefficients normalised to sum 1.
_DOWN_FILTERS: dict[int | str, tuple[list[float], list[float]]] = {
    0: ([64, 384, 64], [256, 256]),                       # DF_F0
    1: ([128, 256, 128], [256, 256]),                     # DF_F1
    2: ([21, 0, -52, 0, 159, 256, 159, 0, -52, 0, 21],    # DF_TM5
        [5, 11, -21, -37, 70, 228, 228, 70, -37, -21, 11, 5]),
    3: ([8, 0, -64, 128, 368, 128, -64, 0, 8],            # DF_FV
        [8, 0, -24, 48, 224, 224, 48, -24, 0, 8]),
    "box": ([256, 256], [256, 256]),                      # round-1 mean 2x2
}
# 420->444 bank (g_filter420to444, PCCInternalColorConverter.cpp:297-330):
# even output samples are co-sited copies; odd samples use the halfway
# (phase-1/2) kernel of each entry.
_UP_FILTERS: dict[int | str, list[float] | None] = {
    0: [-16, 144, 144, -16],                              # UF_F0
    3: [6, -34, 156, 156, -34, 6],                        # UF_LS3
    4: [-3, 15, -43, 159, 159, -43, 15, -3],              # UF_LS4
    5: [21, -52, 159, 159, -52, 21],                      # UF_TM
    "nearest": None,                                      # round-1 repeat
}


def _conv_down_1d(p: jax.Array, kern: list[float], axis: int) -> jax.Array:
    """Decimate-by-2 along `axis`: out[i] = sum_k w[k] * in[2i + k - off]
    with edge replication; off centers odd kernels at the even sample and
    even kernels between the sample pair (the reference's phases)."""
    w = np.asarray(kern, np.float32)
    w /= w.sum()
    n = p.shape[axis]
    off = (len(w) - 1) // 2 if len(w) % 2 else len(w) // 2 - 1
    pad = [(0, 0)] * p.ndim
    pad[axis] = (off, len(w) - 1 - off)
    padded = jnp.pad(p, pad, mode="edge")
    out = None
    for k, wk in enumerate(w):
        sl = [slice(None)] * p.ndim
        sl[axis] = slice(k, k + n, 2)
        term = wk * padded[tuple(sl)]
        out = term if out is None else out + term
    return out


def _conv_up_1d(p: jax.Array, kern: list[float] | None, axis: int) -> jax.Array:
    """Upsample-by-2 along `axis`: even outputs copy the co-sited sample;
    odd outputs interpolate with the halfway kernel (edge replication)."""
    n = p.shape[axis]
    if kern is None:  # nearest
        return jnp.repeat(p, 2, axis=axis)
    w = np.asarray(kern, np.float32)
    w /= w.sum()
    off = len(w) // 2 - 1  # halfway kernel is even-length by construction
    pad = [(0, 0)] * p.ndim
    pad[axis] = (off, len(w) - 1 - off)
    padded = jnp.pad(p, pad, mode="edge")
    odd = None
    for k, wk in enumerate(w):
        sl = [slice(None)] * p.ndim
        sl[axis] = slice(k, k + n)
        term = wk * padded[tuple(sl)]
        odd = term if odd is None else odd + term
    return jnp.stack([p, odd], axis=axis + 1).reshape(
        *p.shape[:axis], 2 * n, *p.shape[axis + 1:]
    )


def downsample_chroma(p: jax.Array, filt: int | str = 1) -> jax.Array:
    """(F, H, W) float chroma -> (F, H/2, W/2) with the selected filter."""
    kh, kv = _DOWN_FILTERS[filt]
    return _conv_down_1d(_conv_down_1d(p, kh, axis=2), kv, axis=1)


def upsample_chroma(p: jax.Array, filt: int | str = 0) -> jax.Array:
    """(F, H/2, W/2) float chroma -> (F, H, W) with the selected filter."""
    kern = _UP_FILTERS[filt]
    return _conv_up_1d(_conv_up_1d(p, kern, axis=1), kern, axis=2)


def rgb8_to_yuv420(
    rgb: jax.Array, down_filter: int | str = 1
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(F, H, W, 3) uint8 -> (y (F,H,W), u (F,H/2,W/2), v) uint8 planes.
    down_filter selects the 444->420 bank entry (default DF_F1)."""
    x = rgb.astype(jnp.float32) / 255.0
    y, u, v = rgb_to_yuv709(x[..., 0], x[..., 1], x[..., 2])
    to8 = lambda p: jnp.clip(jnp.round(p * 255.0), 0, 255).astype(jnp.uint8)
    return (
        to8(y),
        to8(downsample_chroma(u, down_filter)),
        to8(downsample_chroma(v, down_filter)),
    )


def yuv420_to_rgb8(
    y: jax.Array, u: jax.Array, v: jax.Array, up_filter: int | str = 0
) -> jax.Array:
    """uint8 planes -> (F, H, W, 3) uint8 RGB.  up_filter selects the
    420->444 bank entry (default UF_F0; this choice must match between the
    encoder's closed-loop reconstruction and the decoder — both call this
    shared function with the same default)."""
    yf = y.astype(jnp.float32) / 255.0
    uf = upsample_chroma(
        u.astype(jnp.float32) / 255.0, up_filter
    )[:, : y.shape[1], : y.shape[2]]
    vf = upsample_chroma(
        v.astype(jnp.float32) / 255.0, up_filter
    )[:, : y.shape[1], : y.shape[2]]
    r, g, b = yuv709_to_rgb(yf, uf, vf)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)


def rgb8_to_yuv420_patch_aware(
    rgb: jax.Array, patch_id: jax.Array, down_filter: int | str = 1
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-patch chroma subsampling (the patchColorSubsampling path,
    PCCVideoEncoder.cpp:70-130): filter taps must not mix content from
    DIFFERENT patches (long kernels reach across patch block borders into
    unrelated geometry).  The reference extracts each patch into its own
    edge-extended buffer; the batched equivalent here substitutes the
    center sample for any tap whose pixel belongs to another patch —
    patch-boundary edge replication, one pass over the whole video.

    patch_id: (F, H, W) int32 per-pixel owner (background may be -1)."""
    x = rgb.astype(jnp.float32) / 255.0
    y, u, v = rgb_to_yuv709(x[..., 0], x[..., 1], x[..., 2])
    kh, kv = _DOWN_FILTERS[down_filter]

    def masked_down(p):
        def pass1d(p, pid, kern, axis):
            w = np.asarray(kern, np.float32)
            w /= w.sum()
            n = p.shape[axis]
            off = (len(w) - 1) // 2 if len(w) % 2 else len(w) // 2 - 1
            pad = [(0, 0)] * p.ndim
            pad[axis] = (off, len(w) - 1 - off)
            pp = jnp.pad(p, pad, mode="edge")
            pidp = jnp.pad(pid, pad, mode="edge")
            # center sample of each output position (the even tap)
            slc = [slice(None)] * p.ndim
            slc[axis] = slice(off, off + n, 2)
            center = pp[tuple(slc)]
            pid_c = pidp[tuple(slc)]
            out = None
            for k, wk in enumerate(w):
                sl = [slice(None)] * p.ndim
                sl[axis] = slice(k, k + n, 2)
                val = jnp.where(
                    pidp[tuple(sl)] == pid_c, pp[tuple(sl)], center
                )
                term = wk * val
                out = term if out is None else out + term
            return out, pid_c

        ph, pid_h = pass1d(p, patch_id, kh, axis=2)
        pv, _ = pass1d(ph, pid_h, kv, axis=1)
        return pv

    to8 = lambda p: jnp.clip(jnp.round(p * 255.0), 0, 255).astype(jnp.uint8)
    return to8(y), to8(masked_down(u)), to8(masked_down(v))


def yuv16_to_rgb8(yuv: jax.Array) -> jax.Array:
    """(N, 3) uint16 YUV (full-range, 16-bit) -> (N, 3) uint8 RGB.
    Device analog of PCCPointSet3::convertYUV16ToRGB8 (PCCPointSet.h:133)."""
    x = yuv.astype(jnp.float32) / 65535.0
    r, g, b = yuv709_to_rgb(x[..., 0], x[..., 1], x[..., 2])
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)
