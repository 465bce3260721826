"""RBV — the TPU-native block video codec.

This is the framework's replacement for the reference's HM/x265/NVENC video
path (SURVEY.md §7 milestone 4).  Design, TPU-first:

 * **Device (JAX/XLA, MXU)**: block DCT/IDCT as batched matmuls, uniform
   quantisation, reconstruction, and the I/P prediction chain.  A whole GOF
   is encoded in ONE jitted call: frames are grouped into independent GOPs,
   ``vmap`` runs all GOPs in parallel and ``lax.scan`` runs the short
   P-chain inside each GOP (gop=1 collapses to a fully parallel all-intra
   path, used for occupancy just like the reference's all-intra occupancy
   encode, PCCTranscoder.cpp:830-844).
 * **Host**: entropy coding.  DC coefficients are DPCM'd across the block
   raster, everything is packed to int16 and DEFLATE-compressed.  There is
   deliberately no cross-block *sample* prediction: that would serialise
   block decoding; instead prediction happens per-frame (P frames) and at
   the entropy level (DC DPCM), which keeps both encode and decode
   embarrassingly parallel on device.

Closed-loop exactness: the encoder reconstructs with the same rounded/
clipped arithmetic the decoder uses, so encoder-side ``recon`` equals the
decode of the produced bitstream bit-for-bit when run on the same backend.

Payload container (little-endian):
  magic 'RBV1' | ver u8 | flags u8 (b0 lossless, b1 unused) | width u16 |
  height u16 | bitdepth u8 | chroma u8 | frames u16 | block u8 | gop u8 |
  qp u8 | reserved u8 | per plane: blob_len u32 + DEFLATE blob
"""

from __future__ import annotations

import dataclasses
import struct
import zlib
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.image import Video
from ..utils.enums import ColorFormat
from ..ops.dct import blockify, dct2d, deblockify, idct2d, pad_to_block

_MAGIC = b"RBV1"
_HEADER = struct.Struct("<4sBBHHBBHBBBB")


def qstep_of(qp: int) -> float:
    """HEVC-style quantiser step: doubles every 6 QP."""
    return float(2.0 ** ((qp - 4.0) / 6.0))


# ===========================================================================
# Device kernels
# ===========================================================================
@partial(jax.jit, static_argnames=("block", "gop"))
def _encode_device(frames: jax.Array, qstep: jax.Array, maxval: jax.Array,
                   block: int, gop: int):
    """frames (F, H, W) float32, F a multiple of gop ->
    (coeffs (F, nby, nbx, B, B) int32, recon (F, H, W) float32)."""
    f, h, w = frames.shape
    n_gops = f // gop
    gframes = frames.reshape(n_gops, gop, h, w)

    def encode_frame(frame, pred):
        res = frame - pred
        c = dct2d(blockify(res, block))
        q = jnp.clip(jnp.round(c / qstep), -32767, 32767)
        rec = pred + deblockify(idct2d(q * qstep))
        rec = jnp.clip(jnp.round(rec), 0.0, maxval)
        return q.astype(jnp.int32), rec

    if gop == 1:
        # all-intra: fully parallel over every frame
        q, rec = encode_frame(gframes, jnp.zeros_like(gframes))
        return (
            q.reshape(f, h // block, w // block, block, block),
            rec.reshape(f, h, w),
        )

    def one_gop(g):
        q0, rec0 = encode_frame(g[0], jnp.zeros_like(g[0]))

        def step(prev_rec, frame):
            q, rec = encode_frame(frame, prev_rec)
            return rec, (q, rec)

        _, (qs, recs) = jax.lax.scan(step, rec0, g[1:])
        return (
            jnp.concatenate([q0[None], qs], axis=0),
            jnp.concatenate([rec0[None], recs], axis=0),
        )

    q, rec = jax.vmap(one_gop)(gframes)
    return (
        q.reshape(f, h // block, w // block, block, block),
        rec.reshape(f, h, w),
    )


@partial(jax.jit, static_argnames=("block", "gop"))
def _decode_device(coeffs: jax.Array, qstep: jax.Array, maxval: jax.Array,
                   block: int, gop: int):
    """coeffs (F, nby, nbx, B, B) int32 -> recon (F, H, W) float32."""
    f, nby, nbx, b, _ = coeffs.shape
    h, w = nby * b, nbx * b
    n_gops = f // gop
    g = coeffs.reshape(n_gops, gop, nby, nbx, b, b).astype(jnp.float32)

    def decode_frame(q, pred):
        rec = pred + deblockify(idct2d(q * qstep))
        return jnp.clip(jnp.round(rec), 0.0, maxval)

    if gop == 1:
        rec = decode_frame(g, jnp.zeros((n_gops, gop, h, w), jnp.float32))
        return rec.reshape(f, h, w)

    def one_gop(gq):
        rec0 = decode_frame(gq[0], jnp.zeros((h, w), jnp.float32))

        def step(prev_rec, q):
            rec = decode_frame(q, prev_rec)
            return rec, rec

        _, recs = jax.lax.scan(step, rec0, gq[1:])
        return jnp.concatenate([rec0[None], recs], axis=0)

    rec = jax.vmap(one_gop)(g)
    return rec.reshape(f, h, w)


# ===========================================================================
# Host entropy coding
# ===========================================================================
def _pack_plane(q: np.ndarray, level: int = 6) -> bytes:
    """(F, nby, nbx, B, B) int32 -> DEFLATE blob (with DC DPCM)."""
    f, nby, nbx, b, _ = q.shape
    q16 = q.astype(np.int16)
    dc = q16[:, :, :, 0, 0].reshape(f, nby * nbx).astype(np.int32)
    dcd = np.diff(dc, axis=1, prepend=0).astype(np.int16)
    q16[:, :, :, 0, 0] = dcd.reshape(f, nby, nbx)
    return zlib.compress(q16.tobytes(), level)


def _unpack_plane(blob: bytes, f: int, nby: int, nbx: int, b: int) -> np.ndarray:
    q16 = np.frombuffer(zlib.decompress(blob), dtype=np.int16).reshape(
        f, nby, nbx, b, b
    ).copy()
    dcd = q16[:, :, :, 0, 0].reshape(f, nby * nbx).astype(np.int32)
    dc = np.cumsum(dcd, axis=1)
    q16 = q16.astype(np.int32)
    q16[:, :, :, 0, 0] = dc.reshape(f, nby, nbx)
    return q16


# ===========================================================================
# Codec API
# ===========================================================================
@dataclasses.dataclass
class RbvParams:
    qp: int = 32
    block_size: int = 16
    gop_size: int = 2
    lossless: bool = False
    zlib_level: int = 6


def _plane_dims(width: int, height: int, fmt: ColorFormat) -> list[tuple[int, int]]:
    if fmt == ColorFormat.YUV400:
        return [(height, width)]
    if fmt == ColorFormat.YUV420:
        return [(height, width), (height // 2, width // 2), (height // 2, width // 2)]
    return [(height, width)] * 3


def encode(video: Video, params: RbvParams) -> tuple[bytes, Video]:
    """Encode a Video -> (payload bytes, closed-loop reconstruction)."""
    f = video.frame_count
    flags = 1 if params.lossless else 0
    header = _HEADER.pack(
        _MAGIC, 1, flags, video.width, video.height, video.bitdepth,
        int(video.format), f, params.block_size, params.gop_size,
        params.qp, 0,
    )
    blobs: list[bytes] = []
    recon_planes: list[np.ndarray] = []
    maxval = float((1 << video.bitdepth) - 1)

    if params.lossless:
        for p in video.planes:
            blobs.append(zlib.compress(np.ascontiguousarray(p).tobytes(),
                                       params.zlib_level))
            recon_planes.append(p.copy())
    else:
        b = params.block_size
        gop = params.gop_size
        qstep = jnp.float32(qstep_of(params.qp))
        for p in video.planes:
            orig_h, orig_w = p.shape[-2:]
            padded = pad_to_block(p.astype(np.float32), b)
            fpad = (-f) % gop
            if fpad:
                padded = np.concatenate(
                    [padded, np.repeat(padded[-1:], fpad, axis=0)], axis=0
                )
            q, rec = _encode_device(
                jnp.asarray(padded), qstep, jnp.float32(maxval), b, gop
            )
            q = np.asarray(q)[: f]
            rec = np.asarray(rec)[: f, :orig_h, :orig_w]
            blobs.append(_pack_plane(q, params.zlib_level))
            recon_planes.append(rec.astype(p.dtype))

    out = bytearray(header)
    for blob in blobs:
        out.extend(struct.pack("<I", len(blob)))
        out.extend(blob)
    recon = Video(video.width, video.height, video.bitdepth, video.format,
                  recon_planes)
    return bytes(out), recon


def decode(payload: bytes) -> Video:
    """Decode an RBV payload -> Video."""
    magic, ver, flags, width, height, bitdepth, chroma, f, block, gop, qp, _ = (
        _HEADER.unpack_from(payload, 0)
    )
    if magic != _MAGIC:
        raise ValueError("not an RBV bitstream")
    if ver != 1:
        raise ValueError(f"unsupported RBV version {ver}")
    fmt = ColorFormat(chroma)
    lossless = bool(flags & 1)
    pos = _HEADER.size
    dims = _plane_dims(width, height, fmt)
    dtype = np.uint8 if bitdepth <= 8 else np.uint16
    maxval = float((1 << bitdepth) - 1)
    planes: list[np.ndarray] = []
    for h, w in dims:
        (blob_len,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        blob = payload[pos : pos + blob_len]
        pos += blob_len
        if lossless:
            planes.append(
                np.frombuffer(zlib.decompress(blob), dtype=dtype).reshape(f, h, w)
            )
        else:
            ph = h + ((-h) % block)
            pw = w + ((-w) % block)
            fp = f + ((-f) % gop)
            q = _unpack_plane(blob, f, ph // block, pw // block, block)
            if fp != f:
                q = np.concatenate([q, np.repeat(q[-1:], fp - f, axis=0)], axis=0)
            rec = _decode_device(
                jnp.asarray(q), jnp.float32(qstep_of(qp)), jnp.float32(maxval),
                block, gop,
            )
            planes.append(np.asarray(rec)[: f, :h, :w].astype(dtype))
    return Video(width, height, bitdepth, fmt, planes)


@jax.jit
def _requant_device(q: jax.Array, qstep_old: jax.Array, qstep_new: jax.Array):
    c = q.astype(jnp.float32) * qstep_old
    return jnp.clip(jnp.round(c / qstep_new), -32767, 32767).astype(jnp.int32)


def requantize(payload: bytes, new_qp: int, zlib_level: int = 6) -> bytes:
    """DCT-domain transcode: re-quantise coefficients to a new QP without a
    full decode->encode loop.  This is the fast path the reference cannot
    take (its codecs are opaque HM/x265 streams; ours is RBV, so the
    transform domain is directly accessible).  I-frames requantise exactly;
    P-frame residuals requantise open-loop (drift bounded by the GOP length,
    default 2).  Lossless streams pass through unchanged."""
    magic, ver, flags, width, height, bitdepth, chroma, f, block, gop, qp, _ = (
        _HEADER.unpack_from(payload, 0)
    )
    if magic != _MAGIC:
        raise ValueError("not an RBV bitstream")
    if flags & 1 or new_qp == qp:
        return payload
    header = _HEADER.pack(
        _MAGIC, ver, flags, width, height, bitdepth, chroma, f, block, gop,
        new_qp, 0,
    )
    dims = _plane_dims(width, height, ColorFormat(chroma))
    qs_old = jnp.float32(qstep_of(qp))
    qs_new = jnp.float32(qstep_of(new_qp))
    out = bytearray(header)
    pos = _HEADER.size
    for h, w in dims:
        (blob_len,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        blob = payload[pos : pos + blob_len]
        pos += blob_len
        ph = h + ((-h) % block)
        pw = w + ((-w) % block)
        q = _unpack_plane(blob, f, ph // block, pw // block, block)
        q2 = np.asarray(_requant_device(jnp.asarray(q), qs_old, qs_new))
        new_blob = _pack_plane(q2, zlib_level)
        out.extend(struct.pack("<I", len(new_blob)))
        out.extend(new_blob)
    return bytes(out)


def probe(payload: bytes) -> dict:
    """Read stream parameters without decoding (the PccHevcParser-analog
    width/height/bitdepth probe the transcoder needs)."""
    magic, ver, flags, width, height, bitdepth, chroma, f, block, gop, qp, _ = (
        _HEADER.unpack_from(payload, 0)
    )
    if magic != _MAGIC:
        raise ValueError("not an RBV bitstream")
    return {
        "width": width, "height": height, "bitdepth": bitdepth,
        "format": ColorFormat(chroma), "frame_count": f,
        "block_size": block, "gop_size": gop, "qp": qp,
        "lossless": bool(flags & 1),
    }
