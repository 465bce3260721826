"""Pallas kernel: fused per-GOP transcode of coefficient blocks.

The hottest device program in the framework — the RBV transcode core
(dequantise @ QP_in -> IDCT -> reconstruct the I/P chain -> DCT ->
requantise @ QP_out) — as ONE Pallas kernel.  The XLA version
(video.rbv._transcode_device) materialises intermediate pixel tensors in
HBM between the six stages; this kernel keeps a whole GOP's block row
resident in VMEM, so each coefficient is read from and written to HBM
exactly once.

Grid: (n_gops, nby) — one program per (GOP, block row).  Each program holds
(gop, nbx, B, B) coefficients, runs the in-GOP P-chain sequentially (the
data dependency is real), and batches the DCT matmuls over the row's nbx
blocks so they tile onto the MXU.

QP/deadzone parameters are compile-time constants (recompiles per rate pair
are cached); tensors are int16 in HBM, float32 in VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dct import dct_matrix

_PRECISION = jax.lax.Precision.HIGHEST


def _dct2(x, d):
    y = jnp.einsum("ij,njk->nik", d, x, precision=_PRECISION,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("nik,jk->nij", y, d, precision=_PRECISION,
                      preferred_element_type=jnp.float32)


def _idct2(c, d):
    y = jnp.einsum("ji,njk->nik", d, c, precision=_PRECISION,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("nik,kj->nij", y, d, precision=_PRECISION,
                      preferred_element_type=jnp.float32)


def _quant(c, qstep, dz):
    return jnp.clip(jnp.sign(c) * jnp.floor(jnp.abs(c) / qstep + dz),
                    -32767.0, 32767.0)


def _make_kernel(gop: int, qs_in: float, qs_out: float, maxval: float,
                 dz_intra: float, dz_inter: float):
    def kernel(q_ref, d_ref, out_ref):
        d = d_ref[...]
        # decode the GOP chain at qs_in
        q = q_ref[0, 0].astype(jnp.float32)          # (gop, nbx, B, B) -> [0]
        recs = []
        prev = None
        for g in range(gop):
            res = _idct2(q[g] * qs_in, d)
            pix = res if prev is None else prev + res
            pix = jnp.clip(jnp.round(pix), 0.0, maxval)
            recs.append(pix)
            prev = pix
        # re-encode the chain at qs_out
        prev = None
        for g in range(gop):
            target = recs[g] if prev is None else recs[g] - prev
            dz = dz_intra if prev is None else dz_inter
            qv = _quant(_dct2(target, d), qs_out, dz)
            out_ref[0, 0, g] = qv.astype(jnp.int16)
            rec = _idct2(qv * qs_out, d)
            pix = rec if prev is None else prev + rec
            prev = jnp.clip(jnp.round(pix), 0.0, maxval)

    return kernel


@partial(
    jax.jit,
    static_argnames=("gop", "qs_in", "qs_out", "maxval", "dz_intra",
                     "dz_inter", "interpret"),
)
def transcode_gops_pallas(
    coeffs: jax.Array,   # (n_gops, gop, nby, nbx, B, B) int16
    gop: int,
    qs_in: float,
    qs_out: float,
    maxval: float,
    dz_intra: float = 0.5,
    dz_inter: float = 1.0 / 3.0,
    interpret: bool = False,
) -> jax.Array:
    n_gops, g, nby, nbx, b, _ = coeffs.shape
    assert g == gop
    kernel = _make_kernel(gop, qs_in, qs_out, maxval, dz_intra, dz_inter)
    # one program per (GOP, block row); the row's blocks batch onto the MXU
    grid = (n_gops, nby)
    block_shape = (1, 1, gop, nbx, b, b)
    coeffs_t = coeffs.transpose(0, 2, 1, 3, 4, 5)  # (n_gops, nby, gop, ...)
    d = jnp.asarray(dct_matrix(b))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(coeffs_t.shape, jnp.int16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(block_shape, lambda i, j: (i, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, b), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block_shape, lambda i, j: (i, j, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coeffs_t, d)
    return out.transpose(0, 2, 1, 3, 4, 5)


def transcode_coeffs_pallas(
    coeffs: jax.Array,   # (F, nby, nbx, B, B) int16, F multiple of gop
    gop: int,
    qs_in: float,
    qs_out: float,
    maxval: float,
    interpret: bool = False,
) -> jax.Array:
    """Frame-major wrapper matching video.rbv._transcode_device semantics
    (same input GOP structure re-encoded at the new QP)."""
    f, nby, nbx, b, _ = coeffs.shape
    g = coeffs.reshape(f // gop, gop, nby, nbx, b, b)
    out = transcode_gops_pallas(
        g, gop, qs_in, qs_out, maxval, interpret=interpret
    )
    return out.reshape(f, nby, nbx, b, b)
