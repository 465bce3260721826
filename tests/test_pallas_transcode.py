"""The fused Pallas transcode kernel must match the XLA reference path
bit-exactly (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rabbit_transcoding_tpu.ops.pallas_transcode import transcode_coeffs_pallas
from rabbit_transcoding_tpu.video.rbv import (
    _transcode_device,
    qstep_of,
)


@pytest.mark.parametrize("gop", [1, 2, 4])
def test_matches_xla_path(gop):
    rng = np.random.default_rng(0)
    f, nby, nbx, b = 4, 3, 4, 16
    coeffs = rng.integers(-60, 60, size=(f, nby, nbx, b, b)).astype(np.int16)
    qs_in, qs_out, maxval = qstep_of(16), qstep_of(32), 1023.0

    ref = np.asarray(
        _transcode_device(
            jnp.asarray(coeffs), jnp.float32(qs_in), jnp.float32(qs_out),
            jnp.float32(maxval), b, gop, gop,
        )
    )
    out = np.asarray(
        transcode_coeffs_pallas(
            jnp.asarray(coeffs), gop, qs_in, qs_out, maxval, interpret=True
        )
    )
    mismatch = (out != ref).mean()
    # float rounding at exact .5 boundaries may differ in rare cases between
    # the two schedules; demand bit-exactness here (same backend, same ops)
    assert mismatch == 0.0, f"{mismatch:.4%} coefficients differ"


def test_identity_qp_on_real_coefficients():
    # coefficients must come from in-range pixel content (random coeffs
    # decode outside [0, maxval] and get clipped, changing them)
    from rabbit_transcoding_tpu.video.rbv import _encode_device

    yy, xx = np.mgrid[0:32, 0:64]
    frames = np.stack(
        [128 + 90 * np.sin((xx + 3 * f) / 7.0) * np.cos(yy / 5.0)
         for f in range(2)]
    ).astype(np.float32)
    qs = qstep_of(24)
    coeffs, _ = _encode_device(
        jnp.asarray(frames), jnp.float32(qs), jnp.float32(255.0), 16, 1
    )
    out = np.asarray(
        transcode_coeffs_pallas(coeffs, 1, qs, qs, 255.0, interpret=True)
    )
    # identity-QP transcode of a decodable stream reproduces coefficients
    # except where the deadzone rounds borderline values differently
    assert (out == np.asarray(coeffs)).mean() > 0.97
