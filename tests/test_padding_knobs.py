"""Background padding family: attributeBGFill modes, geometryPadding rim
refinement, groupDilation dual-map background averaging
(PCCEncoder.cpp:371-443, 5749, 5989 semantics)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters
from rabbit_transcoding_tpu.ops.dilate import (
    background_fill,
    group_dilation,
    harmonic_fill,
)
from tests.test_dualmap import thin_slab_cloud


def _plane(seed=0, h=32, w=32):
    rng = np.random.default_rng(seed)
    img = np.zeros((1, h, w), np.float32)
    occ = np.zeros((1, h, w), np.uint8)
    occ[0, 8:16, 8:24] = 1
    img[0, 8:16, 8:24] = rng.integers(40, 200, (8, 16))
    return img, occ


class TestHarmonicFill:
    def test_occupied_exact_and_range_bounded(self):
        img, occ = _plane()
        out = np.asarray(harmonic_fill(jnp.asarray(img), jnp.asarray(occ)))
        assert np.array_equal(out[occ > 0], img[occ > 0])
        lo, hi = img[occ > 0].min(), img[occ > 0].max()
        assert out.min() >= lo - 1e-3 and out.max() <= hi + 1e-3

    def test_interior_is_nearly_harmonic(self):
        img, occ = _plane()
        out = np.asarray(harmonic_fill(jnp.asarray(img), jnp.asarray(occ),
                                       iterations=200))[0]
        free = occ[0] == 0
        lap = np.abs(
            out[1:-1, 1:-1]
            - 0.25 * (out[:-2, 1:-1] + out[2:, 1:-1]
                      + out[1:-1, :-2] + out[1:-1, 2:])
        )
        interior = free[1:-1, 1:-1]
        assert lap[interior].mean() < 1.0


class TestBackgroundFillDispatch:
    def test_mode3_no_padding(self):
        img, occ = _plane()
        out = background_fill(img, occ, 3)
        assert np.array_equal(out, img)

    def test_modes_fill_background(self):
        img, occ = _plane()
        for mode in (0, 1, 2):
            out = background_fill(img, occ, mode)
            assert np.array_equal(out[occ > 0], img[occ > 0]), mode
            # the rim ring around the occupied block must be filled
            ring = np.zeros_like(occ, bool)
            ring[0, 7, 8:24] = True
            ring[0, 16, 8:24] = True
            assert (out[ring] > 0).all(), mode


class TestGroupDilation:
    def test_pair_background_averaged(self):
        rng = np.random.default_rng(2)
        filled = rng.uniform(0, 255, size=(4, 8, 8)).astype(np.float32)
        occ = np.zeros((2, 8, 8), np.uint8)
        occ[:, 2:4, 2:4] = 1
        before = filled.copy()
        out = group_dilation(filled, occ, 2)
        bg = occ == 0
        assert np.array_equal(out[0::2][bg], out[1::2][bg])
        expected = np.floor(
            (np.round(before[0::2]) + np.round(before[1::2]) + 1.0) / 2.0
        )
        assert np.array_equal(out[0::2][bg], expected[bg])
        assert np.array_equal(out[0::2][~bg], before[0::2][~bg])

    def test_single_map_untouched(self):
        filled = np.ones((2, 4, 4), np.float32)
        out = group_dilation(filled, np.zeros((2, 4, 4), np.uint8), 1)
        assert np.array_equal(out, filled)


class TestPaddingE2E:
    def _roundtrip(self, **kw):
        src = thin_slab_cloud()
        params = EncoderParameters(
            mapCountMinus1=1, geometryQP=24, attributeQP=30,
            minimumImageWidth=64, minimumImageHeight=64, **kw,
        )
        enc = Encoder(params)
        ctx, recon = enc.encode(GroupOfFrames([src]))
        clouds = Decoder().decode(ctx)
        assert clouds[0].compute_checksum() == recon[0].compute_checksum()
        return ctx

    def test_harmonic_fill_and_rim_padding_closed_loop(self):
        self._roundtrip(attributeBGFill=2, geometryPadding=1)

    def test_plain_dilate_and_no_group_dilation(self):
        self._roundtrip(attributeBGFill=0, groupDilation=False)

    def test_group_dilation_equalises_coded_backgrounds(self):
        ctx = self._roundtrip(groupDilation=True)
        # decoded geometry planes: map pair backgrounds must predict well —
        # sample the coded video and check the pair is identical off-patch
        from rabbit_transcoding_tpu.utils.enums import VideoType
        from rabbit_transcoding_tpu.video.rbv import decode as rbv_decode

        geo = ctx.atlas(0).video_bitstreams[VideoType.GEOMETRY]
        vid = rbv_decode(geo.data)
        d0 = np.asarray(vid.planes[0][0], np.int32)
        d1 = np.asarray(vid.planes[0][1], np.int32)
        # far corner is guaranteed background for the 48x48 slab cloud
        assert np.mean(np.abs(
            d0[-8:, -8:] - d1[-8:, -8:]
        )) <= np.mean(np.abs(d0 - d1)) + 1e-9
