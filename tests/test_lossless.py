"""Lossless coding conditions (reference: cfg/common/ctc-common-lossless-*.cfg
+ cfg/condition/*lossless*, PCCEncoderParameters.h:180-183).

Lossless geometry = decoded positions are EXACTLY the source set (EOM captures
between-layer points, the raw patch captures everything else, occupancy rides
precision 1, the geometry video is coded lossless).  Lossless attribute adds
RGB444 lossless attribute video; every decoded point carries its exact source
color.
"""

import os

import numpy as np
import pytest

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters
from rabbit_transcoding_tpu.testdata import make_frame
from rabbit_transcoding_tpu.utils.enums import VideoType

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "cfg")


def small_lossless_params(**over) -> EncoderParameters:
    base = dict(
        losslessGeo=True,
        losslessAttribute=True,
        attributeVideo444=True,
        rawPointsPatch=True,
        enhancedOccupancyMapCode=True,
        minimumImageWidth=256,
        minimumImageHeight=64,
        allIntra=True,
        frameCount=2,
        groupOfFramesSize=2,
    )
    base.update(over)
    return EncoderParameters(**base)


def tiny_gof(n_frames=2):
    return GroupOfFrames(
        [make_frame(i, n=9000, radius=40.0, center=64.0) for i in range(n_frames)]
    )


def roundtrip(gof, params):
    ctx, recon = Encoder(params).encode(gof)
    data = V3CWriter().write(V3CWriter().encode(ctx))
    ctx2 = V3CReader().decode(V3CReader().read(data)[0])
    return data, ctx2, Decoder().decode(ctx2), recon


def pos_set(ps):
    return set(map(tuple, ps.positions.astype(np.int64)))


class TestLosslessGeometryAttribute:
    @pytest.fixture(scope="class")
    def result(self):
        gof = tiny_gof()
        return gof, *roundtrip(gof, small_lossless_params())

    def test_positions_bit_exact(self, result):
        gof, _, _, dec, _ = result
        for src, d in zip(gof, dec):
            assert pos_set(src) == pos_set(d)

    def test_colors_bit_exact(self, result):
        gof, _, _, dec, _ = result
        for src, d in zip(gof, dec):
            by_pos = {
                tuple(p): tuple(c)
                for p, c in zip(src.positions.astype(np.int64), src.colors)
            }
            for p, c in zip(d.positions.astype(np.int64), d.colors):
                assert by_pos[tuple(p)] == tuple(c)

    def test_closed_loop_matches_decode(self, result):
        gof, _, _, dec, recon = result
        for r, d in zip(recon, dec):
            assert pos_set(r) == pos_set(d)

    def test_attribute_video_is_444(self, result):
        _, _, ctx2, _, _ = result
        from rabbit_transcoding_tpu.utils.enums import CodecId, ColorFormat
        from rabbit_transcoding_tpu.video import VideoDecoder

        attr = VideoDecoder.create(CodecId.RBV).decode(
            ctx2.atlas(0).get_video_bitstream(VideoType.ATTRIBUTE).data
        )
        assert attr.format == ColorFormat.RGB444
        assert len(attr.planes) == 3
        assert attr.planes[1].shape == attr.planes[0].shape  # no subsample


class TestLosslessGeometryOnly:
    def test_no_attributes_stream(self):
        gof = tiny_gof(1)
        params = small_lossless_params(
            noAttributes=True, losslessAttribute=False,
            frameCount=1, groupOfFramesSize=1,
        )
        _, ctx2, dec, _ = roundtrip(gof, params)
        atlas = ctx2.atlas(0)
        assert VideoType.ATTRIBUTE not in atlas.video_bitstreams
        assert (
            ctx2.vps.atlas(0).attribute_information.ai_attribute_count == 0
        )
        assert dec[0].colors is None
        assert pos_set(gof[0]) == pos_set(dec[0])


class TestLosslessCfgCascade:
    def test_cascade_drives_lossless_roundtrip(self):
        """common-lossless -> condition -> rate cascade produces a bit-exact
        stream end to end (the CTC lossless operating point)."""
        from rabbit_transcoding_tpu.apps.common import build_registry

        params = EncoderParameters()
        reg = build_registry(params)
        reg.parse_config_file(os.path.join(
            CFG_DIR, "common", "ctc-common-lossless-geometry-attribute.cfg"
        ))
        reg.parse_config_file(os.path.join(
            CFG_DIR, "condition",
            "ctc-all-intra-lossless-geometry-attribute.cfg",
        ))
        reg.apply_to_dataclass(params)
        assert params.losslessGeo and params.losslessAttribute
        assert params.enhancedOccupancyMapCode
        assert params.occupancyPrecision == 1
        assert params.allIntra and not params.constrainedPack
        # shrink for test speed; lossless knobs stay as the cfgs set them
        params.minimumImageWidth = 256
        params.minimumImageHeight = 64
        params.frameCount = 1
        params.groupOfFramesSize = 1
        gof = tiny_gof(1)
        _, _, dec, _ = roundtrip(gof, params)
        assert pos_set(gof[0]) == pos_set(dec[0])

    def test_lossless_geometry_cfg_is_geometry_only(self):
        from rabbit_transcoding_tpu.apps.common import build_registry

        params = EncoderParameters()
        reg = build_registry(params)
        reg.parse_config_file(os.path.join(
            CFG_DIR, "common", "ctc-common-lossless-geometry.cfg"
        ))
        reg.apply_to_dataclass(params)
        assert params.losslessGeo and params.noAttributes
        assert not params.losslessAttribute


class TestTranscodeLosslessInput:
    def test_lossless_stream_transcodes_to_lossy(self):
        """A lossless V3C stream through the transcoder at real QPs must
        shrink (first quantisation via decode->re-encode), stay decodable,
        and actually lose precision — not silently pass through."""
        from scipy.spatial import cKDTree

        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )
        from rabbit_transcoding_tpu.transcoder.transcoder import Transcoder

        gof = tiny_gof(1)
        params = small_lossless_params(frameCount=1, groupOfFramesSize=1)
        ctx, _ = Encoder(params).encode(gof)
        data_in = V3CWriter().write(V3CWriter().encode(ctx))
        # r5-class QPs: lossless streams carry no background fill or
        # smoothing SEI, so coarse QPs ring hard at patch borders
        tp = TranscoderParameters(geometryQP=16, attributeQP=22)
        ctx_t = Transcoder(tp).transcode(
            V3CReader().decode(V3CReader().read(data_in)[0])
        )
        data_out = V3CWriter().write(V3CWriter().encode(ctx_t))
        assert len(data_out) < 0.6 * len(data_in)
        dec = Decoder().decode(
            V3CReader().decode(V3CReader().read(data_out)[0])
        )
        dist, _ = cKDTree(dec[0].positions.astype(np.float32)).query(
            gof[0].positions.astype(np.float32), k=1
        )
        assert float(np.mean(dist**2)) < 4.0  # lossy but sane


class TestLowDelayCondition:
    def test_low_delay_cfg_gop(self):
        from rabbit_transcoding_tpu.apps.common import build_registry

        params = EncoderParameters()
        reg = build_registry(params)
        reg.parse_config_file(os.path.join(
            CFG_DIR, "condition", "ctc-low-delay.cfg"
        ))
        reg.apply_to_dataclass(params)
        assert not params.allIntra
        assert params.videoGopSize == 16
        assert params.motionEstimation

    def test_low_delay_e2e(self):
        """One long P chain per GOF decodes and stays within the lossy
        quality gate of the e2e suite."""
        from scipy.spatial import cKDTree

        gof = tiny_gof(4)
        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=12, attributeQP=24,
            allIntra=False, videoGopSize=16, motionEstimation=True,
            frameCount=4, groupOfFramesSize=4,
        )
        _, _, dec, _ = roundtrip(gof, params)
        for src, d in zip(gof, dec):
            dist, _ = cKDTree(d.positions.astype(np.float32)).query(
                src.positions.astype(np.float32), k=1
            )
            assert float(np.mean(dist**2)) < 2.0

    def test_low_delay_stream_has_long_gop(self):
        from rabbit_transcoding_tpu.video import rbv

        gof = tiny_gof(4)
        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            allIntra=False, videoGopSize=16,
            frameCount=4, groupOfFramesSize=4,
        )
        ctx, _ = Encoder(params).encode(gof)
        info = rbv.probe(
            ctx.atlas(0).get_video_bitstream(VideoType.GEOMETRY).data
        )
        # dual-map interleave: GOP spans videoGopSize source frames x 2 maps,
        # clipped to the 8 coded planes of this 4-frame GOF
        assert info["gop_size"] >= 8
