"""Attribute dimension partitions + multi-attribute stream routing.

Reference: 23090-5 attribute_information partition syntax
(PCCBitstreamReader.cpp:399-412) and the decoder's per-partition /
per-attribute video routing (PCCDecoder.cpp:208-300) keyed on
vuh_attribute_partition_index / vuh_attribute_index.  Round-2 verdict item:
these were parsed but never routed; this file covers syntax, closed-loop
e2e, remux preservation, and transcoding.
"""

import numpy as np
import pytest

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.bitstream.bitio import BitReader, BitWriter
from rabbit_transcoding_tpu.bitstream.syntax import AttributeInformation
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters
from rabbit_transcoding_tpu.metrics.metrics import MetricsParams, compute_metrics
from rabbit_transcoding_tpu.transcoder.params import TranscoderParameters
from rabbit_transcoding_tpu.transcoder.transcoder import Transcoder
from rabbit_transcoding_tpu.utils.enums import V3CUnitType, VideoType
from rabbit_transcoding_tpu.video import rbv

from test_e2e_codec import make_sphere_cloud


class TestAttributeInformationSyntax:
    def roundtrip(self, ai: AttributeInformation) -> AttributeInformation:
        bw = BitWriter()
        ai.write(bw, False, 0)
        bw.byte_align(0)
        return AttributeInformation.read(BitReader(bw.data()), False, 0)

    def test_three_single_channel_partitions(self):
        """3 partitions of 1 channel each: fully inferred (0 extra bits)."""
        ai = AttributeInformation(
            ai_attribute_count=1, ai_attribute_type_id=[0],
            ai_attribute_codec_id=[0], ai_attribute_dimension_minus1=[2],
            ai_attribute_dimension_partitions_minus1=[2],
            ai_attribute_partition_channels_minus1=[[0, 0, 0]],
            ai_attribute_2d_bitdepth_minus1=[7],
            ai_attribute_msb_align_flag=[False],
        )
        out = self.roundtrip(ai)
        assert out.ai_attribute_dimension_partitions_minus1 == [2]
        assert out.partition_channel_counts(0) == [1, 1, 1]
        # inference covers everything: not a single ue(v) on the wire
        bw_plain = BitWriter()
        AttributeInformation(
            ai_attribute_count=1, ai_attribute_type_id=[0],
            ai_attribute_codec_id=[0], ai_attribute_dimension_minus1=[2],
            ai_attribute_2d_bitdepth_minus1=[7],
            ai_attribute_msb_align_flag=[False],
        ).write(bw_plain, False, 0)
        bw_part = BitWriter()
        ai.write(bw_part, False, 0)
        assert bw_part.size_bytes == bw_plain.size_bytes

    def test_uneven_partition_channels(self):
        """1+2 channel split: the first count is coded, the last inferred
        (the spec's remainingDimensions rule)."""
        ai = AttributeInformation(
            ai_attribute_count=1, ai_attribute_type_id=[0],
            ai_attribute_codec_id=[0], ai_attribute_dimension_minus1=[2],
            ai_attribute_dimension_partitions_minus1=[1],
            ai_attribute_partition_channels_minus1=[[0, 1]],
            ai_attribute_2d_bitdepth_minus1=[7],
            ai_attribute_msb_align_flag=[False],
        )
        out = self.roundtrip(ai)
        assert out.partition_channel_counts(0) == [1, 2]

    def test_unpartitioned_roundtrip(self):
        ai = AttributeInformation(
            ai_attribute_count=1, ai_attribute_type_id=[0],
            ai_attribute_codec_id=[0], ai_attribute_dimension_minus1=[2],
            ai_attribute_2d_bitdepth_minus1=[7],
            ai_attribute_msb_align_flag=[False],
        )
        out = self.roundtrip(ai)
        assert out.ai_attribute_dimension_partitions_minus1 == [0]
        assert out.partition_channel_counts(0) == [3]


def partitioned_params(**over) -> EncoderParameters:
    base = dict(
        minimumImageWidth=256, minimumImageHeight=64,
        geometryQP=16, attributeQP=24, occupancyPrecision=2,
        attributeDimensionPartitions=3,
        frameCount=2, groupOfFramesSize=2,
    )
    base.update(over)
    return EncoderParameters(**base)


class TestPartitionedE2E:
    @pytest.fixture(scope="class")
    def coded(self):
        gof = GroupOfFrames([make_sphere_cloud(seed=i) for i in range(2)])
        ctx, recon = Encoder(partitioned_params()).encode(gof)
        data = V3CWriter().write(V3CWriter().encode(ctx))
        return gof, data

    def test_avd_units_carry_partition_indices(self, coded):
        _, data = coded
        gof_units = V3CReader().read(data)[0]
        avd = [u for u in gof_units
               if u.header.unit_type == V3CUnitType.V3C_AVD]
        parts = sorted(u.header.vuh_attribute_partition_index for u in avd)
        assert parts == [0, 1, 2], parts
        assert all(u.header.vuh_attribute_index == 0 for u in avd)

    def test_remux_preserves_partitions(self, coded):
        """read -> decode -> encode -> write -> re-read: the ext streams
        survive byte-identically."""
        _, data = coded
        r = V3CReader()
        ctx = r.decode(r.read(data)[0])
        assert set(ctx.atlas(0).attr_ext) == {(0, 1, 0), (0, 2, 0)}
        data2 = V3CWriter().write(V3CWriter().encode(ctx))
        ctx2 = r.decode(r.read(data2)[0])
        for key in ((0, 1, 0), (0, 2, 0)):
            assert (ctx2.atlas(0).attr_ext[key].data
                    == ctx.atlas(0).attr_ext[key].data)

    def test_ai_declares_partitions(self, coded):
        _, data = coded
        ctx = V3CReader().decode(V3CReader().read(data)[0])
        ai = ctx.vps.atlas(0).attribute_information
        assert ai.ai_attribute_dimension_partitions_minus1[0] == 2
        assert ai.partition_channel_counts(0) == [1, 1, 1]

    def test_closed_loop_quality_matches_single_stream(self, coded):
        """Decoded quality of the partitioned stream tracks the single-
        stream encode at the same QPs (same transforms, different AVD
        framing)."""
        gof, data = coded
        ctx = V3CReader().decode(V3CReader().read(data)[0])
        clouds = Decoder().decode(ctx)
        m = compute_metrics(gof[0], clouds[0], MetricsParams(resolution=255))
        assert m.d1_psnr > 35, m.d1_psnr
        assert m.color_psnr[0] > 25, m.color_psnr

        ctx_s, _ = Encoder(
            partitioned_params(attributeDimensionPartitions=1)
        ).encode(gof)
        clouds_s = Decoder().decode(ctx_s)
        m_s = compute_metrics(
            gof[0], clouds_s[0], MetricsParams(resolution=255)
        )
        assert abs(m.color_psnr[0] - m_s.color_psnr[0]) < 1.5, (
            m.color_psnr[0], m_s.color_psnr[0]
        )

    def test_transcode_requantizes_all_partitions(self, coded):
        gof, data = coded
        r = V3CReader()
        ctx = r.decode(r.read(data)[0])
        Transcoder(TranscoderParameters(
            geometryQP=30, attributeQP=38, mode="requant",
            computeHashSei=False,
        )).transcode(ctx)
        out = V3CWriter().write(V3CWriter().encode(ctx))
        assert len(out) < len(data)
        ctx2 = r.decode(r.read(out)[0])
        atlas = ctx2.atlas(0)
        assert rbv.probe(
            atlas.get_video_bitstream(VideoType.ATTRIBUTE).data
        )["qp"] == 38
        for key in ((0, 1, 0), (0, 2, 0)):
            assert rbv.probe(atlas.attr_ext[key].data)["qp"] == 38
        clouds = Decoder().decode(ctx2)
        m = compute_metrics(gof[0], clouds[0], MetricsParams(resolution=255))
        assert m.d1_psnr > 30 and m.color_psnr[0] > 20

    def test_partitions_reject_multistream_combo(self):
        gof = GroupOfFrames([make_sphere_cloud(seed=0)])
        with pytest.raises(ValueError, match="cannot combine"):
            Encoder(partitioned_params(
                multipleStreams=True, frameCount=1, groupOfFramesSize=1,
            )).encode(gof)


class TestAbrOnPartitions:
    def test_abr_budgets_partition_streams(self):
        """rate_mode=abr on a partitioned stream: the ext sub-streams join
        the attribute family's budget search (not just follow a QP), and
        the produced video payload total respects the target."""
        gof = GroupOfFrames([make_sphere_cloud(seed=i) for i in range(2)])
        ctx, _ = Encoder(partitioned_params()).encode(gof)
        data = V3CWriter().write(V3CWriter().encode(ctx))
        r = V3CReader()
        ctx2 = r.decode(r.read(data)[0])
        ext_before = {
            k: vb.data for k, vb in ctx2.atlas(0).attr_ext.items()
        }
        target_mbps = 0.5  # tight: forces coarser QPs than the input's 24
        frames = 2
        Transcoder(TranscoderParameters(
            rate_mode="abr", targetBitrateMbps=target_mbps, frameRate=30.0,
            computeHashSei=False,
        )).transcode(ctx2)
        atlas = ctx2.atlas(0)
        for k, before in ext_before.items():
            after = atlas.attr_ext[k].data
            assert after != before
            assert rbv.probe(after)["qp"] > 24  # requantized coarser
        budget = target_mbps * 1e6 / 8.0 * frames / 30.0
        total = sum(
            len(vb.data)
            for vb in list(atlas.video_bitstreams.values())
            + list(atlas.attr_ext.values())
            if vb.data.startswith(b"RBV")
            and not rbv.probe(vb.data)["lossless"]  # occ/aux not budgeted
        )
        assert total <= 1.05 * budget, (total, budget)


class TestReflectanceTranscode:
    def test_lossless_reflectance_passthrough_lossy_attr_requant(self):
        """Transcoding a 2-attribute stream: the lossy texture requantises,
        the lossless reflectance sub-stream passes through untouched."""
        src = make_sphere_cloud(seed=3)
        src.reflectances = (
            (src.positions[:, 0].astype(np.uint32) * 53) % 60000
        ).astype(np.uint16)
        ctx, _ = Encoder(EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=16, attributeQP=24, occupancyPrecision=2,
            frameCount=1, groupOfFramesSize=1,
        )).encode(GroupOfFrames([src]))
        data = V3CWriter().write(V3CWriter().encode(ctx))
        r = V3CReader()
        ctx2 = r.decode(r.read(data)[0])
        refl_before = ctx2.atlas(0).get_video_bitstream(
            VideoType.ATTRIBUTE_REFL
        ).data
        attr_before = ctx2.atlas(0).get_video_bitstream(
            VideoType.ATTRIBUTE
        ).data
        Transcoder(TranscoderParameters(
            geometryQP=30, attributeQP=38, mode="requant",
            computeHashSei=False,
        )).transcode(ctx2)
        atlas = ctx2.atlas(0)
        assert atlas.get_video_bitstream(
            VideoType.ATTRIBUTE_REFL
        ).data == refl_before
        attr_after = atlas.get_video_bitstream(VideoType.ATTRIBUTE).data
        assert attr_after != attr_before
        assert rbv.probe(attr_after)["qp"] == 38
        # the transcoded stream still decodes with exact reflectance videos
        out = V3CWriter().write(V3CWriter().encode(ctx2))
        dec = Decoder().decode(r.decode(r.read(out)[0]))[0]
        assert dec.has_reflectances

