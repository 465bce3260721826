"""Per-map video sub-streams (multipleStreams) + predicted map coding
(absoluteD1/absoluteT1 = 0, the ctc-*-D1-from-rec-D0 conditions):
vps_multiple_map_streams_present_flag, vuh_map_index GVD/AVD units, biased
delta coding of map 1 against the reconstructed map 0."""

import numpy as np
from scipy.spatial import cKDTree

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters
from rabbit_transcoding_tpu.utils.enums import VideoType

from test_e2e_codec import make_sphere_cloud


def roundtrip(absolute: bool, frames: int = 2, geo_qp: int = 8):
    src = make_sphere_cloud(seed=3)
    params = EncoderParameters(
        minimumImageWidth=256, minimumImageHeight=64,
        geometryQP=geo_qp, attributeQP=16, occupancyPrecision=2,
        flagGeometrySmoothing=False,
        multipleStreams=True, absoluteD1=absolute, absoluteT1=absolute,
        frameCount=frames, groupOfFramesSize=frames,
    )
    ctx, recon = Encoder(params).encode(GroupOfFrames([src] * frames))
    data = V3CWriter().write(V3CWriter().encode(ctx))
    ctx2 = V3CReader().decode(V3CReader().read(data)[0])
    return src, data, ctx2, Decoder().decode(ctx2), recon


class TestMapStreams:
    def test_stream_structure(self):
        _, _, ctx2, _, _ = roundtrip(absolute=True)
        atlas = ctx2.atlas(0)
        assert VideoType.GEOMETRY not in atlas.video_bitstreams
        assert VideoType.GEOMETRY_D0 in atlas.video_bitstreams
        assert VideoType.GEOMETRY_D1 in atlas.video_bitstreams
        assert VideoType.ATTRIBUTE_T0 in atlas.video_bitstreams
        assert VideoType.ATTRIBUTE_T1 in atlas.video_bitstreams
        va = ctx2.vps.atlas(0)
        assert va.vps_multiple_map_streams_present_flag
        assert va.vps_map_absolute_coding_enabled_flag[1]

    def test_absolute_roundtrip(self):
        src, _, _, dec, recon = roundtrip(absolute=True)
        assert dec[0].compute_checksum() == recon[0].compute_checksum()
        d = cKDTree(dec[0].positions.astype(np.float32)).query(
            src.positions.astype(np.float32), k=1
        )[0]
        assert float(np.mean(d**2)) < 2.0

    def test_predicted_roundtrip_and_flag(self):
        src, _, ctx2, dec, recon = roundtrip(absolute=False)
        va = ctx2.vps.atlas(0)
        assert not va.vps_map_absolute_coding_enabled_flag[1]
        assert dec[0].compute_checksum() == recon[0].compute_checksum()
        d = cKDTree(dec[0].positions.astype(np.float32)).query(
            src.positions.astype(np.float32), k=1
        )[0]
        assert float(np.mean(d**2)) < 2.0

    def test_predicted_d1_stream_is_smaller(self):
        """The whole point of D1-from-rec-D0: at CTC-grade QPs the delta
        stream carries far less energy than the absolute far-layer depth
        (at near-lossless QPs the rec-D0 quantisation noise dominates and
        absolute wins — same trade the reference makes)."""
        _, _, ctx_abs, _, _ = roundtrip(absolute=True, geo_qp=20)
        _, _, ctx_rel, _, _ = roundtrip(absolute=False, geo_qp=20)
        d1_abs = len(
            ctx_abs.atlas(0).get_video_bitstream(VideoType.GEOMETRY_D1).data
        )
        d1_rel = len(
            ctx_rel.atlas(0).get_video_bitstream(VideoType.GEOMETRY_D1).data
        )
        assert d1_rel < d1_abs

    def test_transcode_map_streams(self):
        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )
        from rabbit_transcoding_tpu.transcoder.transcoder import Transcoder

        src, data, _, _, _ = roundtrip(absolute=False)
        ctx = V3CReader().decode(V3CReader().read(data)[0])
        Transcoder(
            TranscoderParameters(geometryQP=24, attributeQP=32)
        ).transcode(ctx)
        out = V3CWriter().write(V3CWriter().encode(ctx))
        assert len(out) < len(data)
        dec = Decoder().decode(V3CReader().decode(V3CReader().read(out)[0]))
        d = cKDTree(dec[0].positions.astype(np.float32)).query(
            src.positions.astype(np.float32), k=1
        )[0]
        assert float(np.mean(d**2)) < 8.0

    def test_cfg_condition_parses(self):
        import os

        from rabbit_transcoding_tpu.apps.common import build_registry

        params = EncoderParameters()
        reg = build_registry(params)
        reg.parse_config_file(os.path.join(
            os.path.dirname(__file__), "..", "cfg", "condition",
            "ctc-all-intra-D1-from-rec-D0.cfg",
        ))
        reg.apply_to_dataclass(params)
        assert params.multipleStreams
        assert not params.absoluteD1 and not params.absoluteT1


class TestDeltaQPAndPTL:
    def test_delta_qp_per_map(self):
        """deltaQPD1/T1: per-map QPs in multipleStreams mode."""
        from rabbit_transcoding_tpu.video import rbv

        src = make_sphere_cloud(seed=3)
        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=16, attributeQP=24, occupancyPrecision=2,
            flagGeometrySmoothing=False, multipleStreams=True,
            deltaQPD1=6, deltaQPT1=4,
            frameCount=1, groupOfFramesSize=1,
        )
        ctx, _ = Encoder(params).encode(GroupOfFrames([src]))
        a = ctx.atlas(0)
        assert rbv.probe(
            a.get_video_bitstream(VideoType.GEOMETRY_D0).data
        )["qp"] == 16
        assert rbv.probe(
            a.get_video_bitstream(VideoType.GEOMETRY_D1).data
        )["qp"] == 22
        assert rbv.probe(
            a.get_video_bitstream(VideoType.ATTRIBUTE_T1).data
        )["qp"] == 28

    def test_ptl_options_land_in_vps(self):
        import numpy as np

        src = make_sphere_cloud(seed=3)
        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            profileCodecGroupIdc=2, profileToolsetIdc=1,
            profileReconstructionIdc=1, levelIdc=60, tierFlag=True,
            frameCount=1, groupOfFramesSize=1,
        )
        ctx, _ = Encoder(params).encode(GroupOfFrames([src]))
        data = V3CWriter().write(V3CWriter().encode(ctx))
        ptl = V3CReader().decode(
            V3CReader().read(data)[0]
        ).vps.profile_tier_level
        assert ptl.ptl_profile_codec_group_idc == 2
        assert ptl.ptl_profile_toolset_idc == 1
        assert ptl.ptl_level_idc == 60
        assert ptl.ptl_tier_flag


class TestAbrOnMapStreams:
    def test_abr_handles_per_map_substreams(self):
        """rate_mode=abr on a multipleStreams input: per-map sub-streams
        get their family budget split by input-size share (round-2 review
        found the old path crashed on the missing GEOMETRY stream)."""
        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )
        from rabbit_transcoding_tpu.transcoder.transcoder import Transcoder

        src, data, _, _, _ = roundtrip(absolute=True)
        ctx = V3CReader().decode(V3CReader().read(data)[0])
        tc = Transcoder(TranscoderParameters(
            rate_mode="abr", targetBitrateMbps=0.5,
        ))
        tc.transcode(ctx)
        out = V3CWriter().write(V3CWriter().encode(ctx))
        assert len(out) < len(data)
        assert any(k.startswith("geo:GEOMETRY_D") for k in tc._rc_cache)
        assert any(k.startswith("attr:ATTRIBUTE_T") for k in tc._rc_cache)
        dec = Decoder().decode(V3CReader().decode(V3CReader().read(out)[0]))
        assert len(dec[0].positions) > 0

    def test_split_absolute_flags_coupled(self):
        """absoluteT1 must ride absoluteD1 (one VPS flag signals both)."""
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters
        from rabbit_transcoding_tpu.encoder.encoder import Encoder

        src = make_sphere_cloud(seed=3)
        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            multipleStreams=True, absoluteD1=True, absoluteT1=False,
            frameCount=1, groupOfFramesSize=1,
        )
        Encoder(params).encode(GroupOfFrames([src]))
        assert params.absoluteT1 == params.absoluteD1 == True  # noqa: E712

    def test_abr_on_predicted_pairs(self):
        """ABR + D1-from-rec-D0: the pair searches jointly (re-deriving the
        delta against the new rec0) instead of requantising the delta
        against a stale reconstruction."""
        from scipy.spatial import cKDTree

        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )
        from rabbit_transcoding_tpu.transcoder.transcoder import Transcoder

        src, data, _, _, _ = roundtrip(absolute=False)
        ctx = V3CReader().decode(V3CReader().read(data)[0])
        tc = Transcoder(TranscoderParameters(
            rate_mode="abr", targetBitrateMbps=0.5,
        ))
        tc.transcode(ctx)
        assert "geo:pair" in tc._rc_cache and "attr:pair" in tc._rc_cache
        out = V3CWriter().write(V3CWriter().encode(ctx))
        dec = Decoder().decode(V3CReader().decode(V3CReader().read(out)[0]))
        d = cKDTree(dec[0].positions.astype(np.float32)).query(
            src.positions.astype(np.float32), k=1
        )[0]
        assert float(np.mean(d**2)) < 8.0
