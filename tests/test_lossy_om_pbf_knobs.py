"""Batch-C option parity: lossy occupancy-map shaping knobs
(offsetLossyOM / thresholdLossyOM / prefilterLossyOM,
PCCEncoder.cpp:901,920,973) and PBF knobs (pbfPassesCount / pbfFilterSize /
pbfLog2Threshold with the reference's auto-derivation,
PCCEncoderParameters.cpp:222-224,1132-1133).
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "tests")


class TestPrefilterKernel:
    def test_flat_regions_invariant(self):
        import jax.numpy as jnp

        from rabbit_transcoding_tpu.ops.occupancy import prefilter_lossy_om

        flat = np.full((2, 16, 16), 255, np.uint8)
        out = np.asarray(prefilter_lossy_om(jnp.asarray(flat)))
        assert np.array_equal(out, flat)  # kernel sums to 256, >>8 exact
        zero = np.zeros((2, 16, 16), np.uint8)
        assert np.array_equal(
            np.asarray(prefilter_lossy_om(jnp.asarray(zero))), zero
        )

    def test_edges_soften_monotonically(self):
        import jax.numpy as jnp

        from rabbit_transcoding_tpu.ops.occupancy import prefilter_lossy_om

        plane = np.zeros((1, 16, 16), np.uint8)
        plane[0, :, 8:] = 255
        out = np.asarray(prefilter_lossy_om(jnp.asarray(plane)))
        # boundary columns take intermediate values; far columns intact
        assert 0 < out[0, 8, 8] < 255 and 0 < out[0, 8, 7] < 255
        assert out[0, 8, 0] == 0 and out[0, 8, 15] == 255


class TestPbfKnobs:
    def test_auto_derivation_matches_reference(self):
        from rabbit_transcoding_tpu.encoder.encoder import Encoder
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters

        for prec, want_passes in ((1, 1), (2, 1), (4, 2), (8, 4)):
            enc = Encoder(EncoderParameters(
                occupancyPrecision=prec, pbfEnableFlag=True,
            ))
            passes, size, thr = enc._pbf_knobs()
            assert passes == want_passes and size == prec and thr == 4.0

    def test_explicit_knobs_ride_the_sei(self):
        from test_e2e_codec import make_sphere_cloud

        from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
        from rabbit_transcoding_tpu.bitstream.sei import SeiOccupancySynthesis
        from rabbit_transcoding_tpu.core.gof import GroupOfFrames
        from rabbit_transcoding_tpu.decoder.decoder import Decoder
        from rabbit_transcoding_tpu.encoder.encoder import Encoder
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters

        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=4, attributeQP=8, pbfEnableFlag=True,
            pbfPassesCount=1, pbfFilterSize=2, pbfLog2Threshold=3,
            frameCount=1, groupOfFramesSize=1,
        )
        src = GroupOfFrames([make_sphere_cloud(seed=0)])
        context, recon = Encoder(params).encode(src)
        data = V3CWriter().write(V3CWriter().encode(context))
        ctx2 = V3CReader().decode(V3CReader().read(data)[0])
        seis = ctx2.atlas(0).seis_prefix + ctx2.atlas(0).seis_suffix
        sei = next(s for s in seis if isinstance(s, SeiOccupancySynthesis))
        assert sei.os_pbf_passes_count_minus1 == 0
        assert sei.os_pbf_filter_size_minus1 == 1
        assert sei.os_pbf_log2_threshold_minus1 == 2  # 1<<3 -> threshold 8
        # decoder rederives the same knobs -> closed loop checksums
        clouds = Decoder().decode(ctx2)
        for dec, rec in zip(clouds, recon):
            assert dec.compute_checksum() == rec.compute_checksum()


class TestLossyOmKnobs:
    def _encode(self, **kw):
        from test_e2e_codec import make_sphere_cloud

        from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
        from rabbit_transcoding_tpu.core.gof import GroupOfFrames
        from rabbit_transcoding_tpu.decoder.decoder import Decoder
        from rabbit_transcoding_tpu.encoder.encoder import Encoder
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters

        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=4, attributeQP=8, lossyOccupancyMap=True,
            occupancyMapQP=30, frameCount=1, groupOfFramesSize=1, **kw,
        )
        src = GroupOfFrames([make_sphere_cloud(seed=0)])
        context, recon = Encoder(params).encode(src)
        data = V3CWriter().write(V3CWriter().encode(context))
        ctx2 = V3CReader().decode(V3CReader().read(data)[0])
        clouds = Decoder().decode(ctx2)
        return ctx2, recon, clouds

    def test_threshold_rides_occupancy_information(self):
        ctx2, recon, clouds = self._encode(
            offsetLossyOM=200, thresholdLossyOM=100, prefilterLossyOM=True,
        )
        oi = ctx2.vps.atlas(0).occupancy_information
        assert oi.oi_lossy_occupancy_compression_threshold == 100
        for dec, rec in zip(clouds, recon):
            assert dec.compute_checksum() == rec.compute_checksum()

    def test_default_threshold_is_half_offset(self):
        ctx2, recon, clouds = self._encode(offsetLossyOM=64)
        oi = ctx2.vps.atlas(0).occupancy_information
        assert oi.oi_lossy_occupancy_compression_threshold == 32
        for dec, rec in zip(clouds, recon):
            assert dec.compute_checksum() == rec.compute_checksum()
