"""Multi-tile atlas: per-tile ATLs, AFTI origins, reconstruction equality."""

import numpy as np
import pytest

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.codec.patch_frame import decode_patch_frames
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters
from rabbit_transcoding_tpu.metrics.metrics import MetricsParams, compute_metrics

from test_e2e_codec import make_sphere_cloud


def encode_roundtrip(tile_count):
    src = make_sphere_cloud(seed=0)
    enc = Encoder(EncoderParameters(
        minimumImageWidth=256, minimumImageHeight=64,
        geometryQP=8, attributeQP=16, occupancyPrecision=2,
        tileCount=tile_count, flagGeometrySmoothing=False,
    ))
    ctx, recon = enc.encode(GroupOfFrames([src, src]))
    w = V3CWriter()
    data = w.write(w.encode(ctx))
    ctx2 = V3CReader().decode(V3CReader().read(data)[0])
    return src, ctx2, Decoder().decode(ctx2), recon


class TestTiles:
    def test_tile_structure(self):
        src, ctx, clouds, recon = encode_roundtrip(tile_count=2)
        atlas = ctx.atlas(0)
        # 2 frames x 2 tiles = 4 ATLs
        assert len(atlas.atlas_tile_layers) == 4
        ids = {atl.header.ath_id for atl in atlas.atlas_tile_layers}
        assert ids == {0, 1}
        afti = atlas.afps(0).atlas_frame_tile_information
        assert not afti.afti_single_tile_in_atlas_frame_flag
        assert afti.afti_uniform_partition_spacing_flag
        # patch frames group tiles back into 2 frames
        frames = decode_patch_frames(atlas)
        assert len(frames) == 2
        # patches from tile 1 sit in the second band
        band_px = (afti.afti_partition_rows_height_minus1 + 1) * 64
        in_band1 = [
            p for p in frames[0] if p.v0 * p.occupancy_resolution >= band_px
        ]
        assert in_band1, "no patches placed in the second tile band"

    def test_tiled_quality_matches_untiled(self):
        src, _, clouds1, _ = encode_roundtrip(tile_count=1)
        _, _, clouds2, _ = encode_roundtrip(tile_count=2)
        m1 = compute_metrics(src, clouds1[0], MetricsParams(resolution=255))
        m2 = compute_metrics(src, clouds2[0], MetricsParams(resolution=255))
        assert abs(m1.d1_psnr - m2.d1_psnr) < 1.5, (m1.d1_psnr, m2.d1_psnr)
        assert m2.d1_psnr > 35

    def test_tiled_closed_loop(self):
        src, ctx, clouds, recon = encode_roundtrip(tile_count=3)
        for dec, rec in zip(clouds, recon):
            assert dec.compute_checksum() == rec.compute_checksum()
