"""Patch-size and min-d quantizers (ath_patch_size_{x,y}_info_quantizer,
ath_pos_min_d_quantizer — log2QuantizerSizeX/Y + depthQuantizationStep)."""

from __future__ import annotations

import numpy as np

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.codec.patch_frame import decode_patch_frames
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters

from test_dualmap import thin_slab_cloud


def roundtrip(src_frames, **kw):
    base = dict(
        minimumImageWidth=128, minimumImageHeight=64,
        geometryQP=4, attributeQP=8, occupancyPrecision=2,
        flagGeometrySmoothing=False,
    )
    base.update(kw)
    enc = Encoder(EncoderParameters(**base))
    ctx, recon = enc.encode(GroupOfFrames(src_frames))
    w = V3CWriter()
    data = w.write(w.encode(ctx))
    ctx2 = V3CReader().decode(V3CReader().read(data)[0])
    return ctx2, Decoder().decode(ctx2), recon


class TestPatchSizeQuantizer:
    def test_sizes_multiples_and_closed_loop(self):
        src = thin_slab_cloud()
        ctx, dec, recon = roundtrip(
            [src], log2QuantizerSizeX=2, log2QuantizerSizeY=3,
        )
        patches = decode_patch_frames(ctx.atlas(0))[0]
        assert patches
        for p in patches:
            assert p.size_u % 4 == 0
            assert p.size_v % 8 == 0
        assert dec[0].compute_checksum() == recon[0].compute_checksum()

    def test_quantized_inter_chain(self):
        src = thin_slab_cloud()
        ctx, dec, recon = roundtrip(
            [src, src, src], log2QuantizerSizeX=2, log2QuantizerSizeY=2,
            constrainedPack=True,
        )
        for d, r in zip(dec, recon):
            assert d.compute_checksum() == r.compute_checksum()

    def test_quality_unaffected_by_padding(self):
        from scipy.spatial import cKDTree

        src = thin_slab_cloud()
        _, dec_q, _ = roundtrip([src], log2QuantizerSizeX=2,
                                log2QuantizerSizeY=2)
        _, dec_0, _ = roundtrip([src])
        dq = cKDTree(dec_q[0].positions).query(src.positions, k=1)[0]
        d0 = cKDTree(dec_0[0].positions).query(src.positions, k=1)[0]
        assert np.mean(dq ** 2) <= np.mean(d0 ** 2) * 1.5 + 0.1


class TestMinDQuantizer:
    def test_d1_multiples_and_closed_loop(self):
        src = thin_slab_cloud()
        ctx, dec, recon = roundtrip([src], depthQuantizationStep=64)
        patches = decode_patch_frames(ctx.atlas(0))[0]
        assert patches
        assert any(
            atl.header.ath_pos_min_d_quantizer == 6
            for atl in ctx.atlas(0).atlas_tile_layers
        )
        for p in patches:
            assert p.d1 % 64 == 0, p.d1
        assert dec[0].compute_checksum() == recon[0].compute_checksum()

    def test_inter_chain_with_min_d(self):
        src = thin_slab_cloud()
        ctx, dec, recon = roundtrip(
            [src, src], depthQuantizationStep=64, constrainedPack=True,
        )
        for d, r in zip(dec, recon):
            assert d.compute_checksum() == r.compute_checksum()


class TestOccupancyAwareRdo:
    """usePccRDO analog: the MC search's distortion masks to occupied
    pixels; the bitstream stays decoder-compatible."""

    def test_weighted_mc_roundtrip_and_weights_ignore_background(self):
        import jax.numpy as jnp
        from rabbit_transcoding_tpu.video import rbv
        from rabbit_transcoding_tpu.core.image import Video
        from rabbit_transcoding_tpu.utils.enums import ColorFormat

        rng = np.random.default_rng(7)
        f, h, w = 4, 32, 32
        frames = np.zeros((f, h, w), np.uint16)
        occ = np.zeros((f, h, w), np.float32)
        # a patch moving +2px/frame over noisy background
        bg = rng.integers(0, 255, size=(f, h, w))
        patch = rng.integers(100, 200, size=(8, 8))
        for i in range(f):
            frames[i] = bg[i]
            frames[i, 8:16, 4 + 2 * i:12 + 2 * i] = patch
            occ[i, 8:16, 4 + 2 * i:12 + 2 * i] = 1.0
        vid = Video(w, h, 8, ColorFormat.YUV400, [frames])
        payload, recon = rbv.encode(vid, rbv.RbvParams(
            qp=8, gop_size=4, motion=True, mc_weight=occ,
        ))
        dec = rbv.decode(payload)
        assert np.array_equal(
            np.asarray(dec.planes[0]), np.asarray(recon.planes[0])
        )

    def test_e2e_use_pcc_rdo(self):
        src = thin_slab_cloud()
        ctx, dec, recon = roundtrip(
            [src, src], usePccRDO=True, apply3dMotionCompensation=True,
            constrainedPack=True,
        )
        for d, r in zip(dec, recon):
            assert d.compute_checksum() == r.compute_checksum()


class TestTranscodeNewSyntax:
    """Streams carrying round-3 syntax (size/min-d quantizers, plri mode
    table) must transcode in every mode with metadata preserved."""

    def test_transcode_quantized_plr_stream(self):
        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )
        from rabbit_transcoding_tpu.transcoder.transcoder import Transcoder

        src = thin_slab_cloud()
        enc = Encoder(EncoderParameters(
            minimumImageWidth=128, minimumImageHeight=64,
            geometryQP=8, attributeQP=12, occupancyPrecision=2,
            mapCountMinus1=0, pointLocalReconstruction=True,
            log2QuantizerSizeX=2, log2QuantizerSizeY=2,
            depthQuantizationStep=64, flagGeometrySmoothing=False,
        ))
        ctx, _ = enc.encode(GroupOfFrames([src, src]))
        w = V3CWriter()
        hq = w.write(w.encode(ctx))
        r = V3CReader()
        for mode in ("reencode", "requant", "auto"):
            c = r.decode(r.read(hq)[0])
            Transcoder(TranscoderParameters(
                geometryQP=24, attributeQP=30, mode=mode,
                computeHashSei=False,
            )).transcode(c)
            out = w.write(w.encode(c))
            c2 = r.decode(r.read(out)[0])
            asps = c2.atlas(0).asps_list[0]
            assert asps.asps_plr_enabled_flag
            assert asps.asps_plr_number_of_modes_minus1 == 5
            atl0 = c2.atlas(0).atlas_tile_layers[0]
            assert atl0.header.ath_pos_min_d_quantizer == 6
            assert atl0.header.ath_patch_size_x_info_quantizer == 2
            clouds = Decoder().decode(c2)
            assert clouds[0].point_count > 0.5 * src.point_count


class TestRangeDQuantizer:
    def test_size_d_quantized_units_roundtrip(self):
        src = thin_slab_cloud()
        ctx, dec, recon = roundtrip(
            [src, src], depthQuantizationStep=64, constrainedPack=True,
        )
        asps = ctx.atlas(0).asps_list[0]
        assert asps.asps_normal_axis_max_delta_value_enabled_flag
        patches = decode_patch_frames(ctx.atlas(0))
        for pl in patches:
            for p in pl:
                # decoded sizeD sits on the quantDD lattice: q*64 - 1 (or 0)
                assert p.size_d == 0 or (p.size_d + 1) % 64 == 0, p.size_d
        for d, r in zip(dec, recon):
            assert d.compute_checksum() == r.compute_checksum()
