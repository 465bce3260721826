"""Chroma resampling filter banks + per-patch chroma subsampling
(PCCInternalColorConverter filter tables, PCCVideoEncoder
patchColorSubsampling)."""

import numpy as np
import pytest

from rabbit_transcoding_tpu.ops.color import (
    _DOWN_FILTERS,
    _UP_FILTERS,
    downsample_chroma,
    rgb8_to_yuv420,
    rgb8_to_yuv420_patch_aware,
    rgb_to_yuv709,
    upsample_chroma,
    yuv420_to_rgb8,
)


def _gradient_rgb(h=64, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 3) % 256, (yy * 3) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)[None]


def _roundtrip_psnr(rgb, down, up):
    y, u, v = rgb8_to_yuv420(rgb, down_filter=down)
    out = np.asarray(yuv420_to_rgb8(y, u, v, up_filter=up)).astype(float)
    mse = np.mean((out - rgb.astype(float)) ** 2)
    return 10 * np.log10(255**2 / mse)


class TestFilterBanks:
    def test_all_entries_produce_correct_shapes(self):
        p = np.random.default_rng(0).random((2, 32, 48)).astype(np.float32)
        for f in _DOWN_FILTERS:
            assert downsample_chroma(p, f).shape == (2, 16, 24)
        for f in _UP_FILTERS:
            assert upsample_chroma(p, f).shape == (2, 64, 96)

    def test_constant_plane_preserved(self):
        """All kernels are normalised: DC passes through exactly."""
        p = np.full((1, 16, 16), 0.625, np.float32)
        for f in _DOWN_FILTERS:
            np.testing.assert_allclose(
                np.asarray(downsample_chroma(p, f)), 0.625, atol=1e-6
            )
        for f in _UP_FILTERS:
            np.testing.assert_allclose(
                np.asarray(upsample_chroma(p, f)), 0.625, atol=1e-6
            )

    def test_better_filter_wins_on_gradient(self):
        """The quality test: the selectable filters beat the round-1
        box-down/nearest-up on smooth gradient content."""
        rgb = _gradient_rgb()
        base = _roundtrip_psnr(rgb, "box", "nearest")
        good = _roundtrip_psnr(rgb, 1, 0)  # DF_F1 + UF_F0 (the defaults)
        assert good > base + 1.0  # measured ~+2.1 dB

    def test_filters_selectable_end_to_end(self):
        rgb = _gradient_rgb()
        outs = {
            (d, u): _roundtrip_psnr(rgb, d, u)
            for d, u in [(0, 0), (1, 3), (2, 5), (3, 4)]
        }
        assert len(set(outs.values())) == len(outs)  # all distinct paths


class TestPatchAwareSubsampling:
    def test_stored_chroma_pure_per_patch(self):
        """Two adjacent patches with opposing chroma: the patch-aware path
        stores PURE per-patch chroma at every site (no cross-patch taps),
        where the plain long-tap filter bleeds and rings."""
        pid = np.zeros((1, 64, 64), np.int32)
        pid[:, :, 32:] = 1
        rgb = np.zeros((1, 64, 64, 3), np.uint8)
        rgb[..., :32, 0] = 200
        rgb[..., :32, 2] = 30
        rgb[..., 32:, 1] = 200
        rgb[..., 32:, 2] = 220

        _, u_p0, _ = rgb_to_yuv709(200 / 255.0, 0.0, 30 / 255.0)
        _, u_p1, _ = rgb_to_yuv709(0.0, 200 / 255.0, 220 / 255.0)
        ideal = np.full((32,), round(float(u_p0) * 255))
        ideal[16:] = round(float(u_p1) * 255)

        _, u_plain, _ = rgb8_to_yuv420(rgb, down_filter=2)  # TM5, long taps
        _, u_aware, _ = rgb8_to_yuv420_patch_aware(rgb, pid, down_filter=2)
        err_plain = np.abs(np.asarray(u_plain)[0, 0].astype(int) - ideal)
        err_aware = np.abs(np.asarray(u_aware)[0, 0].astype(int) - ideal)
        assert err_aware.max() <= 1   # pure per patch
        assert err_plain.max() >= 10  # the bleed the patch path removes

    def test_matches_plain_path_on_single_patch(self):
        """One patch only: patch-aware == plain (no substitution fires)."""
        rgb = _gradient_rgb(32, 32)
        pid = np.zeros((1, 32, 32), np.int32)
        a = rgb8_to_yuv420(rgb, down_filter=2)
        b = rgb8_to_yuv420_patch_aware(rgb, pid, down_filter=2)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_encoder_flag_end_to_end(self):
        """patchColorSubsampling + filter selection through the encoder
        cfg: closed loop intact, metrics sane."""
        from rabbit_transcoding_tpu.core.gof import GroupOfFrames
        from rabbit_transcoding_tpu.decoder.decoder import Decoder
        from rabbit_transcoding_tpu.encoder.encoder import Encoder
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters
        from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
        from rabbit_transcoding_tpu.metrics.metrics import (
            MetricsParams,
            compute_metrics,
        )

        from test_e2e_codec import make_sphere_cloud

        sources = GroupOfFrames([make_sphere_cloud(seed=4)])
        enc = Encoder(EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=12, attributeQP=16, occupancyPrecision=2,
            patchColorSubsampling=True, chromaDownsampleFilter=2,
        ))
        context, recon = enc.encode(sources)
        writer = V3CWriter()
        data = writer.write(writer.encode(context))
        reader = V3CReader()
        clouds = Decoder().decode(reader.decode(reader.read(data)[0]))
        # closed loop: encoder recon == decoder output
        assert recon[0].compute_checksum() == clouds[0].compute_checksum()
        m = compute_metrics(sources[0], clouds[0],
                            MetricsParams(resolution=255))
        assert m.color_psnr[0] > 25
