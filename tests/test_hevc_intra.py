"""Compressed all-intra HEVC subset (video/hevc_intra.py) — round-5
verdict task 4: a non-IPCM all-intra Annex-B stream decodes in-tree and
transcodes through the foreign route without any external binary."""

from __future__ import annotations

import numpy as np
import pytest

from rabbit_transcoding_tpu.core.image import Video
from rabbit_transcoding_tpu.utils.enums import ColorFormat
from rabbit_transcoding_tpu.video import hevc_intra, hevc_ipcm
from rabbit_transcoding_tpu.video.hevc_probe import probe_hevc


def make_video(w=80, h=64, frames=2, mono=False, depth=8, seed=0):
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    mx = (1 << depth) - 1
    dt = np.uint8 if depth <= 8 else np.uint16
    y = np.clip(
        gaussian_filter(rng.normal(size=(frames, h, w)), 3) * (mx / 4)
        + mx / 2, 0, mx,
    ).astype(dt)
    planes = [y]
    fmt = ColorFormat.YUV400
    if not mono:
        for _ in range(2):
            planes.append(np.clip(
                gaussian_filter(rng.normal(size=(frames, h // 2, w // 2)),
                                2) * 40 + mx / 2, 0, mx).astype(dt))
        fmt = ColorFormat.YUV420
    return Video(w, h, depth, fmt, planes)


def psnr(a, b, mx):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(mx * mx / mse)


class TestTransforms:
    def test_matrices_are_the_standard(self):
        m16 = hevc_intra._M[16]
        assert list(m16[0]) == [64] * 16
        assert list(m16[1][:8]) == [90, 87, 80, 70, 57, 43, 25, 9]
        assert list(m16[4][:4]) == [83, 36, -36, -83]
        assert list(m16[2][:4]) == [89, 75, 50, 18]

    def test_transform_roundtrip_near_exact(self):
        rng = np.random.default_rng(1)
        for n in (8, 16):
            res = rng.integers(-255, 256, (n, n))
            c = hevc_intra._forward_transform(res, 8)
            # qp 4 => qstep 1: quant/dequant is near-identity
            lev = hevc_intra._quantize(c, 4, 8)
            back = hevc_intra._inverse_transform(
                hevc_intra._dequant(lev, 4, 8), 8)
            assert np.abs(back - res).max() <= 3  # integer-DCT rounding


class TestRoundTrip:
    @pytest.mark.parametrize("mono,depth", [(True, 8), (False, 8),
                                            (True, 10), (False, 10)])
    def test_decodes_and_quality_tracks_qp(self, mono, depth):
        vid = make_video(mono=mono, depth=depth)
        mx = (1 << depth) - 1
        prev_psnr, prev_size = None, None
        for qp in (10, 24, 38):
            bs = hevc_intra.encode(vid, qp)
            dec = hevc_intra.decode(bs)
            assert dec.width == vid.width and dec.height == vid.height
            assert dec.frame_count == vid.frame_count
            p = psnr(dec.planes[0], vid.planes[0], mx)
            if prev_psnr is not None:
                assert p < prev_psnr and len(bs) < prev_size
            prev_psnr, prev_size = p, len(bs)
        assert prev_psnr > 25  # qp38 still a real picture

    def test_deterministic(self):
        vid = make_video()
        assert hevc_intra.encode(vid, 30) == hevc_intra.encode(vid, 30)

    def test_non_ctu_multiple_dims_crop(self):
        vid = make_video(w=70, h=42, mono=True)
        dec = hevc_intra.decode(hevc_intra.encode(vid, 12))
        assert dec.planes[0].shape == vid.planes[0].shape
        assert psnr(dec.planes[0], vid.planes[0], 255) > 40

    def test_busy_content_all_modes_exercised(self):
        # hard edges + gradients force a spread of intra modes and dense
        # residual sub-blocks (stresses csbf/sig/gt1/gt2/remaining paths)
        rng = np.random.default_rng(7)
        y = rng.integers(0, 256, (2, 64, 64)).astype(np.uint8)
        y[:, :, :32] = np.arange(64, dtype=np.uint8)[None, :, None] * 3
        vid = Video(64, 64, 8, ColorFormat.YUV400, [y])
        for qp in (4, 20, 36, 51):
            dec = hevc_intra.decode(hevc_intra.encode(vid, qp))
            assert dec.planes[0].shape == y.shape

    def test_subset_probe(self):
        intra = hevc_intra.encode(make_video(mono=True), 30)
        ipcm = hevc_ipcm.encode(make_video(mono=True))
        assert hevc_intra.is_intra_subset(intra)
        assert not hevc_intra.is_intra_subset(ipcm)
        assert not hevc_ipcm.is_ipcm_subset(intra)
        with pytest.raises(ValueError):
            hevc_intra.decode(ipcm)


class TestProbeInterop:
    def test_own_sps_probe(self):
        info = probe_hevc(hevc_intra.encode(make_video(w=128, h=80), 28))
        assert info is not None
        assert (info["width"], info["height"]) == (128, 80)
        assert info["bitdepth"] == 8

    def test_ten_bit_probe(self):
        info = probe_hevc(
            hevc_intra.encode(make_video(mono=True, depth=10), 28))
        assert info["bitdepth"] == 10


class TestForeignFallback:
    def test_resolve_returns_intra_codec(self, monkeypatch):
        from rabbit_transcoding_tpu.transcoder import foreign
        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )
        from rabbit_transcoding_tpu.utils.enums import VideoType

        monkeypatch.setenv("PATH", "/nonexistent")
        payload = hevc_intra.encode(make_video(mono=True), 30)
        codec = foreign.resolve(
            TranscoderParameters(), VideoType.GEOMETRY, payload=payload
        )
        assert isinstance(codec, foreign.HevcIntraCodec)

    def test_codec_transcodes_at_new_qp(self, monkeypatch):
        """The fallback genuinely changes the rate point: decode ->
        re-encode at a coarser QP shrinks the payload."""
        from rabbit_transcoding_tpu.transcoder import foreign

        vid = make_video(mono=True, w=96, h=64)
        fine = hevc_intra.encode(vid, 10)
        codec = foreign.HevcIntraCodec()
        out = codec.encode(codec.decode(fine), 38)
        assert hevc_intra.is_intra_subset(out)
        assert len(out) < len(fine) // 2
        dec = hevc_intra.decode(out)
        assert psnr(dec.planes[0], vid.planes[0], 255) > 25


# ---------------------------------------------------------------------------
# Reference-parser validation (skipped without /root/reference + g++)
# ---------------------------------------------------------------------------
import shutil  # noqa: E402

from rabbit_transcoding_tpu.conformance import refgate  # noqa: E402

needs_ref = pytest.mark.skipif(
    not (refgate.reference_available() and refgate.hevc_parser_available())
    or shutil.which("g++") is None,
    reason="reference PccLibHevcParser or g++ not available",
)


@needs_ref
class TestReferenceParser:
    @pytest.mark.parametrize(
        "w,h,mono,depth", [(128, 80, False, 8), (96, 64, True, 10),
                           (70, 42, True, 8)]
    )
    def test_reference_parses_our_stream(self, tmp_path, w, h, mono, depth):
        """The reference's own HEVC parser (TDecCavlc::parseSPS via
        PccHevcParser::getVideoSize) reads the COMPRESSED subset's SPS and
        NAL layout — the syntax-level conformance gate available in this
        environment."""
        frames = 2
        data = hevc_intra.encode(
            make_video(w=w, h=h, mono=mono, depth=depth, frames=frames), 30)
        p = tmp_path / "s.265"
        p.write_bytes(data)
        fields = refgate.run_hevcparse(p)
        assert fields["width"] == w
        assert fields["height"] == h
        assert fields["bitdepth"] == depth
        assert fields["is444"] == 0
        assert fields["vps_count"] == 1
        assert fields["sps_count"] == 1
        assert fields["pps_count"] == 1
        assert fields["slice_count"] == frames
