"""Bitstream robustness: malformed inputs fail cleanly, not catastrophically.

The stream driver's failure containment (rabbit-stream --onError=skip)
relies on every parse/decode error being an ordinary exception — never a
hang, never silent garbage output that passes for success.
"""

import numpy as np
import pytest

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters

from test_e2e_codec import make_sphere_cloud


@pytest.fixture(scope="module")
def good_stream():
    src = make_sphere_cloud(seed=0)
    params = EncoderParameters(
        minimumImageWidth=256, minimumImageHeight=64,
        geometryQP=8, attributeQP=12, occupancyPrecision=2,
    )
    ctx, _ = Encoder(params).encode(GroupOfFrames([src]))
    w = V3CWriter()
    return w.write(w.encode(ctx))


def try_decode(data: bytes):
    reader = V3CReader()
    gofs = reader.read(data)
    for gof in gofs:
        ctx = reader.decode(list(gof))
        Decoder().decode(ctx)


class TestMalformedStreams:
    def test_empty_stream(self):
        with pytest.raises(Exception):
            try_decode(b"")

    def test_garbage_stream(self):
        rng = np.random.default_rng(0)
        with pytest.raises(Exception):
            try_decode(rng.integers(0, 256, 4096, dtype=np.uint8).tobytes())

    def test_truncated_everywhere(self, good_stream):
        """Truncation at any coarse offset either raises or (for cuts that
        only drop whole trailing units) yields fewer-but-valid clouds —
        never a hang or crash-to-death."""
        n = len(good_stream)
        for frac in (0.05, 0.3, 0.6, 0.9, 0.99):
            cut = good_stream[: int(n * frac)]
            try:
                try_decode(cut)
            except Exception:
                pass  # clean failure is the contract

    def test_bitflips_in_payload(self, good_stream):
        """Flipping bytes mid-stream must not hang or segfault; wrong output
        or an exception are both acceptable."""
        for pos in (len(good_stream) // 3, len(good_stream) // 2,
                    2 * len(good_stream) // 3):
            corrupted = bytearray(good_stream)
            corrupted[pos] ^= 0xFF
            try:
                try_decode(bytes(corrupted))
            except Exception:
                pass

    def test_wrong_magic_video_payload(self, good_stream):
        """Replacing a video payload with junk raises (the transcoder path
        asserts this too: unrecognized payload -> ValueError)."""
        from rabbit_transcoding_tpu.bitstream import VideoBitstream
        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )
        from rabbit_transcoding_tpu.transcoder.transcoder import Transcoder
        from rabbit_transcoding_tpu.utils.enums import VideoType

        reader = V3CReader()
        ctx = reader.decode(reader.read(good_stream)[0])
        ctx.atlas(0).set_video_bitstream(
            VideoBitstream(VideoType.GEOMETRY, b"JUNKJUNKJUNK")
        )
        with pytest.raises(Exception):
            Transcoder(TranscoderParameters(computeHashSei=False)).transcode(
                ctx
            )


class TestConcurrencyDeterminism:
    """The race-detection analog (SURVEY.md §5.2): the transcode stack —
    jitted device programs + per-plane host thread pools + the native rANS
    coder via ctypes — must be deterministic under concurrent use (the
    multi-stream driver and the GOF pipeline both rely on it)."""

    def test_concurrent_transcodes_bit_identical(self, good_stream):
        import concurrent.futures as cf

        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )
        from rabbit_transcoding_tpu.transcoder.transcoder import Transcoder
        from rabbit_transcoding_tpu.utils.enums import VideoType

        reader = V3CReader()
        units = reader.read(good_stream)[0]

        def one() -> tuple[bytes, bytes]:
            ctx = V3CReader().decode(list(units))
            Transcoder(TranscoderParameters(
                geometryQP=26, attributeQP=34, computeHashSei=False,
            )).transcode(ctx)
            return (
                ctx.atlas(0).get_video_bitstream(VideoType.GEOMETRY).data,
                ctx.atlas(0).get_video_bitstream(VideoType.ATTRIBUTE).data,
            )

        ref = one()  # sequential reference (also warms the jit cache)
        with cf.ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(lambda _: one(), range(8)))
        for geo, attr in results:
            assert geo == ref[0]
            assert attr == ref[1]

    def test_native_rans_concurrent_roundtrips(self):
        import concurrent.futures as cf

        from rabbit_transcoding_tpu import native

        if not native.available():
            pytest.skip("native rANS not built in this environment")
        rng = np.random.default_rng(3)
        arrays = [
            rng.integers(-300, 300, rng.integers(10, 5000)).astype(np.int16)
            for _ in range(64)
        ]

        def roundtrip(a):
            return native.decompress_i16(native.compress_i16(a), len(a))

        with cf.ThreadPoolExecutor(max_workers=8) as ex:
            outs = list(ex.map(roundtrip, arrays))
        for a, o in zip(arrays, outs):
            assert np.array_equal(a, np.asarray(o))


class TestMalformedRound3Syntax:
    """Round-3 syntax (plri descriptors, ath quantizers, quantDD units):
    bit flips around those fields must raise cleanly, never hang or crash
    the process."""

    @pytest.fixture(scope="class")
    def quantized_plr_stream(self):
        src = make_sphere_cloud(seed=1)
        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=8, attributeQP=12, occupancyPrecision=2,
            mapCountMinus1=0, pointLocalReconstruction=True,
            log2QuantizerSizeX=2, log2QuantizerSizeY=2,
            depthQuantizationStep=64, flagGeometrySmoothing=False,
        )
        ctx, _ = Encoder(params).encode(GroupOfFrames([src]))
        w = V3CWriter()
        return w.write(w.encode(ctx))

    def test_bitflips_everywhere(self, quantized_plr_stream):
        # dense flips through the HLS region (the first KB holds VPS/ASPS/
        # AFPS/ATH incl. the new fields) + samples across the payload
        positions = list(range(0, min(1024, len(quantized_plr_stream)), 7))
        positions += list(range(1024, len(quantized_plr_stream), 4099))
        ok = bad = 0
        for pos in positions:
            corrupted = bytearray(quantized_plr_stream)
            corrupted[pos] ^= 0xFF
            try:
                try_decode(bytes(corrupted))
                ok += 1
            except Exception:
                bad += 1
        # most flips must be caught; any that "succeed" at least returned
        # through the normal path (no hang / crash)
        assert ok + bad == len(positions)

    def test_truncation(self, quantized_plr_stream):
        # contract as in test_truncated_everywhere: clean exception or a
        # valid shorter decode (whole trailing units dropped) — never a hang
        for cut in range(1, len(quantized_plr_stream), 8191):
            try:
                try_decode(quantized_plr_stream[:cut])
            except Exception:
                pass
