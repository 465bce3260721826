"""Unit tests: the native rANS entropy codec."""

import time


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


import numpy as np
import pytest
import zlib

from rabbit_transcoding_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


class TestRans:
    def test_roundtrip_sparse(self):
        rng = np.random.default_rng(0)
        a = np.zeros(1_000_000, np.int16)
        nz = rng.choice(len(a), 50_000, replace=False)
        a[nz] = rng.integers(-500, 500, len(nz))
        blob = native.compress_i16(a)
        assert np.array_equal(native.decompress_i16(blob, len(a)), a)
        assert len(blob) < len(zlib.compress(a.tobytes(), 6))

    @pytest.mark.parametrize(
        "arr",
        [
            np.zeros(0, np.int16),
            np.zeros(1, np.int16),
            np.zeros(100_000, np.int16),
            np.full(1000, 32767, np.int16),
            np.full(1000, -32768, np.int16),
            np.arange(-300, 300, dtype=np.int16),
        ],
    )
    def test_roundtrip_edges(self, arr):
        blob = native.compress_i16(arr)
        assert np.array_equal(native.decompress_i16(blob, len(arr)), arr)

    def test_roundtrip_random_dense(self):
        rng = np.random.default_rng(1)
        a = rng.integers(-32768, 32767, 200_000).astype(np.int16)
        blob = native.compress_i16(a)
        assert np.array_equal(native.decompress_i16(blob, len(a)), a)

    def test_corrupt_stream_raises(self):
        a = np.arange(1000, dtype=np.int16)
        blob = bytearray(native.compress_i16(a))
        blob[len(blob) // 2] ^= 0xFF
        with pytest.raises(RuntimeError):
            out = native.decompress_i16(bytes(blob), 1000)
            # corruption may decode to wrong values rather than fail the
            # parse; either is acceptable as long as no crash — force a
            # failure if it silently "succeeded" with wrong data
            if not np.array_equal(out, a):
                raise RuntimeError("decoded wrong data (expected)")

    def test_wrong_length_rejected(self):
        a = np.arange(1000, dtype=np.int16)
        blob = native.compress_i16(a)
        with pytest.raises(RuntimeError):
            native.decompress_i16(blob, 999)

    def test_faster_and_smaller_than_zlib_on_coeffs(self):
        import time

        rng = np.random.default_rng(2)
        a = np.zeros(4_000_000, np.int16)
        nz = rng.choice(len(a), 300_000, replace=False)
        a[nz] = rng.integers(-200, 200, len(nz))
        t_r = min(
            _timed(lambda: native.compress_i16(a)) for _ in range(3)
        )
        t_z = min(
            _timed(lambda: zlib.compress(a.tobytes(), 6)) for _ in range(3)
        )
        blob = native.compress_i16(a)
        z = zlib.compress(a.tobytes(), 6)
        assert len(blob) < len(z)
        # best-of-3 to be robust against background load on shared runners
        assert t_r < t_z * 1.2
