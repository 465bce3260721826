"""External app-codec backend, exercised with a stub codec binary."""

import os
import stat

import numpy as np
import pytest

from rabbit_transcoding_tpu.core.image import Video
from rabbit_transcoding_tpu.utils.enums import ColorFormat
from rabbit_transcoding_tpu.video.base import VideoEncoderParams
from rabbit_transcoding_tpu.video.external import (
    ExternalVideoDecoder,
    ExternalVideoEncoder,
)


@pytest.fixture()
def stub_codec(tmp_path):
    """A fake 'codec': encode = copy yuv to bitstream + recon; decode = copy
    back.  Validates the subprocess/temp-file/template plumbing."""
    enc = tmp_path / "stubenc"
    enc.write_text("#!/bin/sh\ncp \"$1\" \"$2\"\ncp \"$1\" \"$3\"\n")
    dec = tmp_path / "stubdec"
    dec.write_text("#!/bin/sh\ncp \"$1\" \"$2\"\n")
    for f in (enc, dec):
        f.chmod(f.stat().st_mode | stat.S_IEXEC)
    return str(enc), str(dec)


def make_video():
    rng = np.random.default_rng(0)
    v = Video.zeros(2, 32, 16, 8, ColorFormat.YUV420)
    for p in v.planes:
        p[...] = rng.integers(0, 255, p.shape)
    return v


class TestExternalBackend:
    def test_roundtrip_through_stub(self, stub_codec):
        enc_bin, dec_bin = stub_codec
        v = make_video()
        enc = ExternalVideoEncoder(
            enc_bin, template="{binary} {input} {output} {recon}"
        )
        payload, recon = enc.encode(v, VideoEncoderParams(qp=30))
        assert len(payload) == sum(p.nbytes for p in v.planes) * 1
        for a, b in zip(v.planes, recon.planes):
            np.testing.assert_array_equal(a, b)

        dec = ExternalVideoDecoder(
            dec_bin, template="{binary} {input} {output}",
            width=32, height=16, frames=2, bitdepth=8,
            fmt=ColorFormat.YUV420,
        )
        out = dec.decode(payload)
        for a, b in zip(v.planes, out.planes):
            np.testing.assert_array_equal(a, b)

    def test_failing_binary_raises(self, tmp_path):
        bad = tmp_path / "bad"
        bad.write_text("#!/bin/sh\nexit 3\n")
        bad.chmod(bad.stat().st_mode | stat.S_IEXEC)
        enc = ExternalVideoEncoder(str(bad), template="{binary} {input}")
        with pytest.raises(RuntimeError, match="external encoder failed"):
            enc.encode(make_video(), VideoEncoderParams())

    def test_factory_errors_without_binary(self):
        from rabbit_transcoding_tpu.utils.enums import CodecId
        from rabbit_transcoding_tpu.video.base import VideoEncoder

        if os.environ.get("PATH") and not any(
            os.path.exists(os.path.join(d, "TAppEncoder"))
            for d in os.environ["PATH"].split(":")
        ):
            with pytest.raises(RuntimeError, match="TAppEncoder"):
                VideoEncoder.create(CodecId.HM_APP)
