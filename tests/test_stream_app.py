"""rabbit-stream: GOF-granular checkpoint/resume + failure containment."""

import json
import os

import numpy as np
import pytest

from rabbit_transcoding_tpu.apps.stream import StreamParams, transcode_stream
from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters

from test_e2e_codec import make_sphere_cloud


@pytest.fixture(scope="module")
def multi_gof_stream(tmp_path_factory):
    """A 3-GOF stream (1 frame per GOF for speed)."""
    enc = Encoder(EncoderParameters(
        minimumImageWidth=256, minimumImageHeight=64,
        geometryQP=8, attributeQP=16, occupancyPrecision=2,
        groupOfFramesSize=1,
    ))
    writer = V3CWriter()
    units = []
    for i in range(3):
        ctx, _ = enc.encode(GroupOfFrames([make_sphere_cloud(seed=i)]))
        units.extend(writer.encode(ctx))
    path = str(tmp_path_factory.mktemp("ms") / "in.bin")
    writer.write_file(units, path)
    return path


class TestStreamDriver:
    def test_full_run_and_valid_output(self, multi_gof_stream, tmp_path):
        out = str(tmp_path / "out.bin")
        res = transcode_stream(
            multi_gof_stream, out,
            StreamParams(geometryQP=24, attributeQP=32),
        )
        assert res["gofs"] == 3 and res["failures"] == 0
        gofs = V3CReader().read_file(out)
        assert len(gofs) == 3
        clouds = Decoder().decode(V3CReader().decode(gofs[1]))
        assert clouds[0].point_count > 0
        state = json.load(open(out + ".state.json"))
        assert state["gofs_done"] == 3
        assert state["out_bytes"] == os.path.getsize(out)

    def test_resume_continues_not_restarts(self, multi_gof_stream, tmp_path):
        out = str(tmp_path / "out.bin")
        params = StreamParams(geometryQP=24, attributeQP=32, resume=True)
        # simulate a crash after GOF 1: run fully, then truncate state+output
        transcode_stream(multi_gof_stream, out, params)
        full = open(out, "rb").read()
        state = json.load(open(out + ".state.json"))
        # truncate to header + first GOF's units (precision 4)
        reader = V3CReader()
        gofs = reader.read(full)
        from rabbit_transcoding_tpu.bitstream.v3c import (
            sample_stream_header,
            write_sample_stream_units,
        )

        first = sample_stream_header(4) + write_sample_stream_units(gofs[0], 4)
        open(out, "wb").write(full[: len(first)])
        state["gofs_done"] = 1
        state["out_bytes"] = len(first)
        json.dump(state, open(out + ".state.json", "w"))

        res = transcode_stream(multi_gof_stream, out, params)
        assert res["gofs"] == 3
        # output identical to the uninterrupted run
        assert open(out, "rb").read() == full
        assert json.load(open(out + ".state.json"))["gofs_done"] == 3

    def test_stale_state_restarts(self, multi_gof_stream, tmp_path):
        out = str(tmp_path / "out.bin")
        params = StreamParams(geometryQP=24, attributeQP=32, resume=True)
        transcode_stream(multi_gof_stream, out, params)
        # change params -> state must be considered stale
        params2 = StreamParams(geometryQP=30, attributeQP=38, resume=True)
        res = transcode_stream(multi_gof_stream, out, params2)
        assert res["gofs"] == 3
        assert json.load(open(out + ".state.json"))["gofs_done"] == 3

    def test_on_error_skip_keeps_going(self, multi_gof_stream, tmp_path):
        # corrupt the middle GOF's video payload so it fails to transcode
        reader = V3CReader()
        gofs = reader.read_file(multi_gof_stream)
        from rabbit_transcoding_tpu.bitstream.v3c import (
            sample_stream_header,
            write_sample_stream_units,
        )
        from rabbit_transcoding_tpu.utils.enums import V3CUnitType

        for u in gofs[1]:
            if u.header.unit_type == V3CUnitType.V3C_GVD:
                u.payload = b"CORRUPT!" + u.payload[8:]
        broken = str(tmp_path / "broken.bin")
        blob = sample_stream_header(4) + b"".join(
            write_sample_stream_units(g, 4) for g in gofs
        )
        open(broken, "wb").write(blob)

        out = str(tmp_path / "out.bin")
        res = transcode_stream(
            broken, out,
            StreamParams(geometryQP=24, attributeQP=32, onError="skip"),
        )
        assert res["failures"] == 1
        # the two healthy GOFs made it through
        assert len(V3CReader().read_file(out)) == 2

        with pytest.raises(Exception):
            transcode_stream(
                broken, str(tmp_path / "out2.bin"),
                StreamParams(geometryQP=24, attributeQP=32, onError="abort"),
            )
