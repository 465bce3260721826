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

    def test_trace_conformance_pair(self, multi_gof_stream, tmp_path,
                                    monkeypatch):
        """--trace enc_ logs (in-memory transcoded context) must conform to
        rabbit-decode --trace dec_ logs (parsed from the written stream),
        per GOF — the endurance run's conformance leg (scripts/
        endurance.sh)."""
        from rabbit_transcoding_tpu.apps import decode as decode_app
        from rabbit_transcoding_tpu.apps import stream as stream_app
        from rabbit_transcoding_tpu.conformance.conformance import (
            ConformanceParams,
            check,
        )

        monkeypatch.chdir(tmp_path)
        assert stream_app.main([
            f"--compressedStreamPath={multi_gof_stream}",
            "--outStreamPath=out.bin",
            "--geometryQP=24", "--attributeQP=32", "--trace",
        ]) == 0
        assert decode_app.main([
            "--compressedStreamPath=out.bin", "--trace",
        ]) == 0
        result = check(ConformanceParams(path=str(tmp_path)))
        assert result.compared_files >= 4 and result.ok, result.report()
        # per-GOF key namespacing: every GOF has its own comparable entry
        pcframe = open("enc_pcframe.txt").read()
        assert all(
            f"gof_{g}_atlas_0_frame_0_checksum" in pcframe for g in range(3)
        ), pcframe
        # the comparator actually bites: flip one decoder-side checksum
        dec = open("dec_pcframe.txt").read()
        open("dec_pcframe.txt", "w").write(
            dec.replace("gof_1_atlas_0_frame_0_checksum = ",
                        "gof_1_atlas_0_frame_0_checksum = 00", 1)
        )
        assert not check(ConformanceParams(path=str(tmp_path))).ok

    def test_trace_survives_crash_resume(self, multi_gof_stream, tmp_path,
                                         monkeypatch):
        """Crash mid-run, resume with --trace: the resumed run APPENDS to
        the prior enc_* logs, so the conformance pair still covers every
        written GOF (the endurance crash-resume scenario; ADVICE r4)."""
        from rabbit_transcoding_tpu.apps import decode as decode_app
        from rabbit_transcoding_tpu.apps import stream as stream_app
        from rabbit_transcoding_tpu.conformance.conformance import (
            ConformanceParams,
            check,
        )

        monkeypatch.chdir(tmp_path)
        argv = [
            f"--compressedStreamPath={multi_gof_stream}",
            "--outStreamPath=out.bin",
            "--geometryQP=24", "--attributeQP=32", "--trace", "--resume",
        ]
        orig = stream_app._StreamIO.write_gof
        tripped = {}

        def boom(self, blob):
            if self.done == 2 and not tripped:
                tripped["x"] = True
                raise OSError("simulated crash before GOF 2's write")
            return orig(self, blob)

        monkeypatch.setattr(stream_app._StreamIO, "write_gof", boom)
        with pytest.raises(OSError):
            stream_app.main(argv)
        # GOFs 0,1 are checkpointed; GOF 2 is not
        assert json.load(open("out.bin.state.json"))["gofs_done"] == 2
        assert stream_app.main(argv) == 0  # resume finishes GOF 2
        assert decode_app.main([
            "--compressedStreamPath=out.bin", "--trace",
        ]) == 0
        result = check(ConformanceParams(path=str(tmp_path)))
        assert result.ok, result.report()
        # all 3 GOFs present on the enc side (run 1 logged 0-2 pre-crash,
        # run 2 appended GOF 2 again — duplicate identical keys are fine)
        pcframe = open("enc_pcframe.txt").read()
        assert all(
            f"gof_{g}_atlas_0_frame_0_checksum" in pcframe for g in range(3)
        ), pcframe

    def test_trace_keys_realign_after_skip(self, multi_gof_stream, tmp_path,
                                           monkeypatch):
        """--onError=skip drops a GOF from the OUTPUT stream; enc trace keys
        must follow output numbering or every later GOF spuriously
        mismatches in conformance (ADVICE r4)."""
        from rabbit_transcoding_tpu.apps import decode as decode_app
        from rabbit_transcoding_tpu.apps import stream as stream_app
        from rabbit_transcoding_tpu.conformance.conformance import (
            ConformanceParams,
            check,
        )

        monkeypatch.chdir(tmp_path)
        poison = V3CReader().read_file(multi_gof_stream)[1]
        orig_decode = V3CReader.decode

        poison_key = [u.payload for u in poison]

        def boom(self, gof):
            if [u.payload for u in gof] == poison_key:
                raise ValueError("poison GOF")
            return orig_decode(self, gof)

        monkeypatch.setattr(V3CReader, "decode", boom)
        rc = stream_app.main([
            f"--compressedStreamPath={multi_gof_stream}",
            "--outStreamPath=out.bin",
            "--geometryQP=24", "--attributeQP=32", "--trace",
            "--onError=skip",
        ])
        assert rc == 2  # failures present
        monkeypatch.setattr(V3CReader, "decode", orig_decode)
        assert len(V3CReader().read_file("out.bin")) == 2
        assert decode_app.main([
            "--compressedStreamPath=out.bin", "--trace",
        ]) == 0
        result = check(ConformanceParams(path=str(tmp_path)))
        assert result.ok, result.report()
        # input GOF 2 landed at output position 1
        pcframe = open("enc_pcframe.txt").read()
        assert "gof_1_atlas_0_frame_0_checksum" in pcframe
        assert "gof_2_" not in pcframe


# ===========================================================================
# --sharded: all streams batched through one mesh-sharded device program,
# byte-identical outputs to the sequential per-stream mode.
# ===========================================================================
@pytest.fixture(scope="module")
def two_streams(tmp_path_factory):
    """Two different 2-GOF streams (different content + input QPs)."""
    d = tmp_path_factory.mktemp("shard")
    writer = V3CWriter()
    paths = []
    for si, (gqp, aqp) in enumerate([(8, 16), (12, 20)]):
        enc = Encoder(EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=gqp, attributeQP=aqp, occupancyPrecision=2,
            groupOfFramesSize=1,
        ))
        units = []
        for gi in range(2):
            ctx, _ = enc.encode(
                GroupOfFrames([make_sphere_cloud(seed=10 * si + gi)])
            )
            units.extend(writer.encode(ctx))
        path = str(d / f"in{si}.bin")
        writer.write_file(units, path)
        paths.append(path)
    return paths


class TestShardedStreams:
    def test_multistream_transcoder_matches_sequential(self, two_streams):
        from rabbit_transcoding_tpu.transcoder.multistream import (
            MultiStreamTranscoder,
        )
        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )
        from rabbit_transcoding_tpu.transcoder.transcoder import Transcoder

        params = TranscoderParameters(geometryQP=28, attributeQP=36)
        reader = V3CReader()

        seq_out = []
        for path in two_streams:
            ctx = reader.decode(reader.read_file(path)[0])
            Transcoder(params).transcode(ctx)
            seq_out.append(V3CWriter().write(V3CWriter().encode(ctx)))

        ctxs = [
            reader.decode(reader.read_file(path)[0]) for path in two_streams
        ]
        MultiStreamTranscoder(params).transcode_many(ctxs)
        bat_out = [V3CWriter().write(V3CWriter().encode(c)) for c in ctxs]
        assert bat_out == seq_out

    def test_app_sharded_matches_unsharded(self, two_streams, tmp_path):
        from rabbit_transcoding_tpu.apps.stream import (
            transcode_streams_sharded,
        )

        params = StreamParams(geometryQP=26, attributeQP=34)
        plain = [str(tmp_path / f"plain{i}.bin") for i in range(2)]
        shard = [str(tmp_path / f"shard{i}.bin") for i in range(2)]
        for i, path in enumerate(two_streams):
            transcode_stream(path, plain[i], params)
        results = transcode_streams_sharded(two_streams, shard, params)
        assert all(r["failures"] == 0 for r in results)
        for p, s in zip(plain, shard):
            assert open(p, "rb").read() == open(s, "rb").read()
            state = json.load(open(s + ".state.json"))
            assert state["gofs_done"] == state["gofs_total"] == 2

    def test_sharded_failure_containment(self, two_streams, tmp_path):
        """A poison GOF in one stream must not take down the other."""
        from rabbit_transcoding_tpu.bitstream.video_bitstream import (
            VideoBitstream,
        )
        from rabbit_transcoding_tpu.utils.enums import VideoType

        reader = V3CReader()
        writer = V3CWriter()
        gofs = reader.read_file(two_streams[0])
        units = list(writer.encode(reader.decode(gofs[0])))
        bad_ctx = reader.decode(gofs[1])
        # neither RBV nor Annex-B: the transcoder must raise (containment)
        bad_ctx.atlas(0).set_video_bitstream(
            VideoBitstream(VideoType.GEOMETRY, b"GARBAGE" * 64)
        )
        units.extend(writer.encode(bad_ctx))
        bad_path = str(tmp_path / "bad.bin")
        writer.write_file(units, bad_path)

        params = StreamParams(
            geometryQP=26, attributeQP=34, onError="skip"
        )
        from rabbit_transcoding_tpu.apps.stream import (
            transcode_streams_sharded,
        )

        outs = [str(tmp_path / f"o{i}.bin") for i in range(2)]
        results = transcode_streams_sharded(
            [bad_path, two_streams[1]], outs, params
        )
        # bad stream: GOF 1 skipped, GOF 0 delivered; good stream: clean
        assert results[0]["failures"] == 1
        assert len(V3CReader().read_file(outs[0])) == 1
        assert results[1]["failures"] == 0
        assert len(V3CReader().read_file(outs[1])) == 2


class TestShardedMixedInputs:
    def test_sharded_plain_plus_predicted_map_stream(self, tmp_path):
        """The sharded driver over a MIX of a plain stream and a
        D1-from-rec-D0 per-map stream: both transcode (the predicted pair
        jointly), byte-identical to the sequential per-stream mode."""
        from rabbit_transcoding_tpu.apps.stream import (
            transcode_stream,
            transcode_streams_sharded,
        )

        writer = V3CWriter()
        paths = []
        for si, extra in enumerate([
            {},
            dict(multipleStreams=True, absoluteD1=False, absoluteT1=False),
        ]):
            enc = Encoder(EncoderParameters(
                minimumImageWidth=256, minimumImageHeight=64,
                geometryQP=10, attributeQP=18, occupancyPrecision=2,
                groupOfFramesSize=1, **extra,
            ))
            ctx, _ = enc.encode(
                GroupOfFrames([make_sphere_cloud(seed=40 + si)])
            )
            path = str(tmp_path / f"mix{si}.bin")
            writer.write_file(writer.encode(ctx), path)
            paths.append(path)
        params = StreamParams(geometryQP=28, attributeQP=36)
        plain = [str(tmp_path / f"p{i}.bin") for i in range(2)]
        shard = [str(tmp_path / f"s{i}.bin") for i in range(2)]
        for i, path in enumerate(paths):
            transcode_stream(path, plain[i], params)
        results = transcode_streams_sharded(paths, shard, params)
        assert all(r["failures"] == 0 for r in results)
        for p, s in zip(plain, shard):
            assert open(p, "rb").read() == open(s, "rb").read()
