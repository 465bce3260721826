"""Conformance traces: encoder and decoder logs must match key-by-key."""

import os

import numpy as np

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.codec.patch_frame import decode_patch_frames
from rabbit_transcoding_tpu.codec.trace import emit_conformance_traces
from rabbit_transcoding_tpu.conformance.conformance import (
    ConformanceParams,
    check,
)
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters
from rabbit_transcoding_tpu.utils.tracing import TraceCategory, Tracer

from test_e2e_codec import make_sphere_cloud


def _run_pair(tmp_path, corrupt=False):
    src = make_sphere_cloud(seed=0)
    enc = Encoder(EncoderParameters(
        minimumImageWidth=256, minimumImageHeight=64,
        geometryQP=8, attributeQP=16, occupancyPrecision=2,
    ))
    ctx, recon = enc.encode(GroupOfFrames([src]))

    t_enc = Tracer(prefix=str(tmp_path / "enc_")).enable(*TraceCategory)
    emit_conformance_traces(
        t_enc, ctx.atlas(0), decode_patch_frames(ctx.atlas(0)), recon
    )
    t_enc.close()

    w = V3CWriter()
    data = w.write(w.encode(ctx))
    ctx2 = V3CReader().decode(V3CReader().read(data)[0])
    clouds = Decoder().decode(ctx2)
    if corrupt:
        clouds[0] = clouds[0].select(np.arange(clouds[0].point_count - 5))
    t_dec = Tracer(prefix=str(tmp_path / "dec_")).enable(*TraceCategory)
    emit_conformance_traces(
        t_dec, ctx2.atlas(0), decode_patch_frames(ctx2.atlas(0)), clouds
    )
    t_dec.close()
    return check(ConformanceParams(path=str(tmp_path)))


class TestConformance:
    def test_matching_run_passes(self, tmp_path):
        res = _run_pair(tmp_path)
        assert res.ok, res.report()
        assert res.compared_files >= 4

    def test_mismatch_detected(self, tmp_path):
        res = _run_pair(tmp_path, corrupt=True)
        assert not res.ok
        assert any("pcframe" in m for m in res.mismatched_keys)

    def test_missing_logs_reported(self, tmp_path):
        os.makedirs(tmp_path / "x", exist_ok=True)
        open(tmp_path / "x" / "enc_hls.txt", "w").write("hls_md5 = abc\n")
        res = check(ConformanceParams(path=str(tmp_path / "x")))
        assert not res.ok and res.missing_files
