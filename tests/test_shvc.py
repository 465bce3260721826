"""SHVC parameter-set parse (PccShvcParser::getVideoSize parity): per-layer
formats resolved through the VPS extension rep_format table, including
enhancement-layer SPSs that carry no picture format at all."""

import numpy as np
import pytest

from rabbit_transcoding_tpu.bitstream.bitio import BitWriter
from rabbit_transcoding_tpu.video.shvc import (
    HEVC_NAL_SPS,
    HEVC_NAL_VPS,
    RepFormat,
    ShvcVps,
    make_nal,
    probe_shvc_layers,
    write_base_sps,
    write_multilayer_sps,
)


def _build_stream(layer_formats, update_idx=None, base_in_vps=True):
    """VPS (rep_format per layer) + per-layer SPSs -> Annex-B bytes."""
    n = len(layer_formats)
    vps = ShvcVps(
        max_layers=n,
        rep_formats=[
            RepFormat(width=w, height=h, bit_depth_luma=bd,
                      bit_depth_chroma=bd, chroma_format_idc=cf)
            for (w, h, bd, cf) in layer_formats
        ],
        rep_format_idx=list(range(n)),
    )
    bw = BitWriter()
    vps.write(bw)
    stream = make_nal(HEVC_NAL_VPS, 0, bw.data())

    w0, h0, bd0, cf0 = layer_formats[0]
    bw = BitWriter()
    write_base_sps(bw, w0, h0, bd0, cf0)
    stream += make_nal(HEVC_NAL_SPS, 0, bw.data())

    for layer in range(1, n):
        bw = BitWriter()
        write_multilayer_sps(
            bw, None if update_idx is None else update_idx[layer]
        )
        stream += make_nal(HEVC_NAL_SPS, layer, bw.data())
    return stream


class TestShvcProbe:
    def test_two_layer_spatial(self):
        """The standard SHM 2x spatial-scalability configuration."""
        stream = _build_stream(
            [(640, 360, 8, 1), (1280, 720, 8, 1)]
        )
        layers = probe_shvc_layers(stream)
        assert layers[0]["width"] == 640 and layers[0]["height"] == 360
        assert layers[1]["width"] == 1280 and layers[1]["height"] == 720
        assert not layers[1]["is444"]

    def test_three_layers_mixed_formats(self):
        stream = _build_stream(
            [(320, 180, 8, 1), (640, 360, 10, 1), (1280, 720, 10, 3)]
        )
        layers = probe_shvc_layers(stream)
        assert layers[1]["bitdepth"] == 10
        assert layers[2]["width"] == 1280
        assert layers[2]["is444"]

    def test_update_rep_format_idx(self):
        """EL SPS with update_rep_format_flag overrides the VPS mapping."""
        stream = _build_stream(
            [(320, 180, 8, 1), (640, 360, 8, 1), (1280, 720, 8, 1)],
            update_idx={1: 2, 2: 1},
        )
        layers = probe_shvc_layers(stream)
        assert layers[1]["width"] == 1280   # idx 2
        assert layers[2]["width"] == 640    # idx 1

    def test_vps_roundtrip(self):
        vps = ShvcVps(
            max_layers=2,
            rep_formats=[
                RepFormat(width=100, height=50),
                RepFormat(width=200, height=100, bit_depth_luma=10,
                          bit_depth_chroma=10),
            ],
            rep_format_idx=[0, 1],
        )
        bw = BitWriter()
        vps.write(bw)
        out = ShvcVps.parse(bw.data())
        assert out.max_layers == 2
        assert [r.width for r in out.rep_formats] == [100, 200]
        assert out.rep_formats[1].bit_depth_luma == 10
        assert out.rep_format_idx == [0, 1]

    def test_emulation_prevention_roundtrip(self):
        """rep_format widths that produce 00 00 0x byte patterns survive
        the escape/strip round trip."""
        stream = _build_stream([(512, 0x0003, 8, 1), (1024, 512, 8, 1)])
        layers = probe_shvc_layers(stream)
        assert layers[0]["height"] == 0x0003 or layers[0]["height"] == 3
        assert layers[1]["width"] == 1024

    def test_plain_hevc_stream_single_layer(self):
        """A non-SHVC stream probes as layer 0 only (no VPS extension
        needed for the base SPS)."""
        bw = BitWriter()
        write_base_sps(bw, 1920, 1080, 10)
        stream = make_nal(HEVC_NAL_SPS, 0, bw.data())
        layers = probe_shvc_layers(stream)
        assert list(layers) == [0]
        assert layers[0] == {
            "width": 1920, "height": 1080, "bitdepth": 10,
            "bitdepth_chroma": 10, "chroma_format_idc": 1, "is444": False,
        }

    def test_multilayer_sps_without_vps_raises(self):
        bw = BitWriter()
        write_multilayer_sps(bw)
        stream = make_nal(HEVC_NAL_SPS, 1, bw.data())
        with pytest.raises(ValueError, match="requires the stream's VPS"):
            probe_shvc_layers(stream)
