"""HEVC SPS probe against a hand-built spec-conformant SPS."""

from rabbit_transcoding_tpu.bitstream.bitio import BitWriter
from rabbit_transcoding_tpu.video.hevc_probe import (
    _strip_emulation_prevention,
    probe_hevc,
)


def build_sps_rbsp(width=1024, height=1024, bitdepth=10, chroma=1):
    """Assemble an SPS per H.265 §7.3.2.2 field by field."""
    bw = BitWriter()
    bw.u(4, 0)       # sps_video_parameter_set_id
    bw.u(3, 0)       # sps_max_sub_layers_minus1
    bw.u(1, 1)       # sps_temporal_id_nesting_flag
    # profile_tier_level (general only, 0 sub-layers): 12 bytes
    bw.u(8, 0x01)    # profile_space/tier/idc
    bw.u(32, 0x60000000)  # compatibility flags
    bw.u(32, 0x90000000)  # constraint flags hi
    bw.u(16, 0)           # constraint flags lo
    bw.u(8, 120)     # general_level_idc
    bw.ue(0)         # sps_seq_parameter_set_id
    bw.ue(chroma)    # chroma_format_idc
    if chroma == 3:
        bw.u(1, 0)   # separate_colour_plane_flag
    bw.ue(width)
    bw.ue(height)
    bw.u(1, 0)       # conformance_window_flag
    bw.ue(bitdepth - 8)
    bw.ue(bitdepth - 8)
    bw.zero_align()
    return bw.data()


def wrap_annexb_sps(rbsp: bytes) -> bytes:
    # HEVC NAL header: forbidden(1)=0, type(6)=33, layer(6)=0, tid+1(3)=1
    header = bytes([(33 << 1), 1])
    return b"\x00\x00\x00\x01" + header + rbsp + b"\x00\x00\x00\x01" + bytes(
        [(1 << 1), 1]
    ) + b"\xde\xad"


class TestHevcProbe:
    def test_probe_sps(self):
        data = wrap_annexb_sps(build_sps_rbsp(1024, 1024, 10, 1))
        info = probe_hevc(data)
        assert info is not None
        assert info["width"] == 1024 and info["height"] == 1024
        assert info["bitdepth"] == 10 and info["chroma_format_idc"] == 1

    def test_probe_8bit_444(self):
        data = wrap_annexb_sps(build_sps_rbsp(640, 480, 8, 3))
        info = probe_hevc(data)
        assert info["width"] == 640 and info["height"] == 480
        assert info["bitdepth"] == 8 and info["chroma_format_idc"] == 3

    def test_no_sps_returns_none(self):
        data = b"\x00\x00\x00\x01" + bytes([(1 << 1), 1]) + b"\x00\x01"
        assert probe_hevc(data) is None

    def test_emulation_prevention(self):
        assert _strip_emulation_prevention(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
        assert _strip_emulation_prevention(b"\x00\x00\x03\x03") == b"\x00\x00\x03"
        assert _strip_emulation_prevention(b"\x01\x02\x03") == b"\x01\x02\x03"


def build_avc_sps_rbsp(width_mbs=80, height_mbs=45, profile=100, bitdepth=8):
    bw = BitWriter()
    bw.u(8, profile)
    bw.u(8, 0)           # constraints
    bw.u(8, 41)          # level
    bw.ue(0)             # sps id
    if profile == 100:
        bw.ue(1)         # chroma_format_idc 4:2:0
        bw.ue(bitdepth - 8)
        bw.ue(bitdepth - 8)
        bw.u(1, 0)       # transform bypass
        bw.u(1, 0)       # scaling matrix
    bw.ue(4)             # log2_max_frame_num_minus4
    bw.ue(2)             # pic_order_cnt_type (no extra fields)
    bw.ue(4)             # max_num_ref_frames
    bw.u(1, 0)
    bw.ue(width_mbs - 1)
    bw.ue(height_mbs - 1)
    bw.u(1, 1)           # frame_mbs_only
    bw.zero_align()
    return bw.data()


class TestAvcProbe:
    def test_probe_avc_sps(self):
        from rabbit_transcoding_tpu.video.hevc_probe import probe_avc

        rbsp = build_avc_sps_rbsp(80, 45)  # 1280x720
        data = b"\x00\x00\x00\x01" + bytes([0x67]) + rbsp
        info = probe_avc(data)
        assert info is not None
        assert info["width"] == 1280 and info["height"] == 720
        assert info["bitdepth"] == 8

    def test_probe_avc_baseline(self):
        from rabbit_transcoding_tpu.video.hevc_probe import probe_avc

        rbsp = build_avc_sps_rbsp(40, 30, profile=66)  # 640x480 baseline
        data = b"\x00\x00\x00\x01" + bytes([0x67]) + rbsp
        info = probe_avc(data)
        assert info["width"] == 640 and info["height"] == 480


def hevc_nal(nal_type: int, layer_id: int, payload: bytes = b"\x80") -> bytes:
    """Annex-B NAL with the 2-byte HEVC header (type u6 | layer u6 | tid u3)."""
    b0 = (nal_type & 0x3F) << 1 | (layer_id >> 5)
    b1 = ((layer_id & 0x1F) << 3) | 1  # temporal_id_plus1 = 1
    return b"\x00\x00\x00\x01" + bytes([b0, b1]) + payload


class TestShvcLayers:
    def test_layer_ids_and_filter(self):
        from rabbit_transcoding_tpu.video.hevc_probe import (
            filter_hevc_layers,
            hevc_layer_ids,
        )

        stream = (
            hevc_nal(32, 0)      # VPS, base layer
            + hevc_nal(33, 0)    # SPS L0
            + hevc_nal(33, 1)    # SPS L1 (enhancement)
            + hevc_nal(1, 0, b"\x01\x02")   # slice L0
            + hevc_nal(1, 1, b"\x03\x04")   # slice L1
            + hevc_nal(1, 2, b"\x05\x06")   # slice L2
        )
        assert hevc_layer_ids(stream) == {0, 1, 2}
        base = filter_hevc_layers(stream, 0)
        assert hevc_layer_ids(base) == {0}
        assert len(base) < len(stream)
        mid = filter_hevc_layers(stream, 1)
        assert hevc_layer_ids(mid) == {0, 1}
        # idempotent on single-layer streams
        assert filter_hevc_layers(base, 0) == base

    def test_transcoder_drops_enhancement_layers(self):
        from rabbit_transcoding_tpu.bitstream.video_bitstream import (
            VideoBitstream,
        )
        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )
        from rabbit_transcoding_tpu.transcoder.transcoder import Transcoder
        from rabbit_transcoding_tpu.utils.enums import VideoType
        from rabbit_transcoding_tpu.video.hevc_probe import hevc_layer_ids

        class FakeAtlas:
            def __init__(self, vb):
                self.video_bitstreams = {vb.type: vb}

            def set_video_bitstream(self, vb):
                self.video_bitstreams[vb.type] = vb

        stream = hevc_nal(33, 0) + hevc_nal(1, 0) + hevc_nal(1, 1)
        atlas = FakeAtlas(VideoBitstream(VideoType.GEOMETRY, stream))
        tc = Transcoder(TranscoderParameters(shvcLayerIndex=0))
        tc._transcode_video(atlas, VideoType.GEOMETRY, qp=32)
        out = atlas.video_bitstreams[VideoType.GEOMETRY].data
        assert hevc_layer_ids(out) == {0}
