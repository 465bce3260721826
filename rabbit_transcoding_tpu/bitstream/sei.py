"""SEI messages (23090-5 Annex F subset + raw passthrough).

The reference implements 25 SEI classes (PCCSei.h:43-1762).  This module
implements the ones the pipelines actively produce/consume —
DecodedAtlasInformationHash (the conformance self-check, PCCSei.h:1105),
ComponentCodecMapping (:357), GeometrySmoothing (:1533), AttributeSmoothing
(:1619), OccupancySynthesis (:1449) — and preserves every other payload
byte-exactly through a RawSei passthrough, which is what the live transcoder
needs (SEIs it does not rewrite must survive the remux unmodified).
"""

from __future__ import annotations

import dataclasses
from dataclasses import field

from ..utils.enums import SeiPayloadType
from .bitio import BitReader, BitWriter


@dataclasses.dataclass
class Sei:
    payload_type: int = 0
    prefix: bool = True

    def payload_bytes(self) -> bytes:
        raise NotImplementedError

    @classmethod
    def from_payload(cls, payload: bytes) -> "Sei":
        raise NotImplementedError


@dataclasses.dataclass
class RawSei(Sei):
    """Opaque payload passthrough for SEI types we do not interpret."""

    payload: bytes = b""

    def payload_bytes(self) -> bytes:
        return self.payload


@dataclasses.dataclass
class SeiDecodedAtlasInformationHash(Sei):
    """daih_* — decoded atlas information hash (conformance self-check)."""

    payload_type: int = SeiPayloadType.DECODED_ATLAS_INFORMATION_HASH
    daih_cancel_flag: bool = False
    daih_persistence_flag: bool = True
    daih_hash_type: int = 0  # 0 = MD5, 1 = CRC, 2 = checksum
    daih_decoded_high_level_hash_present_flag: bool = True
    daih_decoded_atlas_hash_present_flag: bool = True
    daih_decoded_atlas_b2p_hash_present_flag: bool = False
    daih_decoded_atlas_tiles_hash_present_flag: bool = False
    daih_decoded_atlas_tiles_b2p_hash_present_flag: bool = False
    high_level_md5: bytes = b"\x00" * 16
    atlas_md5: bytes = b"\x00" * 16
    b2p_md5: bytes = b"\x00" * 16

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(1, self.daih_cancel_flag)
        if not self.daih_cancel_flag:
            bw.u(1, self.daih_persistence_flag)
            bw.u(8, self.daih_hash_type)
            bw.u(1, self.daih_decoded_high_level_hash_present_flag)
            bw.u(1, self.daih_decoded_atlas_hash_present_flag)
            bw.u(1, self.daih_decoded_atlas_b2p_hash_present_flag)
            bw.u(1, self.daih_decoded_atlas_tiles_hash_present_flag)
            bw.u(1, self.daih_decoded_atlas_tiles_b2p_hash_present_flag)
            bw.u(1, 0)  # reserved
            if self.daih_decoded_high_level_hash_present_flag:
                bw.string(self.high_level_md5, 16)
            if self.daih_decoded_atlas_hash_present_flag:
                bw.string(self.atlas_md5, 16)
            if self.daih_decoded_atlas_b2p_hash_present_flag:
                bw.string(self.b2p_md5, 16)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiDecodedAtlasInformationHash":
        br = BitReader(payload)
        s = cls()
        s.daih_cancel_flag = bool(br.u(1))
        if not s.daih_cancel_flag:
            s.daih_persistence_flag = bool(br.u(1))
            s.daih_hash_type = br.u(8)
            s.daih_decoded_high_level_hash_present_flag = bool(br.u(1))
            s.daih_decoded_atlas_hash_present_flag = bool(br.u(1))
            s.daih_decoded_atlas_b2p_hash_present_flag = bool(br.u(1))
            s.daih_decoded_atlas_tiles_hash_present_flag = bool(br.u(1))
            s.daih_decoded_atlas_tiles_b2p_hash_present_flag = bool(br.u(1))
            br.u(1)
            if s.daih_decoded_high_level_hash_present_flag:
                s.high_level_md5 = br.string(16)
            if s.daih_decoded_atlas_hash_present_flag:
                s.atlas_md5 = br.string(16)
            if s.daih_decoded_atlas_b2p_hash_present_flag:
                s.b2p_md5 = br.string(16)
        return s


@dataclasses.dataclass
class SeiComponentCodecMapping(Sei):
    """ccm_* — maps codec indices used in the VPS to 4CC codes.  The
    transcoder rewrites this when it changes the video codec
    (PCCTranscoder.cpp:2110-2243 concept)."""

    payload_type: int = SeiPayloadType.COMPONENT_CODEC_MAPPING
    ccm_codec_mappings_count_minus1: int = 0
    ccm_codec_id: list[int] = field(default_factory=lambda: [0])
    ccm_codec_4cc: list[str] = field(default_factory=lambda: ["rbv1"])

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(8, self.ccm_codec_mappings_count_minus1)
        for i in range(self.ccm_codec_mappings_count_minus1 + 1):
            bw.u(8, self.ccm_codec_id[i])
            fourcc = self.ccm_codec_4cc[i].encode("ascii")[:4].ljust(4, b"\x00")
            bw.string(fourcc, 4)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiComponentCodecMapping":
        br = BitReader(payload)
        s = cls(ccm_codec_id=[], ccm_codec_4cc=[])
        s.ccm_codec_mappings_count_minus1 = br.u(8)
        for _ in range(s.ccm_codec_mappings_count_minus1 + 1):
            s.ccm_codec_id.append(br.u(8))
            s.ccm_codec_4cc.append(br.string(4).rstrip(b"\x00").decode("ascii"))
        return s


@dataclasses.dataclass
class SeiGeometrySmoothing(Sei):
    """gs_* — decoder-side geometry smoothing parameters (grid smoothing)."""

    payload_type: int = SeiPayloadType.GEOMETRY_SMOOTHING
    gs_smoothing_persistence_flag: bool = True
    gs_smoothing_instances_updated: int = 1
    gs_smoothing_instance_cancel_flag: bool = False
    gs_smoothing_method_type: int = 1  # 1 = grid smoothing
    gs_smoothing_grid_size_minus2: int = 6
    gs_smoothing_threshold: int = 64

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(1, self.gs_smoothing_persistence_flag)
        bw.u(8, self.gs_smoothing_instances_updated)
        bw.u(1, self.gs_smoothing_instance_cancel_flag)
        if not self.gs_smoothing_instance_cancel_flag:
            bw.u(8, self.gs_smoothing_method_type)
            bw.u(8, self.gs_smoothing_grid_size_minus2)
            bw.u(8, self.gs_smoothing_threshold)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiGeometrySmoothing":
        br = BitReader(payload)
        s = cls()
        s.gs_smoothing_persistence_flag = bool(br.u(1))
        s.gs_smoothing_instances_updated = br.u(8)
        s.gs_smoothing_instance_cancel_flag = bool(br.u(1))
        if not s.gs_smoothing_instance_cancel_flag:
            s.gs_smoothing_method_type = br.u(8)
            s.gs_smoothing_grid_size_minus2 = br.u(8)
            s.gs_smoothing_threshold = br.u(8)
        return s


@dataclasses.dataclass
class SeiAttributeSmoothing(Sei):
    """as_* — decoder-side attribute (color) smoothing parameters."""

    payload_type: int = SeiPayloadType.ATTRIBUTE_SMOOTHING
    as_smoothing_persistence_flag: bool = True
    as_smoothing_grid_size_minus2: int = 6
    as_smoothing_threshold: int = 64
    as_smoothing_local_entropy_threshold: int = 4
    as_smoothing_threshold_variation: int = 255
    as_smoothing_threshold_difference: int = 255

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(1, self.as_smoothing_persistence_flag)
        bw.u(8, self.as_smoothing_grid_size_minus2)
        bw.u(8, self.as_smoothing_threshold)
        bw.u(8, self.as_smoothing_local_entropy_threshold)
        bw.u(8, self.as_smoothing_threshold_variation)
        bw.u(8, self.as_smoothing_threshold_difference)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiAttributeSmoothing":
        br = BitReader(payload)
        s = cls()
        s.as_smoothing_persistence_flag = bool(br.u(1))
        s.as_smoothing_grid_size_minus2 = br.u(8)
        s.as_smoothing_threshold = br.u(8)
        s.as_smoothing_local_entropy_threshold = br.u(8)
        s.as_smoothing_threshold_variation = br.u(8)
        s.as_smoothing_threshold_difference = br.u(8)
        return s


@dataclasses.dataclass
class SeiOccupancySynthesis(Sei):
    """os_* — occupancy synthesis (PBF) parameters."""

    payload_type: int = SeiPayloadType.OCCUPANCY_SYNTHESIS
    os_persistence_flag: bool = True
    os_method_type: int = 1
    os_pbf_log2_threshold_minus1: int = 1
    os_pbf_passes_count_minus1: int = 1
    os_pbf_filter_size_minus1: int = 2

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(1, self.os_persistence_flag)
        bw.u(8, self.os_method_type)
        bw.u(2, self.os_pbf_log2_threshold_minus1)
        bw.u(2, self.os_pbf_passes_count_minus1)
        bw.u(3, self.os_pbf_filter_size_minus1)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiOccupancySynthesis":
        br = BitReader(payload)
        s = cls()
        s.os_persistence_flag = bool(br.u(1))
        s.os_method_type = br.u(8)
        s.os_pbf_log2_threshold_minus1 = br.u(2)
        s.os_pbf_passes_count_minus1 = br.u(2)
        s.os_pbf_filter_size_minus1 = br.u(3)
        return s


_SEI_CLASSES: dict[int, type[Sei]] = {
    SeiPayloadType.DECODED_ATLAS_INFORMATION_HASH: SeiDecodedAtlasInformationHash,
    SeiPayloadType.COMPONENT_CODEC_MAPPING: SeiComponentCodecMapping,
    SeiPayloadType.GEOMETRY_SMOOTHING: SeiGeometrySmoothing,
    SeiPayloadType.ATTRIBUTE_SMOOTHING: SeiAttributeSmoothing,
    SeiPayloadType.OCCUPANCY_SYNTHESIS: SeiOccupancySynthesis,
}


def write_sei_rbsp(bw: BitWriter, seis: list[Sei]) -> None:
    """sei_rbsp: repeated sei_message with 0xFF-extended type/size coding."""
    for sei in seis:
        pt = int(sei.payload_type)
        while pt >= 255:
            bw.u(8, 255)
            pt -= 255
        bw.u(8, pt)
        payload = sei.payload_bytes()
        size = len(payload)
        while size >= 255:
            bw.u(8, 255)
            size -= 255
        bw.u(8, size)
        bw.write_bytes(payload)
    bw.byte_align()


def read_sei_rbsp(br: BitReader, prefix: bool) -> list[Sei]:
    seis: list[Sei] = []
    while br.remaining() > 1:
        pt = 0
        b = br.u(8)
        while b == 255:
            pt += 255
            b = br.u(8)
        pt += b
        size = 0
        b = br.u(8)
        while b == 255:
            size += 255
            b = br.u(8)
        size += b
        payload = br.read_bytes(size)
        cls = _SEI_CLASSES.get(pt)
        if cls is not None:
            sei = cls.from_payload(payload)
        else:
            sei = RawSei(payload_type=pt, payload=payload)
        sei.prefix = prefix
        seis.append(sei)
    return seis
