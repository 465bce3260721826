"""SEI messages (23090-5 Annex F + raw passthrough).

The reference implements 25 SEI classes (PCCSei.h:43-1762); all are typed
here, including the HRD trio (BufferingPeriod, AtlasFrameTiming — whose bit
widths resolve against the active buffering period — and
SeiPrefixIndication).  Unknown payload types still pass through byte-exactly
as RawSei, which is what the live transcoder needs (SEIs it does not rewrite
must survive the remux unmodified); AtlasFrameTiming also falls back to
RawSei when no buffering period precedes it in the same rbsp.
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
class SeiBufferingPeriod(Sei):
    """bp_* — buffering period (F.2.13, PCCSei.h:761,
    PCCBitstreamReader.cpp:1906).  Self-contained: every variable bit width
    derives from its own length fields."""

    payload_type: int = SeiPayloadType.BUFFERING_PERIOD
    bp_nal_hrd_params_present_flag: bool = False
    bp_acl_hrd_params_present_flag: bool = False
    bp_initial_cab_removal_delay_length_minus1: int = 23
    bp_au_cab_removal_delay_length_minus1: int = 23
    bp_dab_output_delay_length_minus1: int = 23
    bp_irap_cab_params_present_flag: bool = False
    bp_cab_delay_offset: int = 0
    bp_dab_delay_offset: int = 0
    bp_concatenation_flag: bool = False
    bp_atlas_cab_removal_delay_delta_minus1: int = 0
    bp_max_sub_layers_minus1: int = 0
    # per sub-layer: hrd_cab_cnt_minus1 and the 4 delay/offset tables
    # indexed [sub_layer][cab]; alt tables only when irap params present
    bp_hrd_cab_cnt_minus1: list = field(default_factory=list)
    bp_nal_initial_cab_removal_delay: list = field(default_factory=list)
    bp_nal_initial_cab_removal_offset: list = field(default_factory=list)
    bp_nal_initial_alt_cab_removal_delay: list = field(default_factory=list)
    bp_nal_initial_alt_cab_removal_offset: list = field(default_factory=list)
    bp_acl_initial_cab_removal_delay: list = field(default_factory=list)
    bp_acl_initial_cab_removal_offset: list = field(default_factory=list)
    bp_acl_initial_alt_cab_removal_delay: list = field(default_factory=list)
    bp_acl_initial_alt_cab_removal_offset: list = field(default_factory=list)

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(1, self.bp_nal_hrd_params_present_flag)
        bw.u(1, self.bp_acl_hrd_params_present_flag)
        bw.u(5, self.bp_initial_cab_removal_delay_length_minus1)
        bw.u(5, self.bp_au_cab_removal_delay_length_minus1)
        bw.u(5, self.bp_dab_output_delay_length_minus1)
        bw.u(1, self.bp_irap_cab_params_present_flag)
        if self.bp_irap_cab_params_present_flag:
            bw.u(self.bp_au_cab_removal_delay_length_minus1 + 1,
                 self.bp_cab_delay_offset)
            bw.u(self.bp_dab_output_delay_length_minus1 + 1,
                 self.bp_dab_delay_offset)
        bw.u(1, self.bp_concatenation_flag)
        bw.u(self.bp_au_cab_removal_delay_length_minus1 + 1,
             self.bp_atlas_cab_removal_delay_delta_minus1)
        bw.u(3, self.bp_max_sub_layers_minus1)
        nbits = self.bp_initial_cab_removal_delay_length_minus1 + 1
        for i in range(self.bp_max_sub_layers_minus1 + 1):
            bw.u(3, self.bp_hrd_cab_cnt_minus1[i])
            if self.bp_nal_hrd_params_present_flag:
                for j in range(self.bp_hrd_cab_cnt_minus1[i] + 1):
                    bw.u(nbits, self.bp_nal_initial_cab_removal_delay[i][j])
                    bw.u(nbits, self.bp_nal_initial_cab_removal_offset[i][j])
                    if self.bp_irap_cab_params_present_flag:
                        bw.u(nbits,
                             self.bp_nal_initial_alt_cab_removal_delay[i][j])
                        bw.u(nbits,
                             self.bp_nal_initial_alt_cab_removal_offset[i][j])
            if self.bp_acl_hrd_params_present_flag:
                for j in range(self.bp_hrd_cab_cnt_minus1[i] + 1):
                    bw.u(nbits, self.bp_acl_initial_cab_removal_delay[i][j])
                    bw.u(nbits, self.bp_acl_initial_cab_removal_offset[i][j])
                    if self.bp_irap_cab_params_present_flag:
                        bw.u(nbits,
                             self.bp_acl_initial_alt_cab_removal_delay[i][j])
                        bw.u(nbits,
                             self.bp_acl_initial_alt_cab_removal_offset[i][j])
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiBufferingPeriod":
        br = BitReader(payload)
        s = cls()
        s.bp_nal_hrd_params_present_flag = bool(br.u(1))
        s.bp_acl_hrd_params_present_flag = bool(br.u(1))
        s.bp_initial_cab_removal_delay_length_minus1 = br.u(5)
        s.bp_au_cab_removal_delay_length_minus1 = br.u(5)
        s.bp_dab_output_delay_length_minus1 = br.u(5)
        s.bp_irap_cab_params_present_flag = bool(br.u(1))
        if s.bp_irap_cab_params_present_flag:
            s.bp_cab_delay_offset = br.u(
                s.bp_au_cab_removal_delay_length_minus1 + 1
            )
            s.bp_dab_delay_offset = br.u(
                s.bp_dab_output_delay_length_minus1 + 1
            )
        s.bp_concatenation_flag = bool(br.u(1))
        s.bp_atlas_cab_removal_delay_delta_minus1 = br.u(
            s.bp_au_cab_removal_delay_length_minus1 + 1
        )
        s.bp_max_sub_layers_minus1 = br.u(3)
        nbits = s.bp_initial_cab_removal_delay_length_minus1 + 1
        for i in range(s.bp_max_sub_layers_minus1 + 1):
            s.bp_hrd_cab_cnt_minus1.append(br.u(3))
            nd, no, nad, nao = [], [], [], []
            ad, ao, aad, aao = [], [], [], []
            if s.bp_nal_hrd_params_present_flag:
                for _ in range(s.bp_hrd_cab_cnt_minus1[i] + 1):
                    nd.append(br.u(nbits))
                    no.append(br.u(nbits))
                    if s.bp_irap_cab_params_present_flag:
                        nad.append(br.u(nbits))
                        nao.append(br.u(nbits))
            if s.bp_acl_hrd_params_present_flag:
                for _ in range(s.bp_hrd_cab_cnt_minus1[i] + 1):
                    ad.append(br.u(nbits))
                    ao.append(br.u(nbits))
                    if s.bp_irap_cab_params_present_flag:
                        aad.append(br.u(nbits))
                        aao.append(br.u(nbits))
            s.bp_nal_initial_cab_removal_delay.append(nd)
            s.bp_nal_initial_cab_removal_offset.append(no)
            s.bp_nal_initial_alt_cab_removal_delay.append(nad)
            s.bp_nal_initial_alt_cab_removal_offset.append(nao)
            s.bp_acl_initial_cab_removal_delay.append(ad)
            s.bp_acl_initial_cab_removal_offset.append(ao)
            s.bp_acl_initial_alt_cab_removal_delay.append(aad)
            s.bp_acl_initial_alt_cab_removal_offset.append(aao)
        return s


@dataclasses.dataclass
class SeiAtlasFrameTiming(Sei):
    """aft_* — atlas frame timing (F.2.14, PCCSei.h:901).  Bit widths come
    from the active SEIBufferingPeriod (the reference resolves it from its
    persistent SEI store, PCCBitstreamReader.cpp:1456-1459); read_sei_rbsp
    passes the last buffering period seen in the same rbsp and falls back to
    RawSei when none is available."""

    payload_type: int = SeiPayloadType.ATLAS_FRAME_TIMING
    aft_cab_removal_delay_minus1: list = field(default_factory=list)
    aft_dab_output_delay: list = field(default_factory=list)
    # widths captured from the active buffering period at parse/emit time
    au_cab_len: int = 24
    dab_len: int = 24

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        for d, o in zip(self.aft_cab_removal_delay_minus1,
                        self.aft_dab_output_delay):
            bw.u(self.au_cab_len, d)
            bw.u(self.dab_len, o)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(
        cls, payload: bytes, bp: "SeiBufferingPeriod | None" = None
    ) -> "Sei":
        if bp is None:
            return RawSei(
                payload_type=int(SeiPayloadType.ATLAS_FRAME_TIMING),
                payload=payload,
            )
        s = cls(
            au_cab_len=bp.bp_au_cab_removal_delay_length_minus1 + 1,
            dab_len=bp.bp_dab_output_delay_length_minus1 + 1,
        )
        br = BitReader(payload)
        per_layer_bytes = (s.au_cab_len + s.dab_len + 7) // 8
        for _ in range(bp.bp_max_sub_layers_minus1 + 1):
            if br.remaining() < per_layer_bytes:
                break  # cabDabDelaysPresentFlag=false emits no delays
            s.aft_cab_removal_delay_minus1.append(br.u(s.au_cab_len))
            s.aft_dab_output_delay.append(br.u(s.dab_len))
        return s


@dataclasses.dataclass
class SeiPrefixIndication(Sei):
    """spi_* — SEI prefix indication (F.2.12, PCCSei.h:195,
    PCCBitstreamReader.cpp:1602): essential leading bits of another SEI."""

    payload_type: int = SeiPayloadType.SEI_PREFIX_INDICATION
    spi_prefix_sei_payload_type: int = 0
    # list of bit lists; each indication byte-aligns with 1-bits
    spi_prefix_data_bits: list = field(default_factory=list)

    def payload_bytes(self) -> bytes:
        if not self.spi_prefix_data_bits or any(
            not bits for bits in self.spi_prefix_data_bits
        ):
            # the syntax codes counts as minus1: zero indications / zero
            # bits are unrepresentable and would mis-parse on read
            raise ValueError(
                "SeiPrefixIndication needs >=1 indication of >=1 bit"
            )
        bw = BitWriter()
        bw.u(16, self.spi_prefix_sei_payload_type)
        bw.u(8, len(self.spi_prefix_data_bits) - 1)
        for bits in self.spi_prefix_data_bits:
            bw.u(16, len(bits) - 1)
            for b in bits:
                bw.u(1, b)
            while not bw.byte_aligned:
                bw.u(1, 1)  # f(1) alignment bits equal to 1
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiPrefixIndication":
        br = BitReader(payload)
        s = cls()
        s.spi_prefix_sei_payload_type = br.u(16)
        n = br.u(8) + 1
        for _ in range(n):
            nbits = br.u(16) + 1
            s.spi_prefix_data_bits.append([br.u(1) for _ in range(nbits)])
            br.byte_align()
        return s


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


@dataclasses.dataclass
class SeiUserDataUnregistered(Sei):
    payload_type: int = SeiPayloadType.USER_DATA_UNREGISTERED
    uuid: bytes = b"\x00" * 16
    user_data: bytes = b""

    def payload_bytes(self) -> bytes:
        return self.uuid + self.user_data

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiUserDataUnregistered":
        return cls(uuid=payload[:16], user_data=payload[16:])


@dataclasses.dataclass
class SeiFillerPayload(Sei):
    """filler_payload (23090-5 F.2.5): ff_byte run, discarded semantics."""
    payload_type: int = SeiPayloadType.FILLER_PAYLOAD
    size: int = 0

    def payload_bytes(self) -> bytes:
        return b"\xff" * self.size

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiFillerPayload":
        return cls(size=len(payload))


@dataclasses.dataclass
class SeiUserDataRegisteredItuTT35(Sei):
    """user_data_registered_itu_t_t35 (23090-5 F.2.6)."""
    payload_type: int = SeiPayloadType.USER_DATA_REGISTERED_ITUTT35
    country_code: int = 0xB5
    country_code_extension: int = 0      # only coded when country_code==0xFF
    user_data: bytes = b""

    def payload_bytes(self) -> bytes:
        head = bytes([self.country_code])
        if self.country_code == 0xFF:
            head += bytes([self.country_code_extension])
        return head + self.user_data

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiUserDataRegisteredItuTT35":
        cc = payload[0] if payload else 0
        if cc == 0xFF:
            return cls(country_code=cc, country_code_extension=payload[1],
                       user_data=payload[2:])
        return cls(country_code=cc, user_data=payload[1:])


@dataclasses.dataclass
class SeiAtlasObjectInformation(Sei):
    """atlas_object_information / aoi (23090-5 F.2.13): which tracked
    objects appear in which atlases."""
    payload_type: int = SeiPayloadType.ATLAS_OBJECT_INFORMATION
    aoi_persistence_flag: bool = False
    aoi_reset_flag: bool = False
    aoi_num_atlases_minus1: int = 0
    aoi_log2_max_object_idx_tracked_minus1: int = 0
    # [(object_idx, [present_in_atlas_j ...])]
    updates: list = dataclasses.field(default_factory=list)

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(1, self.aoi_persistence_flag)
        bw.u(1, self.aoi_reset_flag)
        bw.u(6, self.aoi_num_atlases_minus1)
        bw.ue(len(self.updates))
        if self.updates:
            bw.u(5, self.aoi_log2_max_object_idx_tracked_minus1)
            obits = self.aoi_log2_max_object_idx_tracked_minus1 + 1
            for obj_idx, present in self.updates:
                bw.u(obits, obj_idx)
                for j in range(self.aoi_num_atlases_minus1 + 1):
                    bw.u(1, bool(present[j]))
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiAtlasObjectInformation":
        br = BitReader(payload)
        s = cls(
            aoi_persistence_flag=bool(br.u(1)),
            aoi_reset_flag=bool(br.u(1)),
            aoi_num_atlases_minus1=br.u(6),
        )
        n = br.ue()
        if n:
            s.aoi_log2_max_object_idx_tracked_minus1 = br.u(5)
            obits = s.aoi_log2_max_object_idx_tracked_minus1 + 1
            for _ in range(n):
                obj_idx = br.u(obits)
                present = [
                    bool(br.u(1))
                    for _ in range(s.aoi_num_atlases_minus1 + 1)
                ]
                s.updates.append((obj_idx, present))
        return s


@dataclasses.dataclass
class SeiPatchInformation(Sei):
    """patch_information / pi (23090-5 F.2.15): per-tile patch->object
    associations.  tiles: [(tile_id, cancel_flag, [(patch_idx, cancel,
    [object_idx ...]) ...]) ...]."""
    payload_type: int = SeiPayloadType.PATCH_INFORMATION
    pi_persistence_flag: bool = False
    pi_reset_flag: bool = False
    pi_log2_max_object_idx_tracked_minus1: int = 0
    pi_log2_max_patch_idx_updated_minus1: int = 0
    tiles: list = dataclasses.field(default_factory=list)

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(1, self.pi_persistence_flag)
        bw.u(1, self.pi_reset_flag)
        bw.ue(len(self.tiles))
        if self.tiles:
            bw.u(5, self.pi_log2_max_object_idx_tracked_minus1)
            bw.u(4, self.pi_log2_max_patch_idx_updated_minus1)
            obits = self.pi_log2_max_object_idx_tracked_minus1 + 1
            pbits = self.pi_log2_max_patch_idx_updated_minus1 + 1
            for tile_id, tile_cancel, patches in self.tiles:
                bw.ue(tile_id)
                bw.u(1, bool(tile_cancel))
                bw.ue(len(patches))
                for patch_idx, cancel, objects in patches:
                    bw.u(pbits, patch_idx)
                    bw.u(1, bool(cancel))
                    if not cancel:
                        bw.ue(len(objects) - 1)
                        for o in objects:
                            bw.u(obits, o)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiPatchInformation":
        br = BitReader(payload)
        s = cls(
            pi_persistence_flag=bool(br.u(1)),
            pi_reset_flag=bool(br.u(1)),
        )
        n_tiles = br.ue()
        if n_tiles:
            s.pi_log2_max_object_idx_tracked_minus1 = br.u(5)
            s.pi_log2_max_patch_idx_updated_minus1 = br.u(4)
            obits = s.pi_log2_max_object_idx_tracked_minus1 + 1
            pbits = s.pi_log2_max_patch_idx_updated_minus1 + 1
            for _ in range(n_tiles):
                tile_id = br.ue()
                tile_cancel = bool(br.u(1))
                patches = []
                for _ in range(br.ue()):
                    patch_idx = br.u(pbits)
                    cancel = bool(br.u(1))
                    objects = []
                    if not cancel:
                        objects = [br.u(obits) for _ in range(br.ue() + 1)]
                    patches.append((patch_idx, cancel, objects))
                s.tiles.append((tile_id, tile_cancel, patches))
        return s


@dataclasses.dataclass
class SeiRecoveryPoint(Sei):
    payload_type: int = SeiPayloadType.RECOVERY_POINT
    rp_recovery_afoc_cnt: int = 0
    rp_exact_match_flag: bool = True
    rp_broken_link_flag: bool = False

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.se(self.rp_recovery_afoc_cnt)
        bw.u(1, self.rp_exact_match_flag)
        bw.u(1, self.rp_broken_link_flag)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiRecoveryPoint":
        br = BitReader(payload)
        return cls(
            rp_recovery_afoc_cnt=br.se(),
            rp_exact_match_flag=bool(br.u(1)),
            rp_broken_link_flag=bool(br.u(1)),
        )


@dataclasses.dataclass
class SeiNoReconstruction(Sei):
    payload_type: int = SeiPayloadType.NO_RECONSTRUCTION

    def payload_bytes(self) -> bytes:
        return b""

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiNoReconstruction":
        return cls()


@dataclasses.dataclass
class SeiTimeCode(Sei):
    payload_type: int = SeiPayloadType.TIME_CODE
    tc_hours: int = 0
    tc_minutes: int = 0
    tc_seconds: int = 0
    tc_n_frames: int = 0

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(5, self.tc_hours)
        bw.u(6, self.tc_minutes)
        bw.u(6, self.tc_seconds)
        bw.u(9, self.tc_n_frames)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiTimeCode":
        br = BitReader(payload)
        return cls(
            tc_hours=br.u(5), tc_minutes=br.u(6), tc_seconds=br.u(6),
            tc_n_frames=br.u(9),
        )


@dataclasses.dataclass
class SeiActiveSubBitstreams(Sei):
    payload_type: int = SeiPayloadType.ACTIVE_SUB_BITSTREAMS
    asb_active_attributes_changes_flag: bool = False
    asb_active_maps_changes_flag: bool = False
    asb_auxiliary_substreams_active_flag: bool = False
    asb_active_attribute_idx: list[int] = field(default_factory=list)
    asb_active_map_idx: list[int] = field(default_factory=list)

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(1, self.asb_active_attributes_changes_flag)
        bw.u(1, self.asb_active_maps_changes_flag)
        bw.u(1, self.asb_auxiliary_substreams_active_flag)
        if self.asb_active_attributes_changes_flag:
            bw.u(7, len(self.asb_active_attribute_idx))
            for i in self.asb_active_attribute_idx:
                bw.u(7, i)
        if self.asb_active_maps_changes_flag:
            bw.u(4, len(self.asb_active_map_idx))
            for i in self.asb_active_map_idx:
                bw.u(4, i)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiActiveSubBitstreams":
        br = BitReader(payload)
        s = cls()
        s.asb_active_attributes_changes_flag = bool(br.u(1))
        s.asb_active_maps_changes_flag = bool(br.u(1))
        s.asb_auxiliary_substreams_active_flag = bool(br.u(1))
        if s.asb_active_attributes_changes_flag:
            n = br.u(7)
            s.asb_active_attribute_idx = [br.u(7) for _ in range(n)]
        if s.asb_active_maps_changes_flag:
            n = br.u(4)
            s.asb_active_map_idx = [br.u(4) for _ in range(n)]
        return s


@dataclasses.dataclass
class SeiObjectLabelInformation(Sei):
    payload_type: int = SeiPayloadType.OBJECT_LABEL_INFORMATION
    oli_cancel_flag: bool = False
    oli_labels: list[tuple[int, str]] = field(default_factory=list)

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(1, self.oli_cancel_flag)
        if not self.oli_cancel_flag:
            bw.ue(len(self.oli_labels))
            for idx, label in self.oli_labels:
                bw.ue(idx)
                raw = label.encode("utf-8")
                bw.ue(len(raw))
                for b in raw:
                    bw.u(8, b)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiObjectLabelInformation":
        br = BitReader(payload)
        s = cls()
        s.oli_cancel_flag = bool(br.u(1))
        if not s.oli_cancel_flag:
            n = br.ue()
            for _ in range(n):
                idx = br.ue()
                ln = br.ue()
                label = bytes(br.u(8) for _ in range(ln)).decode("utf-8")
                s.oli_labels.append((idx, label))
        return s


@dataclasses.dataclass
class SeiVolumetricRectangleInformation(Sei):
    payload_type: int = SeiPayloadType.VOLUMETRIC_RECTANGLE_INFORMATION
    # list of (rect_id, x, y, w, h, object_idx)
    rectangles: list[tuple[int, int, int, int, int, int]] = field(
        default_factory=list
    )

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.ue(len(self.rectangles))
        for rid, x, y, w, h, obj in self.rectangles:
            bw.ue(rid)
            bw.ue(x)
            bw.ue(y)
            bw.ue(w)
            bw.ue(h)
            bw.ue(obj)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiVolumetricRectangleInformation":
        br = BitReader(payload)
        s = cls()
        n = br.ue()
        for _ in range(n):
            s.rectangles.append(
                (br.ue(), br.ue(), br.ue(), br.ue(), br.ue(), br.ue())
            )
        return s


@dataclasses.dataclass
class SeiViewportCameraParameters(Sei):
    payload_type: int = SeiPayloadType.VIEWPORT_CAMERA_PARAMETERS
    vcp_camera_id: int = 0
    vcp_cancel_flag: bool = False
    vcp_camera_type: int = 0       # 0 equirect, 1 perspective, 2 ortho
    vcp_fov_milli_deg: int = 60000
    vcp_aspect_milli: int = 1778

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(10, self.vcp_camera_id)
        bw.u(1, self.vcp_cancel_flag)
        if not self.vcp_cancel_flag:
            bw.u(3, self.vcp_camera_type)
            bw.u(32, self.vcp_fov_milli_deg)
            bw.u(32, self.vcp_aspect_milli)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiViewportCameraParameters":
        br = BitReader(payload)
        s = cls()
        s.vcp_camera_id = br.u(10)
        s.vcp_cancel_flag = bool(br.u(1))
        if not s.vcp_cancel_flag:
            s.vcp_camera_type = br.u(3)
            s.vcp_fov_milli_deg = br.u(32)
            s.vcp_aspect_milli = br.u(32)
        return s


@dataclasses.dataclass
class SeiViewportPosition(Sei):
    payload_type: int = SeiPayloadType.VIEWPORT_POSITION
    vp_viewport_id: int = 0
    vp_camera_attached_flag: bool = False
    vp_position: tuple[int, int, int] = (0, 0, 0)
    vp_rotation_qxyz: tuple[int, int, int] = (0, 0, 0)

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.ue(self.vp_viewport_id)
        bw.u(1, self.vp_camera_attached_flag)
        for c in self.vp_position:
            bw.se(c)
        for c in self.vp_rotation_qxyz:
            bw.se(c)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiViewportPosition":
        br = BitReader(payload)
        s = cls()
        s.vp_viewport_id = br.ue()
        s.vp_camera_attached_flag = bool(br.u(1))
        s.vp_position = (br.se(), br.se(), br.se())
        s.vp_rotation_qxyz = (br.se(), br.se(), br.se())
        return s


@dataclasses.dataclass
class SeiAttributeTransformationParams(Sei):
    payload_type: int = SeiPayloadType.ATTRIBUTE_TRANSFORMATION_PARAMS
    atp_cancel_flag: bool = False
    # (attribute_idx, dimension, scale_q16, offset)
    atp_params: list[tuple[int, int, int, int]] = field(default_factory=list)

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(1, self.atp_cancel_flag)
        if not self.atp_cancel_flag:
            bw.ue(len(self.atp_params))
            for ai, dim, scale, off in self.atp_params:
                bw.u(7, ai)
                bw.u(6, dim)
                bw.u(32, scale)
                bw.se(off)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiAttributeTransformationParams":
        br = BitReader(payload)
        s = cls()
        s.atp_cancel_flag = bool(br.u(1))
        if not s.atp_cancel_flag:
            n = br.ue()
            for _ in range(n):
                s.atp_params.append((br.u(7), br.u(6), br.u(32), br.se()))
        return s


@dataclasses.dataclass
class SeiSceneObjectInformation(Sei):
    payload_type: int = SeiPayloadType.SCENE_OBJECT_INFORMATION
    soi_cancel_flag: bool = False
    # (object_idx, cancel, label_idx, (bx, by, bz, dx, dy, dz) or None)
    objects: list[tuple[int, bool, int, tuple | None]] = field(
        default_factory=list
    )

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(1, self.soi_cancel_flag)
        if not self.soi_cancel_flag:
            bw.ue(len(self.objects))
            for idx, cancel, label, bbox in self.objects:
                bw.ue(idx)
                bw.u(1, cancel)
                if not cancel:
                    bw.ue(label)
                    bw.u(1, bbox is not None)
                    if bbox is not None:
                        for c in bbox:
                            bw.ue(c)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiSceneObjectInformation":
        br = BitReader(payload)
        s = cls()
        s.soi_cancel_flag = bool(br.u(1))
        if not s.soi_cancel_flag:
            n = br.ue()
            for _ in range(n):
                idx = br.ue()
                cancel = bool(br.u(1))
                label = 0
                bbox = None
                if not cancel:
                    label = br.ue()
                    if br.u(1):
                        bbox = tuple(br.ue() for _ in range(6))
                s.objects.append((idx, cancel, label, bbox))
        return s


@dataclasses.dataclass
class SeiManifest(Sei):
    payload_type: int = SeiPayloadType.SEI_MANIFEST
    # (sei_payload_type, description: 0 unknown/1 mandatory/2 optional)
    entries: list[tuple[int, int]] = field(default_factory=list)

    def payload_bytes(self) -> bytes:
        bw = BitWriter()
        bw.u(16, len(self.entries))
        for pt, desc in self.entries:
            bw.u(16, pt)
            bw.u(8, desc)
        bw.zero_align()
        return bw.data()

    @classmethod
    def from_payload(cls, payload: bytes) -> "SeiManifest":
        br = BitReader(payload)
        s = cls()
        n = br.u(16)
        for _ in range(n):
            s.entries.append((br.u(16), br.u(8)))
        return s


_SEI_CLASSES: dict[int, type[Sei]] = {
    SeiPayloadType.USER_DATA_UNREGISTERED: SeiUserDataUnregistered,
    SeiPayloadType.RECOVERY_POINT: SeiRecoveryPoint,
    SeiPayloadType.NO_RECONSTRUCTION: SeiNoReconstruction,
    SeiPayloadType.TIME_CODE: SeiTimeCode,
    SeiPayloadType.ACTIVE_SUB_BITSTREAMS: SeiActiveSubBitstreams,
    SeiPayloadType.OBJECT_LABEL_INFORMATION: SeiObjectLabelInformation,
    SeiPayloadType.VOLUMETRIC_RECTANGLE_INFORMATION: (
        SeiVolumetricRectangleInformation
    ),
    SeiPayloadType.VIEWPORT_CAMERA_PARAMETERS: SeiViewportCameraParameters,
    SeiPayloadType.VIEWPORT_POSITION: SeiViewportPosition,
    SeiPayloadType.ATTRIBUTE_TRANSFORMATION_PARAMS: (
        SeiAttributeTransformationParams
    ),
    SeiPayloadType.SCENE_OBJECT_INFORMATION: SeiSceneObjectInformation,
    SeiPayloadType.SEI_MANIFEST: SeiManifest,
    SeiPayloadType.DECODED_ATLAS_INFORMATION_HASH: SeiDecodedAtlasInformationHash,
    SeiPayloadType.COMPONENT_CODEC_MAPPING: SeiComponentCodecMapping,
    SeiPayloadType.GEOMETRY_SMOOTHING: SeiGeometrySmoothing,
    SeiPayloadType.ATTRIBUTE_SMOOTHING: SeiAttributeSmoothing,
    SeiPayloadType.OCCUPANCY_SYNTHESIS: SeiOccupancySynthesis,
    SeiPayloadType.FILLER_PAYLOAD: SeiFillerPayload,
    SeiPayloadType.USER_DATA_REGISTERED_ITUTT35: SeiUserDataRegisteredItuTT35,
    SeiPayloadType.ATLAS_OBJECT_INFORMATION: SeiAtlasObjectInformation,
    SeiPayloadType.PATCH_INFORMATION: SeiPatchInformation,
    SeiPayloadType.BUFFERING_PERIOD: SeiBufferingPeriod,
    SeiPayloadType.SEI_PREFIX_INDICATION: SeiPrefixIndication,
}
# ATLAS_FRAME_TIMING is typed too, but its bit widths come from the active
# BUFFERING_PERIOD: read_sei_rbsp passes the last one seen in the same rbsp
# and falls back to byte-exact RawSei passthrough when none is available.


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
        if pt == SeiPayloadType.ATLAS_FRAME_TIMING:
            bp = next(
                (s for s in reversed(seis)
                 if isinstance(s, SeiBufferingPeriod)),
                None,
            )
            sei = SeiAtlasFrameTiming.from_payload(payload, bp=bp)
        elif cls is not None:
            sei = cls.from_payload(payload)
        else:
            sei = RawSei(payload_type=pt, payload=payload)
        sei.prefix = prefix
        seis.append(sei)
    return seis
