"""Config corpus integrity: every condition cfg parses cleanly, the
codec-variant conditions (jm-/shm-/vtm-*, reference cfg/condition names)
bind per-component codec selections to existing codec cfg files, and a
cascade-driven encode through an external (mock) codec works end to end.
"""

import os
import stat
import sys

import pytest

from rabbit_transcoding_tpu.apps.common import build_registry
from rabbit_transcoding_tpu.encoder.params import EncoderParameters

CFG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "cfg")
MOCK = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mock_hevc.py")


def _load(*cfgs):
    params = EncoderParameters()
    reg = build_registry(params)
    for c in cfgs:
        reg.parse_config_file(os.path.join(CFG_DIR, *c.split("/")))
    reg.apply_to_dataclass(params)
    return params, reg


class TestCorpusShape:
    def test_counts_match_reference_corpus(self):
        """SURVEY.md §5.6: condition 35 (reference: 20 ctc + 15 codec
        variants), hm 52, vtm 14 (13 + the file the reference's own
        vtm-all-intra-lossless references but omits), shm 12, jm 10,
        hdrconvert 3."""
        for sub, count in (("condition", 35), ("hm", 52), ("vtm", 14),
                           ("shm", 12), ("jm", 10), ("hdrconvert", 3)):
            names = [f for f in os.listdir(os.path.join(CFG_DIR, sub))
                     if f.endswith(".cfg")]
            assert len(names) == count, (sub, len(names))

    def test_all_condition_cfgs_parse_clean(self):
        for name in sorted(os.listdir(os.path.join(CFG_DIR, "condition"))):
            if not name.endswith(".cfg"):
                continue
            params, reg = _load(f"condition/{name}")
            assert not reg.warnings, (name, reg.warnings)


class TestCodecVariantConditions:
    @pytest.mark.parametrize("name,fam", [
        ("vtm-all-intra.cfg", "VTM_APP"),
        ("vtm-random-access.cfg", "VTM_APP"),
        ("jm-all-intra.cfg", "JM_APP"),
        ("jm-random-access.cfg", "JM_APP"),
    ])
    def test_codec_selection_bound(self, name, fam):
        params, _ = _load(f"condition/{name}")
        assert params.videoEncoderGeometryCodecId == fam
        assert params.videoEncoderAttributeCodecId == fam

    def test_shm_keeps_hm_occupancy(self):
        params, _ = _load("condition/shm-all-intra-2L.cfg")
        assert params.videoEncoderGeometryCodecId == "SHM_APP"
        assert params.videoEncoderOccupancyCodecId == "HM_APP"

    def test_referenced_codec_cfgs_exist(self):
        repo_root = os.path.dirname(CFG_DIR)
        for name in sorted(os.listdir(os.path.join(CFG_DIR, "condition"))):
            if not name.endswith(".cfg"):
                continue
            params, _ = _load(f"condition/{name}")
            for attr in ("occupancyMapConfig", "geometryConfig",
                         "geometryMPConfig", "attributeConfig",
                         "attributeMPConfig"):
                path = getattr(params, attr)
                if path:
                    assert os.path.isfile(os.path.join(repo_root, path)), (
                        name, attr, path)

    def test_lossless_variant_binds_lossless_cfgs(self):
        params, _ = _load("condition/vtm-all-intra-lossless.cfg")
        assert "lossless" in params.geometryConfig
        assert "lossless" in params.attributeConfig


class TestCascadeDrivesExternalCodec:
    def test_vtm_condition_e2e_with_mock(self, tmp_path, monkeypatch):
        """common -> vtm-all-intra cascade + RABBIT_VTM_APP_* env binaries
        (the VTM wrapper shares HM's CLI template) drives a full encode ->
        decode closed loop through the external route."""
        from rabbit_transcoding_tpu.core.gof import GroupOfFrames
        from rabbit_transcoding_tpu.decoder.decoder import Decoder
        from rabbit_transcoding_tpu.encoder.encoder import Encoder
        from rabbit_transcoding_tpu.utils.enums import VideoType
        from rabbit_transcoding_tpu.video import codec_group as cg

        from test_e2e_codec import make_sphere_cloud

        enc = tmp_path / "EncoderApp.sh"
        enc.write_text(
            f'#!/bin/sh\nexec "{sys.executable}" "{MOCK}" encode "$@"\n')
        dec = tmp_path / "DecoderApp.sh"
        dec.write_text(
            f'#!/bin/sh\nexec "{sys.executable}" "{MOCK}" decode "$@"\n')
        for p in (enc, dec):
            os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)
        monkeypatch.setenv("RABBIT_VTM_APP_ENCODER", str(enc))
        monkeypatch.setenv("RABBIT_VTM_APP_DECODER", str(dec))
        # cfg paths in the condition file are repo-root relative
        monkeypatch.chdir(os.path.dirname(CFG_DIR))

        params, _ = _load("common/ctc-common.cfg",
                          "condition/vtm-all-intra.cfg")
        params.frameCount = 1
        params.groupOfFramesSize = 1
        params.minimumImageWidth = 256
        params.minimumImageHeight = 64
        params.geometryQP = 8
        params.attributeQP = 12

        sources = GroupOfFrames([make_sphere_cloud(seed=9)])
        context, recon = Encoder(params).encode(sources)
        assert (context.vps.profile_tier_level.ptl_profile_codec_group_idc
                == cg.CODEC_GROUP_VVC_MAIN10)
        geo = context.atlas(0).get_video_bitstream(VideoType.GEOMETRY).data
        assert geo[:4] == b"\x00\x00\x00\x01"

        clouds = Decoder().decode(context)
        for dec_ps, enc_ps in zip(clouds, recon):
            assert dec_ps.compute_checksum() == enc_ps.compute_checksum()
