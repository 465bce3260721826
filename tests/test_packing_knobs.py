"""Batch-D packing option parity: useEightOrientations, lowDelayEncoding,
patchPrecedenceOrder and the globalPackingStrategy{GOF,Reset,Threshold}
window knobs (PCCEncoder.cpp:1469-1474,1768-1769,1843,1857;
PCCCodec.cpp:2068-2072).
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "tests")


def _roundtrip(params, n_frames=1):
    from test_e2e_codec import make_sphere_cloud

    from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
    from rabbit_transcoding_tpu.core.gof import GroupOfFrames
    from rabbit_transcoding_tpu.decoder.decoder import Decoder
    from rabbit_transcoding_tpu.encoder.encoder import Encoder

    src = GroupOfFrames([make_sphere_cloud(seed=i) for i in range(n_frames)])
    context, recon = Encoder(params).encode(src)
    data = V3CWriter().write(V3CWriter().encode(context))
    ctx2 = V3CReader().decode(V3CReader().read(data)[0])
    clouds = Decoder().decode(ctx2)
    return src, recon, clouds, ctx2


def _base(**kw):
    from rabbit_transcoding_tpu.encoder.params import EncoderParameters

    return EncoderParameters(
        minimumImageWidth=256, minimumImageHeight=64,
        geometryQP=4, attributeQP=8, frameCount=1, groupOfFramesSize=1, **kw,
    )


class TestUseEightOrientations:
    def test_off_restricts_to_default_and_swap(self):
        from rabbit_transcoding_tpu.utils.enums import PatchOrientation

        src, recon, clouds, ctx2 = _roundtrip(
            _base(useEightOrientations=False)
        )
        from rabbit_transcoding_tpu.codec.patch_frame import (
            decode_patch_frames,
        )

        asps = ctx2.atlas(0).asps_list[0]
        assert not asps.asps_use_eight_orientations_flag
        allowed = {PatchOrientation.DEFAULT, PatchOrientation.SWAP}
        for frame in decode_patch_frames(ctx2.atlas(0)):
            for patch in frame:
                assert PatchOrientation(patch.orientation) in allowed
        for dec, rec in zip(clouds, recon):
            assert dec.compute_checksum() == rec.compute_checksum()

    def test_on_signals_flag(self):
        src, recon, clouds, ctx2 = _roundtrip(
            _base(useEightOrientations=True)
        )
        assert ctx2.atlas(0).asps_list[0].asps_use_eight_orientations_flag


class TestLowDelayEncoding:
    def test_patch_rectangles_never_overlap(self):
        src, recon, clouds, ctx2 = _roundtrip(_base(lowDelayEncoding=True))
        from rabbit_transcoding_tpu.codec.patch_frame import (
            decode_patch_frames,
        )

        # bounding boxes (block units) of all patches must be disjoint
        boxes = []
        for p in decode_patch_frames(ctx2.atlas(0))[0]:
            bu = (p.size_u_pix + p.occupancy_resolution - 1) // (
                p.occupancy_resolution
            )
            bv = (p.size_v_pix + p.occupancy_resolution - 1) // (
                p.occupancy_resolution
            )
            if p.orientation in (1, 2, 4, 6):  # dimension-switching
                bu, bv = bv, bu
            boxes.append((p.u0, p.v0, p.u0 + bu, p.v0 + bv))
        assert len(boxes) >= 2
        for i in range(len(boxes)):
            for j in range(i + 1, len(boxes)):
                a, b = boxes[i], boxes[j]
                assert (
                    a[2] <= b[0] or b[2] <= a[0]
                    or a[3] <= b[1] or b[3] <= a[1]
                ), f"bbox overlap {a} vs {b}"
        for dec, rec in zip(clouds, recon):
            assert dec.compute_checksum() == rec.compute_checksum()


class TestPatchPrecedenceOrder:
    def test_flag_signalled_and_closed_loop_holds(self):
        for flag in (True, False):
            src, recon, clouds, ctx2 = _roundtrip(
                _base(patchPrecedenceOrder=flag)
            )
            asps = ctx2.atlas(0).asps_list[0]
            assert asps.asps_patch_precedence_order_flag == flag
            for dec, rec in zip(clouds, recon):
                assert dec.compute_checksum() == rec.compute_checksum()

    def test_reverse_changes_contested_block_owner(self):
        import jax.numpy as jnp

        from rabbit_transcoding_tpu.ops import reproject as repro_ops

        # two patch bounding boxes overlapping one occupied block
        table = np.zeros((1, 32, repro_ops.PATCH_TABLE_FIELDS), np.int32)
        table[0, 0, :4] = [0, 0, 32, 32]    # patch 0 covers blocks (0..1)^2
        table[0, 1, :4] = [16, 16, 32, 32]  # patch 1 overlaps block (1,1)
        counts = np.asarray([2], np.int32)
        occ = np.ones((1, 48, 48), np.uint8)
        first = np.asarray(repro_ops.block_to_patch(
            jnp.asarray(occ), jnp.asarray(table), jnp.asarray(counts), 16,
        ))
        last = np.asarray(repro_ops.block_to_patch(
            jnp.asarray(occ), jnp.asarray(table), jnp.asarray(counts), 16,
            reverse=True,
        ))
        assert first[0, 1, 1] == 1  # first-coded patch wins
        assert last[0, 1, 1] == 2   # last-coded patch wins
        # uncontested blocks identical
        assert first[0, 0, 0] == last[0, 0, 0] == 1


class TestGlobalPackingStrategyKnobs:
    def _gof(self, n=4):
        """Synthetic matched patch chains across n frames."""
        from rabbit_transcoding_tpu.core.patch import Patch
        from rabbit_transcoding_tpu.encoder.segment import SegmentedPatch

        frames = []
        for fi in range(n):
            segs = []
            for k, size in enumerate((48, 32)):
                patch = Patch(index=k)
                patch.best_match_idx = k if fi > 0 else -1
                occ = np.ones((size, size), bool)
                zero = np.zeros((size, size), np.int32)
                segs.append(SegmentedPatch(
                    patch=patch, depth0=zero, depth1=zero,
                    occupancy=occ, point_indices=np.arange(0),
                ))
            frames.append(segs)
        return frames

    def test_window_and_reset_cut_chains(self):
        from rabbit_transcoding_tpu.encoder.packing import pack_gof_adaptive

        frames = self._gof(4)
        pack_gof_adaptive(frames, 256, 64, block=16,
                          window=2, reset_chains=True)
        # frame 2 starts a new window: reset cleared its inter links
        assert all(s.patch.best_match_idx == -1 for s in frames[2])
        # frames 1 and 3 keep theirs
        assert all(s.patch.best_match_idx >= 0 for s in frames[1])
        assert all(s.patch.best_match_idx >= 0 for s in frames[3])

    def test_area_ratio_threshold_breaks_diverging_chains(self):
        from rabbit_transcoding_tpu.encoder.packing import pack_gof_adaptive

        frames = self._gof(2)
        # shrink frame-1 second patch to ~10% area -> ratio < 0.5
        small = frames[1][1]
        small.occupancy = np.ones((10, 10), bool)
        pack_gof_adaptive(frames, 256, 64, block=16,
                          area_ratio_threshold=0.5)
        # the diverged pair must not share a union position with frame 0
        big0 = frames[0][0].patch
        big1 = frames[1][0].patch
        assert (big0.u0, big0.v0) == (big1.u0, big1.v0)  # intact chain
