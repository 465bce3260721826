"""Multi-stream transcoder: N GOF contexts through one sharded device program.

The product-path integration of parallel/multistream.py (BASELINE.json
config #5: N concurrent 8i sequences, batched live transcode).  Everything a
single-stream Transcoder does per GOF happens here too — occupancy
downscale, hash-SEI refresh, foreign-payload handling, ABR — but the video
hot loop (geometry + attribute of ALL streams) runs as ONE batched, mesh-
sharded device call per plane instead of N sequential ones.

Output contract: byte-identical bitstreams to running Transcoder.transcode
on each context separately (tests/test_parallel.py asserts this).
"""

from __future__ import annotations

from jax.sharding import Mesh

from ..bitstream.hls import Context
from ..bitstream.video_bitstream import VideoBitstream
from ..parallel.mesh import make_mesh
from ..parallel.multistream import transcode_payloads
from ..utils.enums import VideoType
from ..utils.timing import StageTimer
from ..video import rbv
from .params import TranscoderParameters
from .transcoder import Transcoder


def _map1_absolute(ctx: Context) -> bool:
    return ctx.map1_absolute()


class MultiStreamTranscoder:
    def __init__(
        self,
        params: TranscoderParameters | None = None,
        mesh: Mesh | None = None,
    ):
        self.params = params or TranscoderParameters()
        self.mesh = mesh if mesh is not None else make_mesh()
        self.timer = StageTimer()
        # one per-stream Transcoder each: keeps per-stream state (ABR QP
        # cache) correct and reuses all non-video stages unchanged
        self._singles: list[Transcoder] = []

    def single(self, i: int) -> Transcoder:
        """Stream i's own Transcoder (per-stream ABR QP cache lives here)."""
        while len(self._singles) <= i:
            self._singles.append(Transcoder(self.params))
        return self._singles[i]

    # ------------------------------------------------------------------
    def transcode_many(
        self,
        contexts: list[Context],
        stream_ids: list[int] | None = None,
    ) -> list[Context]:
        """Transcode one GOF of each stream in place — every atlas each
        context carries — batching each atlas_id's video payloads across
        streams.  stream_ids ties contexts to stable per-stream state (ABR
        QP caches) when the caller's batch membership varies by round."""
        ids = stream_ids if stream_ids is not None else list(
            range(len(contexts))
        )
        atlas_ids = sorted(
            {a.atlas_id for ctx in contexts for a in ctx.atlases}
        )
        for aid in atlas_ids:
            sub = [
                (i, ctx) for i, ctx in zip(ids, contexts)
                if any(a.atlas_id == aid for a in ctx.atlases)
            ]
            self._transcode_atlases(
                [ctx.atlas(aid) for _, ctx in sub], [i for i, _ in sub],
                map1_abs=[_map1_absolute(ctx) for _, ctx in sub],
            )
        return contexts

    def transcode(
        self, contexts: list[Context], atlas_id: int = 0
    ) -> list[Context]:
        """Transcode one GOF of each stream in place, batched on the mesh."""
        self._transcode_atlases(
            [ctx.atlas(atlas_id) for ctx in contexts],
            list(range(len(contexts))),
            map1_abs=[_map1_absolute(ctx) for ctx in contexts],
        )
        return contexts

    # ------------------------------------------------------------------
    _LOSSY_TYPES = (
        VideoType.GEOMETRY, VideoType.ATTRIBUTE,
        VideoType.GEOMETRY_D0, VideoType.GEOMETRY_D1,
        VideoType.ATTRIBUTE_T0, VideoType.ATTRIBUTE_T1,
    )

    def _transcode_atlases(
        self, atlases, stream_ids: list[int],
        map1_abs: list[bool] | None = None,
    ) -> None:
        p = self.params
        self._map1_abs = map1_abs or [True] * len(atlases)

        # pre-downscale occupancy masks for streams carrying lossless video
        # (the single-stream path's background-fill anchors — byte identity
        # requires the same masks here)
        self._occ_masks = []
        for i, atlas in zip(stream_ids, atlases):
            need = any(
                (vb := atlas.video_bitstreams.get(t)) is not None
                and vb.data.startswith(b"RBV")
                and rbv.probe(vb.data)["lossless"]
                for t in self._LOSSY_TYPES
            ) or any(
                vb.data.startswith(b"RBV") and rbv.probe(vb.data)["lossless"]
                for vb in atlas.attr_ext.values()
            )
            self._occ_masks.append(
                self.single(i)._decode_occupancy_mask(atlas) if need
                else None
            )

        with self.timer.stage("transcodeOccupancy"):
            for i, atlas in zip(stream_ids, atlases):
                self.single(i)._transcode_occupancy(atlas)

        if p.rate_mode == "abr" and p.targetBitrateMbps > 0:
            # ABR searches per-stream state (budget, cached QPs): the probe
            # requantisations are already one cheap device pass each
            with self.timer.stage("rateControl"):
                # partition/extra-attribute streams participate in the
                # family budget inside _rate_control; only reflectance
                # follows afterwards (lossless reflectance passes through)
                for k, (i, atlas) in enumerate(zip(stream_ids, atlases)):
                    s = self.single(i)
                    _, abr_attr_qp = s._rate_control(
                        atlas, occ_mask=self._occ_masks[k],
                        map1_abs=self._map1_abs[k],
                    )
                    s._transcode_reflectance(
                        atlas, abr_attr_qp, self._occ_masks[k]
                    )
        else:
            # predicted map pairs transcode jointly through the single-
            # stream path (the delta re-derives against the NEW rec0);
            # the batched loops below must not touch those streams again
            self._pair_handled = set()
            for k, (i, atlas) in enumerate(zip(stream_ids, atlases)):
                if self._map1_abs[k]:
                    continue
                s = self.single(i)
                if s._has_rbv_pair(atlas, VideoType.GEOMETRY_D0,
                                   VideoType.GEOMETRY_D1):
                    s._transcode_map_pair(
                        atlas, VideoType.GEOMETRY_D0, VideoType.GEOMETRY_D1,
                        p.effective_geometry_qp(), component="geo",
                        occ_mask=self._occ_masks[k],
                    )
                    self._pair_handled |= {
                        (k, VideoType.GEOMETRY_D0),
                        (k, VideoType.GEOMETRY_D1),
                    }
                if s._has_rbv_pair(atlas, VideoType.ATTRIBUTE_T0,
                                   VideoType.ATTRIBUTE_T1):
                    s._transcode_map_pair(
                        atlas, VideoType.ATTRIBUTE_T0,
                        VideoType.ATTRIBUTE_T1,
                        p.effective_attribute_qp(), component="attr",
                        occ_mask=self._occ_masks[k],
                    )
                    self._pair_handled |= {
                        (k, VideoType.ATTRIBUTE_T0),
                        (k, VideoType.ATTRIBUTE_T1),
                    }
            with self.timer.stage("transcodeGeometry"):
                for vt in (VideoType.GEOMETRY, VideoType.GEOMETRY_D0,
                           VideoType.GEOMETRY_D1):
                    self._transcode_video_batched(
                        atlases, stream_ids, vt, p.effective_geometry_qp(),
                    )
            with self.timer.stage("transcodeAttribute"):
                for vt in (VideoType.ATTRIBUTE, VideoType.ATTRIBUTE_T0,
                           VideoType.ATTRIBUTE_T1):
                    self._transcode_video_batched(
                        atlases, stream_ids, vt, p.effective_attribute_qp(),
                    )
                # partition / extra-attribute streams: single-stream path
                # (they are small and per-stream; byte identity with the
                # sequential transcoder is the invariant)
                for k, (i, atlas) in enumerate(zip(stream_ids, atlases)):
                    s = self.single(i)
                    s._transcode_attr_ext(
                        atlas, p.effective_attribute_qp(),
                        self._occ_masks[k],
                    )
                    s._transcode_reflectance(
                        atlas, p.effective_attribute_qp(),
                        self._occ_masks[k],
                    )

        if p.computeHashSei:
            with self.timer.stage("createHashSEI"):
                for i, atlas in zip(stream_ids, atlases):
                    self.single(i)._refresh_hash_sei(atlas)

    # ------------------------------------------------------------------
    def _transcode_video_batched(
        self, atlases, stream_ids: list[int], vtype: VideoType, qp: int
    ) -> None:
        p = self.params
        batch_idx: list[int] = []
        batch_payloads: list[bytes] = []
        pair_handled = getattr(self, "_pair_handled", set())
        for k, atlas in enumerate(atlases):
            if (k, vtype) in pair_handled:
                continue  # already jointly transcoded as a predicted pair
            vb = atlas.video_bitstreams.get(vtype)
            if vb is None:
                continue
            if not vb.data.startswith(b"RBV") or rbv.probe(vb.data)[
                "lossless"
            ]:
                # foreign payloads (SHVC filtering / passthrough /
                # containment) and lossless inputs (occupancy-anchored
                # background-fill re-encode) take the single-stream path —
                # the batched output must stay byte-identical to it
                self.single(stream_ids[k])._transcode_video(
                    atlas, vtype, qp, occ_mask=self._occ_masks[k]
                )
                continue
            batch_idx.append(k)
            batch_payloads.append(vb.data)
        if not batch_payloads:
            return

        # mode resolves per payload in 'auto' (MC streams reencode, zero-MV
        # chains requant — params.effective_mode); group the batch by the
        # resolved mode so each group stays one batched device program
        def resolved_mode(data: bytes) -> str:
            m = p.effective_mode(qp, motion=rbv.probe(data)["motion"])
            return "requant" if (m == "requant"
                                 and not p.transcodeBaseline) else "reencode"

        by_mode: dict[str, tuple[list[int], list[bytes]]] = {}
        for i, data in zip(batch_idx, batch_payloads):
            idxs, pays = by_mode.setdefault(resolved_mode(data), ([], []))
            idxs.append(i)
            pays.append(data)
        for mode, (idxs, pays) in by_mode.items():
            new_payloads = transcode_payloads(
                pays,
                qp,
                mesh=self.mesh,
                new_gop=1 if p.allIntra else p.videoGopSize,
                mode=mode,
            )
            for i, payload in zip(idxs, new_payloads):
                atlases[i].set_video_bitstream(VideoBitstream(vtype, payload))
