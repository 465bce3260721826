"""Transcoder parameters.

Names mirror PCCTranscoderParameters (/root/reference/source/lib/
PccLibTranscoder/include/PCCTranscoderParameters.h:40-104) where a concept
carries over: qualityValGeo/qualityValAtt (the libav-path quality values),
geometryQP/attributeQP (the baseline-path QPs), occupancyPrecision,
transcodeBaseline.  RBV-specific: mode 'requant' (DCT-domain fast path) vs
'reencode' (drift-free decode->encode, the reference's only option).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class TranscoderParameters:
    # reference CLI names (PccAppTranscoder.cpp / transcode.sh)
    compressedStreamPath: str = ""
    outStreamPath: str = "transcoded.bin"
    test_name: str = "transcode"
    nbThread: int = 0
    # accepted for CLI parity with the reference's libav path; RBV maps
    # preset/rate_mode onto its own knobs (qp mode only for now)
    preset: str = "veryfast"
    profile: str = "high"
    tier: str = "main"
    rate_mode: str = "qp"
    pixelFormat: str = "yuv420p"
    useCuda: bool = False

    # rate controls (both naming families accepted; QP wins if set)
    geometryQP: int = 32
    attributeQP: int = 42
    qualityValGeo: int = -1   # alias used by the reference's ffmpeg path
    qualityValAtt: int = -1
    # rate_mode="abr": search QPs to hit targetBitrateMbps (per stream, at
    # frameRate fps); the DCT-domain requant path makes size probes cheap.
    targetBitrateMbps: float = 0.0
    frameRate: float = 30.0
    # fraction of the video budget given to geometry (rest -> attribute)
    geometryBitrateShare: float = 0.35

    # occupancy handling: target precision (downscale by max-pool when the
    # incoming stream is finer); 0 = leave untouched
    occupancyPrecision: int = 0

    # ---- foreign-codec (baseline) route --------------------------------
    # Re-encode of non-RBV (HEVC/AVC Annex-B) sub-streams through external
    # codec binaries — the reference's transcodeBaseline analog
    # (PCCTranscoder.cpp:170-336: PccAppVideoDecoder decode -> occupancy
    # max-pool -> PCCVideoEncoder::compress re-encode).  Names mirror
    # PCCTranscoderParameters.h:71-83.  Binary resolution order per
    # component: the explicit *Path below, then RABBIT_<CODECID>_{ENCODER,
    # DECODER} env, then the codec's default binary name on PATH.  When
    # nothing resolves, foreign payloads pass through untouched (the
    # pre-round-3 behavior).
    videoDecoderOccupancyPath: str = ""
    videoDecoderGeometryPath: str = ""
    videoDecoderAttributePath: str = ""
    videoEncoderOccupancyPath: str = ""
    videoEncoderGeometryPath: str = ""
    videoEncoderAttributePath: str = ""
    # template family used to drive the binaries (CodecId name: HM_APP /
    # JM_APP / SHM_APP / VTM_APP / FFMPEG_APP)
    videoEncoderOccupancyCodecId: str = "HM_APP"
    videoEncoderGeometryCodecId: str = "HM_APP"
    videoEncoderAttributeCodecId: str = "HM_APP"
    occupancyMapQP: int = 8
    deltaQPD0: int = 0
    deltaQPD1: int = 0
    deltaQPT0: int = 0
    deltaQPT1: int = 0

    # SHVC spatial-layer selection: keep NAL layers <= this id in HEVC
    # video payloads (enhancement-layer discard, no pixel re-encode);
    # -1 = disabled.  N/A for RBV payloads (single-layer by construction).
    shvcLayerIndex: int = -1

    # pipeline selection
    #  'reencode' — drift-free fused decode->re-encode on device (the
    #               reference's only option);
    #  'requant'  — DCT-domain requantisation (the live fast path);
    #  'auto'     — requant while the target QP is fine enough for the
    #               residual drift to stay within the north-star quality
    #               envelope, else fall back to reencode.  Rationale: the
    #               measured ladder (RESULTS.md) has requant within the
    #               <=0.05 dB D1 target at r2-r5 but +0.07 dB at r1
    #               (geometry QP 32) — open-loop/rounding drift grows with
    #               the quantiser step, so the coarsest points re-encode.
    mode: str = "reencode"
    autoModeQPThreshold: int = 30     # 'auto': requant iff target QP <= this
    transcodeBaseline: bool = False   # full decode->re-encode (same as
                                      # 'reencode' for RBV; kept for CLI parity)
    videoGopSize: int = 2
    allIntra: bool = False

    # observability
    keepIntermediateFiles: bool = False
    computeHashSei: bool = True

    def effective_geometry_qp(self) -> int:
        return self.qualityValGeo if self.qualityValGeo >= 0 else self.geometryQP

    def effective_attribute_qp(self) -> int:
        return self.qualityValAtt if self.qualityValAtt >= 0 else self.attributeQP

    def effective_mode(self, qp: int) -> str:
        """Resolve 'auto' per stream: requant at fine QPs, reencode at
        coarse ones (see the mode comment above)."""
        if self.mode != "auto":
            return self.mode
        return "requant" if qp <= self.autoModeQPThreshold else "reencode"
