#!/usr/bin/env python3
"""Generate the per-video-codec encoder cfg corpus (cfg/hm, cfg/jm,
cfg/shm, cfg/vtm, cfg/hdrconvert).

The reference ships codec cfg files for its HM/JM/SHM/VTM backends
(SURVEY.md §5.6; file names mirrored from /root/reference/cfg/*).  In this
framework RBV is the native codec and these cfgs apply only when an
external codec family is selected (videoEncoder<Comp>CodecId); each file
here is a minimal, self-documented starting point carrying the coding
structure the condition implies (intra period / GOP / bitdepth / lossless
bypass), synthesized from the file-name semantics — users with a real
HM/JM/SHM/VTM build extend them with that build's full option set.

Run from the repo root:  python scripts/gen_codec_cfgs.py
"""

from __future__ import annotations

import os

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "cfg")

# file names per codec dir (mirroring the reference corpus; the one
# *-mp-separate-video-lossless name is referenced by the reference's
# vtm-all-intra-lossless.cfg but missing from its tree — included here)
HM = [
    "ctc-hm-attribute-ai-1L.cfg", "ctc-hm-attribute-ai-T0.cfg",
    "ctc-hm-attribute-ai-T1.cfg", "ctc-hm-attribute-ai-lossless-1L.cfg",
    "ctc-hm-attribute-ai-lossless-T0.cfg",
    "ctc-hm-attribute-ai-lossless-T1.cfg",
    "ctc-hm-attribute-ai-lossless.cfg", "ctc-hm-attribute-ai.cfg",
    "ctc-hm-attribute-ld-lossless-1L.cfg",
    "ctc-hm-attribute-ld-lossless-T0.cfg",
    "ctc-hm-attribute-ld-lossless-T1.cfg",
    "ctc-hm-attribute-ld-lossless.cfg", "ctc-hm-attribute-ld.cfg",
    "ctc-hm-attribute-ra-1L.cfg", "ctc-hm-attribute-ra-T0.cfg",
    "ctc-hm-attribute-ra-T1.cfg", "ctc-hm-attribute-ra.cfg",
    "ctc-hm-geometry-ai-1L.cfg", "ctc-hm-geometry-ai-D0.cfg",
    "ctc-hm-geometry-ai-D1.cfg", "ctc-hm-geometry-ai-lossless-D0.cfg",
    "ctc-hm-geometry-ai-lossless-D1.cfg",
    "ctc-hm-geometry-ai-lossless-scc-1L.cfg",
    "ctc-hm-geometry-ai-lossless-scc-D0.cfg",
    "ctc-hm-geometry-ai-lossless-scc-D1.cfg",
    "ctc-hm-geometry-ai-lossless-scc.cfg",
    "ctc-hm-geometry-ai-lossless.cfg",
    "ctc-hm-geometry-ai-mp-separate-video.cfg", "ctc-hm-geometry-ai.cfg",
    "ctc-hm-geometry-ld-D0.cfg", "ctc-hm-geometry-ld-D1.cfg",
    "ctc-hm-geometry-ld-lossless-D0.cfg",
    "ctc-hm-geometry-ld-lossless-D1.cfg",
    "ctc-hm-geometry-ld-lossless-scc-1L.cfg",
    "ctc-hm-geometry-ld-lossless-scc-D0.cfg",
    "ctc-hm-geometry-ld-lossless-scc-D1.cfg",
    "ctc-hm-geometry-ld-lossless-scc.cfg",
    "ctc-hm-geometry-ld-lossless.cfg", "ctc-hm-geometry-ld.cfg",
    "ctc-hm-geometry-ra-1L.cfg", "ctc-hm-geometry-ra-D0.cfg",
    "ctc-hm-geometry-ra-D1.cfg", "ctc-hm-geometry-ra-mp-separate-video.cfg",
    "ctc-hm-geometry-ra.cfg",
    "ctc-hm-occupancy-map-ai-main-scc.cfg",
    "ctc-hm-occupancy-map-ai-main.cfg",
    "ctc-hm-occupancy-map-ai-main10-lossy.cfg",
    "ctc-hm-occupancy-map-ai-main10.cfg",
    "ctc-hm-occupancy-map-ld-main-scc.cfg",
    "ctc-hm-occupancy-map-ld-main.cfg",
    "ctc-hm-occupancy-map-ld-main10-lossy.cfg",
    "ctc-hm-occupancy-map-ld-main10.cfg",
]
VTM = [
    "vtm-attribute-ai-lossless.cfg", "vtm-attribute-ai.cfg",
    "vtm-attribute-ld-lossless.cfg", "vtm-attribute-ld.cfg",
    "vtm-attribute-ra.cfg", "vtm-geometry-ai-lossless.cfg",
    "vtm-geometry-ai-mp-separate-video.cfg",
    "vtm-geometry-ai-mp-separate-video-lossless.cfg",
    "vtm-geometry-ai.cfg", "vtm-geometry-ld-lossless.cfg",
    "vtm-geometry-ld.cfg", "vtm-geometry-ra.cfg",
    "vtm-occupancy-map-ai.cfg", "vtm-occupancy-map-ld-P.cfg",
]
SHM = [
    f"shm-{role}-{cond}-{nl}.cfg"
    for role in ("attribute", "geometry")
    for cond in ("ai", "ld", "ra")
    for nl in ("2L", "3L")
]
JM = [
    "encoder-avc-attribute-ai-lossless.cfg", "encoder-avc-attribute-ai.cfg",
    "encoder-avc-attribute-ld-lossless.cfg", "encoder-avc-attribute-ra.cfg",
    "encoder-avc-geometry-ai-lossless.cfg", "encoder-avc-geometry-ai.cfg",
    "encoder-avc-geometry-ld-lossless.cfg", "encoder-avc-geometry-ra.cfg",
    "encoder-avc-occupancy-ai.cfg", "encoder-avc-occupancy-ld.cfg",
]


def parse_name(name: str) -> dict:
    s = name.replace(".cfg", "")
    d = {
        "occupancy": "occupancy" in s,
        "geometry": "geometry" in s,
        "attribute": "attribute" in s,
        "lossless": "lossless" in s,
        "lossy": "lossy" in s,
        "scc": "scc" in s,
        "mp": "mp-separate-video" in s,
        "main10": "main10" in s,
        "layers": 3 if "3L" in s else (2 if "2L" in s else 1),
        "map": next((m for m in ("D0", "D1", "T0", "T1", "1L")
                     if f"-{m}" in s), None),
    }
    for cond in ("ai", "ld", "ra"):
        if f"-{cond}-" in s or s.endswith(f"-{cond}"):
            d["cond"] = cond
    d.setdefault("cond", "ai")
    return d


def hm_style(name: str, codec: str) -> str:
    """HM/SHM/VTM cfg syntax (Key : value)."""
    d = parse_name(name)
    role = ("occupancy" if d["occupancy"]
            else "geometry" if d["geometry"] else "attribute")
    lines = [
        f"# {codec.upper()} encoder configuration — {role} video, "
        f"{ {'ai': 'all intra', 'ld': 'low delay', 'ra': 'random access'}[d['cond']] }"
        + (", lossless" if d["lossless"] else ""),
        f"# Applies when videoEncoder{role.capitalize()}CodecId selects the "
        f"{codec.upper()} family; minimal starting point for a real "
        f"{codec.upper()} build (extend with its full option set).",
        "",
    ]
    if d["cond"] == "ai":
        lines += ["IntraPeriod                   : 1",
                  "GOPSize                       : 1",
                  "DecodingRefreshType           : 2"]
    elif d["cond"] == "ld":
        lines += ["IntraPeriod                   : -1   # first frame only",
                  "GOPSize                       : 4    # low-delay P",
                  "DecodingRefreshType           : 0"]
    else:
        lines += ["IntraPeriod                   : 32",
                  "GOPSize                       : 8",
                  "DecodingRefreshType           : 1    # CRA"]
    if d["occupancy"]:
        bd = 10 if d["main10"] else 8
        lines += [f"InternalBitDepth              : {bd}",
                  f"InputBitDepth                 : {bd}",
                  "InputChromaFormat             : 400"]
        if d["lossy"]:
            lines += ["# lossy occupancy (lossyOccupancyMap): coded at",
                      "# occupancyMapQP, binarised at the OI threshold",
                      "QP                            : 38"]
        else:
            lines += ["# occupancy must survive exactly: transquant bypass",
                      "TransquantBypassEnable        : 1",
                      "CUTransquantBypassFlagForce   : 1",
                      "QP                            : 4"]
    else:
        chroma = "400" if d["geometry"] else "420"
        lines += ["InternalBitDepth              : 10",
                  "InputBitDepth                 : 10",
                  f"InputChromaFormat             : {chroma}"]
    if d["lossless"]:
        lines += ["",
                  "# lossless coding of this sub-stream",
                  "TransquantBypassEnable        : 1",
                  "CUTransquantBypassFlagForce   : 1",
                  "QP                            : 0"]
    if d["scc"]:
        lines += ["",
                  "# screen-content tools (HM SCM): palette + IBC help the",
                  "# piecewise-constant depth planes",
                  "PaletteMode                   : 1",
                  "IntraBlockCopyEnabled         : 1"]
    if d["mp"]:
        lines += ["",
                  "# raw-points (missed points) auxiliary video: packed",
                  "# coordinates, always all-intra"]
    if d["map"]:
        lines += ["", f"# per-map sub-stream variant ({d['map']}: "
                  f"{'near' if d['map'] in ('D0', 'T0') else 'far/combined'}"
                  " map)"]
    if codec == "shm" and d["layers"] > 1:
        lines += ["", f"NumLayers                     : {d['layers']}",
                  "# per-layer inputs/dimensions ride the SHM CLI "
                  "(-i0/-i1/..., -wdt0/...); multi-layer runs override the",
                  "# wrapper template via encoderCommand (video/external.py)"]
    return "\n".join(lines) + "\n"


def jm_style(name: str) -> str:
    """JM lencod cfg syntax (Key = value)."""
    d = parse_name(name)
    role = "occupancy" if d["occupancy"] else (
        "geometry" if d["geometry"] else "attribute")
    lines = [
        f"# JM (AVC) encoder configuration — {role} video, {d['cond']}"
        + (", lossless" if d["lossless"] else ""),
        f"# Applies when videoEncoder{role.capitalize()}CodecId = JM_APP.",
        "",
        "ProfileIDC            = 100   # High",
    ]
    if d["cond"] == "ai":
        lines += ["IntraPeriod           = 1"]
    elif d["cond"] == "ld":
        lines += ["IntraPeriod           = 0", "NumberBFrames         = 0"]
    else:
        lines += ["IntraPeriod           = 32", "NumberBFrames         = 0"]
    bd = 8 if d["occupancy"] else 10
    lines += [f"SourceBitDepthLuma    = {bd}",
              f"SourceBitDepthChroma  = {bd}",
              f"YUVFormat             = {0 if not d['attribute'] else 1}"
              "   # 0:400, 1:420"]
    if d["lossless"] or d["occupancy"]:
        lines += ["QPISlice              = 0", "QPPSlice              = 0",
                  "LosslessCoding        = 1"]
    return "\n".join(lines) + "\n"


HDRCONVERT = {
    "rgb444toyuv420.cfg": (0, 2, 8, 1, 0, 8),
    "yuv420torgb444.cfg": (1, 0, 8, 0, 2, 8),
    "yuv420toyuv444_16bit.cfg": (1, 0, 8, 3, 0, 16),
}


def hdrconvert_style(name: str) -> str:
    sc, scs, sbd, oc, ocs, obd = HDRCONVERT[name]
    return "\n".join([
        f"# HDRConvert configuration — {name.replace('.cfg', '')}",
        "# Keys consumed by video/hdrtools.py (HDRToolsAppColorConverter",
        "# analog); a real HDRConvert build honors the full key set.",
        "",
        f"SourceChromaFormat      = {sc}",
        f"SourceColorSpace        = {scs}",
        f"SourceBitDepthCmp0      = {sbd}",
        f"SourceBitDepthCmp1      = {sbd}",
        f"SourceBitDepthCmp2      = {sbd}",
        f"OutputChromaFormat      = {oc}",
        f"OutputColorSpace        = {ocs}",
        f"OutputBitDepthCmp0      = {obd}",
        f"OutputBitDepthCmp1      = {obd}",
        f"OutputBitDepthCmp2      = {obd}",
    ]) + "\n"


def main() -> None:
    made = 0
    for sub, names, render in (
        ("hm", HM, lambda n: hm_style(n, "hm")),
        ("vtm", VTM, lambda n: hm_style(n, "vtm")),
        ("shm", SHM, lambda n: hm_style(n, "shm")),
        ("jm", JM, jm_style),
        ("hdrconvert", list(HDRCONVERT), hdrconvert_style),
    ):
        d = os.path.join(ROOT, sub)
        os.makedirs(d, exist_ok=True)
        for n in names:
            with open(os.path.join(d, n), "w") as fh:
                fh.write(render(n))
            made += 1
    print(f"wrote {made} cfg files under {os.path.normpath(ROOT)}")


if __name__ == "__main__":
    main()
