from .enums import (
    CodecId,
    ColorFormat,
    PatchOrientation,
    PatchType,
    V3CUnitType,
    VideoType,
    NalUnitType,
    SeiPayloadType,
    PointType,
)
from .config import Option, OptionRegistry, parse_config_file
from .timing import StageTimer, Stopwatch, peak_memory_bytes
from .tracing import Tracer, TraceCategory
