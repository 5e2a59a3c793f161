"""Host utilities: image byte decode, debug dumps, profiling helpers."""

from .debug import DebugSink, disable_debug, dump, dump_image, enable_debug
from .image_io import decode_image_bytes, named_landmarks_to_array
from .profiling import Timer, trace

__all__ = [
    "DebugSink",
    "disable_debug",
    "dump",
    "dump_image",
    "enable_debug",
    "decode_image_bytes",
    "named_landmarks_to_array",
    "Timer",
    "trace",
]
