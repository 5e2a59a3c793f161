"""Host utilities: image byte decode, debug dumps, profiling helpers."""

from .cache import instance_cache
from .coordinate import Coord2D, Coord3D, image_to_rgb_array
from .debug import DebugSink, disable_debug, dump, dump_image, enable_debug
from .image_io import decode_image_bytes, named_landmarks_to_array
from .profiling import Timer, trace

__all__ = [
    "instance_cache",
    "Coord2D",
    "Coord3D",
    "image_to_rgb_array",
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
