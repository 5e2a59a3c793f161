"""Native host runtime: C++ NMS and threaded JPEG decode/letterbox loader."""

from . import native

__all__ = ["native"]
