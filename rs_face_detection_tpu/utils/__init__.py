"""Host utilities: image byte decode, debug dumps, profiling helpers."""

from .image_io import decode_image_bytes, named_landmarks_to_array

__all__ = ["decode_image_bytes", "named_landmarks_to_array"]
