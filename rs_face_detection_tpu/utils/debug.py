"""Debug intermediate dumps + structured logging.

The reference's debug story is `is_debug: Option<bool>` threaded through every
call(), gating println! dumps and imwrite of intermediates (./resized.png,
./det_img.png, ./aligned.jpg — SURVEY.md §5).  Here the same switch becomes a
process-wide DebugSink that saves named intermediate arrays/images into a run
directory as .npy/.png and logs through the stdlib logger, so a debug run
leaves an inspectable trace instead of scattering files in cwd.
"""

from __future__ import annotations

import logging
import os
import threading
import time
from typing import Optional

import numpy as np

logger = logging.getLogger("rs_face_detection_tpu")

_sink_lock = threading.Lock()
_active_sink: Optional["DebugSink"] = None


class DebugSink:
    """Collects named intermediates for one debug session."""

    def __init__(self, directory: Optional[str] = None) -> None:
        self.directory = directory or os.path.join(
            ".rsfd_debug", time.strftime("%Y%m%d-%H%M%S")
        )
        os.makedirs(self.directory, exist_ok=True)
        self._seq = 0
        self._lock = threading.Lock()

    def dump_array(self, name: str, array) -> str:
        arr = np.asarray(array)
        with self._lock:
            path = os.path.join(self.directory, f"{self._seq:03d}_{name}.npy")
            self._seq += 1
        np.save(path, arr)
        logger.debug("debug dump %s: shape=%s dtype=%s -> %s", name, arr.shape, arr.dtype, path)
        return path

    def dump_image(self, name: str, image_bgr) -> str:
        """Save an image intermediate (PNG via cv2 when present, else .npy)."""
        arr = np.asarray(image_bgr)
        try:
            import cv2  # type: ignore

            with self._lock:
                path = os.path.join(self.directory, f"{self._seq:03d}_{name}.png")
                self._seq += 1
            cv2.imwrite(path, np.clip(arr, 0, 255).astype(np.uint8))
            return path
        except Exception:
            return self.dump_array(name, arr)


def enable_debug(directory: Optional[str] = None) -> DebugSink:
    """Activate a process-wide debug sink; returns it."""
    global _active_sink
    with _sink_lock:
        _active_sink = DebugSink(directory)
        return _active_sink


def disable_debug() -> None:
    global _active_sink
    with _sink_lock:
        _active_sink = None


def sink() -> Optional[DebugSink]:
    return _active_sink


def dump(name: str, array) -> None:
    """Dump an intermediate if a debug sink is active (cheap no-op otherwise)."""
    s = _active_sink
    if s is not None:
        s.dump_array(name, array)


def dump_image(name: str, image) -> None:
    s = _active_sink
    if s is not None:
        s.dump_image(name, image)
