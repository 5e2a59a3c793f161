"""ctypes bindings for the native runtime (librsfd_native.so).

Provides the host-side native path: mask-based greedy NMS (the live
counterpart of the reference's dead CUDA kernel) and multithreaded JPEG
decode + letterbox feeding the serving pipeline.  Falls back gracefully when
the library isn't built; `ensure_built()` compiles it with the in-image
toolchain (g++ + libjpeg).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "librsfd_native.so"))

_lib = None
_load_failed = False  # memoized negative: don't re-spawn make per call
_lib_lock = threading.Lock()


def ensure_built(force: bool = False) -> str:
    """Build librsfd_native.so if missing; returns its path."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
        )
    return _LIB_PATH


def load(build_if_missing: bool = True):
    """Load (and memoize) the native library; None if unavailable.

    NEVER raises (the 'None if unavailable' contract): build failures and
    ABI mismatches degrade to the numpy/cv2 fallbacks.  Failures are
    memoized too, so hot paths probing available() per batch don't re-spawn
    a doomed `make` every call.
    """
    global _lib, _load_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _load_failed:
            return None
        try:
            if build_if_missing:
                ensure_built()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.rsfd_abi_version.restype = ctypes.c_int
            if lib.rsfd_abi_version() != 4:
                # Stale build from an older source tree: rebuild once.
                # dlopen caches by pathname, so re-CDLLing the same path
                # would return the OLD mapping (and truncating a mapped .so
                # in place risks SIGBUS) — load the rebuilt library through
                # a fresh temp copy instead.
                import shutil
                import tempfile

                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR), "-B"],
                    check=True,
                    capture_output=True,
                )
                tmp = tempfile.NamedTemporaryFile(
                    suffix=".so", delete=False
                )
                with tmp:
                    shutil.copyfile(_LIB_PATH, tmp.name)
                lib = ctypes.CDLL(tmp.name)
                lib.rsfd_abi_version.restype = ctypes.c_int
                if lib.rsfd_abi_version() != 4:
                    raise OSError("rsfd_native ABI mismatch after rebuild")
        except (OSError, subprocess.CalledProcessError):
            _load_failed = True
            return None

        lib.rsfd_nms.restype = ctypes.c_int
        lib.rsfd_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.rsfd_decode_letterbox.restype = ctypes.c_int
        lib.rsfd_decode_letterbox.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.rsfd_decode_letterbox_batch.restype = None
        lib.rsfd_decode_letterbox_batch.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.rsfd_s2d_batch.restype = None
        lib.rsfd_s2d_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.rsfd_s4d_batch.restype = None
        lib.rsfd_s4d_batch.argtypes = list(lib.rsfd_s2d_batch.argtypes)
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def nms(dets: np.ndarray, thresh: float) -> List[int]:
    """Native greedy NMS over (N, 5) rows; same contract as ops.nms.nms_numpy."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable; run ensure_built()")
    dets = np.ascontiguousarray(dets, dtype=np.float32)
    if dets.ndim != 2 or dets.shape[1] != 5:
        # nms_numpy would raise on the same input; the C side would read
        # past the buffer instead — validate before crossing the boundary.
        raise ValueError(f"dets must be (N, 5) [x1 y1 x2 y2 score]; got {dets.shape}")
    n = dets.shape[0]
    keep = np.zeros(n, dtype=np.int32)
    num = lib.rsfd_nms(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ctypes.c_float(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return keep[:num].tolist()


def decode_letterbox(
    data: bytes, dst_w: int, dst_h: int
) -> Tuple[np.ndarray, float]:
    """Decode one JPEG and letterbox to (dst_h, dst_w, 3) BGR u8."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable; run ensure_built()")
    out = np.zeros((dst_h, dst_w, 3), dtype=np.uint8)
    scale = ctypes.c_float(0.0)
    buf = np.frombuffer(data, dtype=np.uint8)
    rc = lib.rsfd_decode_letterbox(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(data),
        dst_w,
        dst_h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(scale),
    )
    if rc != 0:
        raise ValueError("native JPEG decode failed")
    return out, float(scale.value)


def s2d_batch(imgs: np.ndarray, num_threads: int = 0) -> np.ndarray:
    """Threaded 2x2 space-to-depth: (N, H, W, 3) u8 -> (N, H/2, W/2, 12) u8.

    Same layout as ops.image.s2d_layout_host (the numpy reference); this is
    the MXU-ready input for detection.make_batched_fn(pre_s2d=True).
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable; run ensure_built()")
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    n, h, w, c = imgs.shape
    if c != 3 or h % 2 or w % 2:
        # the C function silently no-ops on bad dims (and assert vanishes
        # under python -O) — an un-written np.empty buffer must never leak
        raise ValueError(f"need (N, H%2==0, W%2==0, 3); got {imgs.shape}")
    out = np.empty((n, h // 2, w // 2, 12), dtype=np.uint8)
    lib.rsfd_s2d_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        h,
        w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads,
    )
    return out


def s4d_batch(imgs: np.ndarray, num_threads: int = 0) -> np.ndarray:
    """Threaded 4x4 space-to-depth: (N, H, W, 3) u8 -> (N, H/4, W/4, 48) u8.

    Same layout as ops.image.s4d_layout_host — the dense-stem serving input
    for detection.make_batched_fn(stem="s4d") (ops/stem_s4d.py).
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable; run ensure_built()")
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    n, h, w, c = imgs.shape
    if c != 3 or h % 4 or w % 4:
        raise ValueError(f"need (N, H%4==0, W%4==0, 3); got {imgs.shape}")
    out = np.empty((n, h // 4, w // 4, 48), dtype=np.uint8)
    lib.rsfd_s4d_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        h,
        w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads,
    )
    return out


def decode_letterbox_batch(
    payloads: Sequence[bytes],
    dst_w: int,
    dst_h: int,
    num_threads: int = 0,
    s2d: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Threaded batch decode+letterbox.

    Returns (imgs (N, dst_h, dst_w, 3) u8, det_scales (N,), ok (N,) bool);
    with s2d=True, imgs is instead the (N, dst_h/2, dst_w/2, 12) stem layout
    (see s2d_batch).
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable; run ensure_built()")
    n = len(payloads)
    imgs = np.zeros((n, dst_h, dst_w, 3), dtype=np.uint8)
    scales = np.ones((n,), dtype=np.float32)
    status = np.zeros((n,), dtype=np.int32)
    if n == 0:
        return imgs, scales, status == 0

    bufs = [np.frombuffer(p, dtype=np.uint8) for p in payloads]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for b in bufs]
    )
    lens = (ctypes.c_size_t * n)(*[len(p) for p in payloads])
    lib.rsfd_decode_letterbox_batch(
        ptrs,
        lens,
        n,
        dst_w,
        dst_h,
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    if s2d:
        return s2d_batch(imgs, num_threads), scales, status == 0
    return imgs, scales, status == 0
