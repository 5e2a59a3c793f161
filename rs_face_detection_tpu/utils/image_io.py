"""Host-side image byte decoding.

Mirrors the reference's byte_data_to_opencv
(/root/reference/src/utils/utils.rs:8-52): decode raw JPEG/PNG bytes, drop an
alpha channel, and replicate grayscale to 3 channels.  Decoded images are HWC
uint8 in OpenCV's BGR channel order — the channel conventions of every
downstream module (BGR->RGB flips in detection/quality/extraction, raw BGR for
anti-spoofing) are preserved relative to this.

Decoding stays on host (JPEG entropy decode is not a TPU workload); the
native C++ decoder in runtime/ provides a multithreaded batched path for the
serving pipeline, with this module as the portable fallback.
"""

from __future__ import annotations

import io
from typing import Optional

import numpy as np

try:  # pragma: no cover - environment probe
    import cv2  # type: ignore

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

try:  # pragma: no cover - environment probe
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except Exception:  # pragma: no cover
    Image = None
    _HAS_PIL = False


def decode_image_bytes(data: bytes) -> np.ndarray:
    """Decode image bytes to an (H, W, 3) uint8 BGR array.

    Channel fix-ups follow utils.rs:26-49: 4-channel input drops alpha
    (keeping channel order), single-channel input is replicated to 3.
    """
    img: Optional[np.ndarray] = None
    if _HAS_CV2:
        buf = np.frombuffer(data, dtype=np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_UNCHANGED)
    if img is None and _HAS_PIL:
        try:
            pil = Image.open(io.BytesIO(data))
            arr = np.asarray(pil)
        except Exception as e:
            raise ValueError(f"could not decode image bytes: {e}") from e
        if arr.ndim == 3 and arr.shape[2] >= 3:
            # PIL decodes RGB(A); flip to BGR to match the OpenCV convention.
            img = arr[:, :, :3][:, :, ::-1].copy()
        else:
            img = arr
    if img is None:
        raise ValueError("could not decode image bytes (no decoder available)")

    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    elif img.shape[2] == 2:  # LA (gray + alpha): replicate luminance
        img = np.repeat(img[:, :, :1], 3, axis=2)
    elif img.shape[2] == 4:
        img = img[:, :, :3]
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    return np.ascontiguousarray(img)


def named_landmarks_to_array(landmarks: dict) -> np.ndarray:
    """Convert a named-landmark mapping to the (5, 2) detector layout.

    Mirrors convert_metadata_to_ndarray (utils/image.rs:41-67): row order is
    [left_eye, right_eye, nose, left_mouth, right_mouth].
    """
    order = ("left_eye", "right_eye", "nose", "left_mouth", "right_mouth")
    return np.asarray([landmarks[k] for k in order], dtype=np.float32)
