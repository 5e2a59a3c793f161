"""Coordinate types and image/metadata conversion helpers.

Parity with the reference's small utility surface:
  - Coord2D / Coord3D (src/utils/coordinate.rs:1-10);
  - convert_image_to_ndarray (src/utils/image.rs:15-39) — BGR Mat -> RGB
    array (without the reference's side effect of always writing
    ./img_as_arr_rgb.png to cwd, which we deliberately drop);
  - named-landmark conversion lives in utils/image_io.named_landmarks_to_array
    (image.rs:41-67).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Coord2D:
    x: float
    y: float


@dataclass(frozen=True)
class Coord3D:
    x: float
    y: float
    z: float


def image_to_rgb_array(image_bgr: np.ndarray) -> np.ndarray:
    """(H, W, 3) BGR uint8 -> (H, W, 3) RGB uint8 array."""
    img = np.asarray(image_bgr)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3), got {img.shape}")
    return img[:, :, ::-1].copy()
