"""Faster-R-CNN-style anchor enumeration and FPN anchor planes.

Semantics match the reference crate's anchor math:
  - base-anchor enumeration: /root/reference/src/processing/generate_anchors.rs
    (_whctrs :20, _mkanchors :28, _ratio_enum :141, _scale_enum :151,
    generate_anchors2 :61, generate_anchors_fpn2 :116 — strides sorted
    descending).
  - plane expansion over the feature grid: /root/reference/src/rcnn/anchors.rs:3
    (anchor[h, w, a] = base[a] + [w*stride, h*stride] on both corners).

Everything here is init-time host precompute producing small constant arrays
that get baked into the jit-compiled detect graph; the hot H*W*A triple loop of
the reference becomes a single broadcast.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Sequence, Tuple

import numpy as np

from ..configs import AnchorConfig


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """Round half away from zero (Rust f32::round), not numpy's half-to-even."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def _whctrs(anchor: np.ndarray) -> Tuple[float, float, float, float]:
    """Return (w, h, x_ctr, y_ctr) of an (x1, y1, x2, y2) anchor (+1 widths)."""
    w = anchor[2] - anchor[0] + 1.0
    h = anchor[3] - anchor[1] + 1.0
    x_ctr = anchor[0] + 0.5 * (w - 1.0)
    y_ctr = anchor[1] + 0.5 * (h - 1.0)
    return w, h, x_ctr, y_ctr


def _mkanchors(
    ws: np.ndarray, hs: np.ndarray, x_ctr: float, y_ctr: float
) -> np.ndarray:
    """Assemble (N, 4) corner anchors from widths/heights around a center."""
    ws = np.asarray(ws, dtype=np.float32)
    hs = np.asarray(hs, dtype=np.float32)
    return np.stack(
        [
            x_ctr - 0.5 * (ws - 1.0),
            y_ctr - 0.5 * (hs - 1.0),
            x_ctr + 0.5 * (ws - 1.0),
            y_ctr + 0.5 * (hs - 1.0),
        ],
        axis=1,
    ).astype(np.float32)


def _ratio_enum(anchor: np.ndarray, ratios: Sequence[float]) -> np.ndarray:
    """Enumerate aspect-ratio variants of an anchor (area-preserving)."""
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    size = w * h
    ratios = np.asarray(ratios, dtype=np.float32)
    size_ratios = size / ratios
    ws = _round_half_away(np.sqrt(size_ratios))
    hs = ws * ratios
    return _mkanchors(ws, hs, x_ctr, y_ctr)


def _scale_enum(anchor: np.ndarray, scales: Sequence[float]) -> np.ndarray:
    """Enumerate scale variants of an anchor."""
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    scales = np.asarray(scales, dtype=np.float32)
    return _mkanchors(w * scales, h * scales, x_ctr, y_ctr)


def generate_anchors(
    base_size: int,
    ratios: Sequence[float],
    scales: Sequence[float],
    stride: int = 16,
    dense_anchor: bool = False,
) -> np.ndarray:
    """Generate the (A, 4) base anchor table for one FPN level.

    Mirrors generate_anchors2 (generate_anchors.rs:61-93): ratio enumeration
    on the [0, 0, base_size-1, base_size-1] box, then scale enumeration per
    ratio anchor; dense_anchor appends a half-stride-shifted copy.
    """
    base_anchor = np.array(
        [1.0, 1.0, float(base_size), float(base_size)], dtype=np.float32
    ) - 1.0
    ratio_anchors = _ratio_enum(base_anchor, ratios)
    anchors = np.concatenate(
        [_scale_enum(ratio_anchors[i], scales) for i in range(ratio_anchors.shape[0])],
        axis=0,
    )
    if dense_anchor:
        assert stride % 2 == 0
        anchors = np.concatenate([anchors, anchors + stride / 2.0], axis=0)
    return anchors.astype(np.float32)


def generate_anchors_fpn(
    anchor_cfg: Mapping[int, AnchorConfig], dense_anchor: bool = False
) -> Dict[int, np.ndarray]:
    """Per-stride base anchor tables, iterated in descending stride order.

    Mirrors generate_anchors_fpn2 (generate_anchors.rs:116-138).  Returns an
    insertion-ordered dict {stride: (A, 4) float32}, strides descending.
    """
    out: Dict[int, np.ndarray] = {}
    for stride in sorted(anchor_cfg.keys(), reverse=True):
        cfg = anchor_cfg[stride]
        out[stride] = generate_anchors(
            cfg.base_size, cfg.ratios, cfg.scales, stride, dense_anchor
        )
    return out


def anchor_plane(
    height: int, width: int, stride: int, base_anchors: np.ndarray
) -> np.ndarray:
    """Tile base anchors over an H x W feature grid -> (H*W*A, 4).

    Row-major (h, w, a) flattening — identical to the reference's
    (H, W, A, 4) array reshaped in C order (rcnn/anchors.rs:3-21 followed by
    into_shape((K*A, 4)) in face_detection.rs:330), which is also exactly the
    order of the flattened NHWC score/delta tensors it is matched against.
    """
    a = base_anchors.shape[0]
    shift_x = (np.arange(width, dtype=np.float32) * stride)[None, :, None]
    shift_y = (np.arange(height, dtype=np.float32) * stride)[:, None, None]
    plane = np.zeros((height, width, a, 4), dtype=np.float32)
    plane[..., 0] = base_anchors[None, None, :, 0] + shift_x
    plane[..., 1] = base_anchors[None, None, :, 1] + shift_y
    plane[..., 2] = base_anchors[None, None, :, 2] + shift_x
    plane[..., 3] = base_anchors[None, None, :, 3] + shift_y
    return plane.reshape(height * width * a, 4)


def full_anchor_table(
    image_size: Tuple[int, int],
    anchor_cfg: Mapping[int, AnchorConfig],
    feat_strides: Sequence[int] = (32, 16, 8),
    dense_anchor: bool = False,
) -> Tuple[np.ndarray, List[Tuple[int, int, int, int]]]:
    """Precompute the concatenated anchor table for a static input size.

    Args:
      image_size: (width, height) of the letterboxed detector input.
      anchor_cfg: per-stride AnchorConfig.
      feat_strides: stride iteration order (reference uses [32, 16, 8],
        face_detection.rs:52).
      dense_anchor: append half-stride-shifted anchors.

    Returns:
      (anchors, level_info) where anchors is (total, 4) float32 concatenated in
      stride order and level_info is a list of (stride, feat_h, feat_w, A).
      For 640x640 / strides (32,16,8) / 2 anchors this yields 16,800 rows
      (BASELINE.md anchor workload).
    """
    width, height = image_size
    fpn = generate_anchors_fpn(anchor_cfg, dense_anchor)
    tables = []
    level_info = []
    for stride in feat_strides:
        base = fpn[stride]
        fh = -(-height // stride)  # ceil division; exact for 640/{32,16,8}
        fw = -(-width // stride)
        tables.append(anchor_plane(fh, fw, stride, base))
        level_info.append((stride, fh, fw, base.shape[0]))
    return np.concatenate(tables, axis=0), level_info
