"""Numeric ops: anchors, box decode, NMS, image warps (the reference's L2).

Replaces /root/reference/src/processing + src/rcnn (host ndarray loops) with
vectorized jnp traced into jit graphs, plus host numpy oracles for testing.
"""

from .anchors import (
    anchor_plane,
    full_anchor_table,
    generate_anchors,
    generate_anchors_fpn,
)
from .box_decode import (
    bbox_overlaps,
    bbox_pred,
    clip_boxes,
    clip_points,
    landmark_pred,
)
from .eval import average_precision, evaluate_detector, match_detections
from .matching import Gallery, cosine_scores, normalize_rows, search, verify
from .nms import nms_mask, nms_mask_fixpoint, nms_mask_greedy, nms_numpy
from .quantize import (
    calibrate,
    dequantize_tree,
    int8_matmul,
    quantize_array,
    quantize_model_variables,
    quantize_retinaface,
    quantize_tree,
)
from .umeyama import umeyama_similarity, umeyama_similarity_np

__all__ = [
    "anchor_plane",
    "full_anchor_table",
    "generate_anchors",
    "generate_anchors_fpn",
    "bbox_overlaps",
    "bbox_pred",
    "clip_boxes",
    "clip_points",
    "landmark_pred",
    "average_precision",
    "Gallery",
    "cosine_scores",
    "normalize_rows",
    "search",
    "verify",
    "evaluate_detector",
    "match_detections",
    "nms_mask",
    "nms_mask_fixpoint",
    "nms_mask_greedy",
    "nms_numpy",
    "calibrate",
    "dequantize_tree",
    "int8_matmul",
    "quantize_array",
    "quantize_model_variables",
    "quantize_retinaface",
    "quantize_tree",
    "umeyama_similarity",
    "umeyama_similarity_np",
]
