"""5-point landmark alignment to the 112x112 ArcFace template.

Rework of the reference's FaceAlignment
(/root/reference/src/pipeline/module/face_alignment.rs): the
estimate_affine_partial_2d(LMEDS, 2000 iters) call becomes the closed-form
similarity solve (ops/umeyama.py — see there for the equivalence argument),
and cv2.warp_affine becomes an on-device gather/lerp warp (ops/image.py) that
can fuse with the downstream quality/embedding forward.

Fallback path (:64-116) when no usable landmarks exist: margin-44 crop around
the detection box (or a default 6.25%-inset frame box) resized to 112.
Documented deviation: the reference's fallback clamps with `max` where `min`
is intended and reuses det[1] for the bottom edge (:78-81), producing
out-of-image crops; we implement the intended clamp and correct corner.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.cache import instance_cache
from ..configs import FaceAlignmentConfig
from ..ops.image import crop_resize, warp_affine
from ..ops.umeyama import umeyama_similarity_np


class FaceAlignment:
    def __init__(self, cfg: Optional[FaceAlignmentConfig] = None) -> None:
        self.cfg = cfg or FaceAlignmentConfig()
        self.template = np.asarray(self.cfg.standard_landmarks, dtype=np.float32)

    @instance_cache
    def _warp_jit(self, src_h: int, src_w: int):
        out_w, out_h = self.cfg.image_size

        def run(img, matrix):
            return warp_affine(img.astype(jnp.float32), matrix, out_h, out_w)

        return jax.jit(run)

    @instance_cache
    def _crop_jit(self, src_h: int, src_w: int):
        out_w, out_h = self.cfg.image_size

        def run(img, box):
            return crop_resize(img.astype(jnp.float32), box, out_h, out_w)

        return jax.jit(run)

    def estimate(self, landmarks: np.ndarray) -> Optional[np.ndarray]:
        """Landmarks -> template 2x3 similarity, or None if degenerate."""
        lm = np.asarray(landmarks, dtype=np.float32)
        if lm.shape != self.template.shape:
            return None
        spread = (lm - lm.mean(axis=0)).astype(np.float64)
        if (spread**2).sum() < 1e-6:  # coincident points: no similarity exists
            return None
        m = umeyama_similarity_np(lm, self.template)
        if not np.isfinite(m).all():
            return None
        return m

    def __call__(
        self,
        image_bgr: np.ndarray,
        bbox: Optional[np.ndarray],
        landmarks: Optional[np.ndarray],
    ) -> np.ndarray:
        """Align one face; returns (112, 112, 3) float32 BGR in [0, 255]."""
        src_h, src_w = image_bgr.shape[:2]
        matrix = self.estimate(landmarks) if landmarks is not None else None

        if matrix is not None:
            fn = self._warp_jit(src_h, src_w)
            out = fn(jnp.asarray(image_bgr), jnp.asarray(matrix))
            return np.asarray(out)

        # Fallback: margin crop (reference :64-116 with the clamp fixed).
        if bbox is None:
            det = np.array(
                [
                    src_w * 0.0625,
                    src_h * 0.0625,
                    src_w - src_w * 0.0625,
                    src_h - src_h * 0.0625,
                ],
                dtype=np.float32,
            )
        else:
            det = np.asarray(bbox[:4], dtype=np.float32)

        margin = 44.0
        bb = np.array(
            [
                max(det[0] - margin / 2.0, 0.0),
                max(det[1] - margin / 2.0, 0.0),
                min(det[2] + margin / 2.0, src_w - 1.0),
                min(det[3] + margin / 2.0, src_h - 1.0),
            ],
            dtype=np.float32,
        )
        bb = np.floor(bb)  # reference casts corners to i32 before the ROI
        if bb[2] < bb[0] or bb[3] < bb[1]:
            # A bbox entirely outside the frame inverts under the clamps;
            # the reference's Mat::roi would error on the invalid Rect —
            # fail loudly rather than sample a negative-extent crop.
            raise ValueError(
                f"bbox {det.tolist()} lies outside the {src_w}x{src_h} image"
            )
        fn = self._crop_jit(src_h, src_w)
        out = fn(jnp.asarray(image_bgr), jnp.asarray(bb))
        return np.asarray(out)
