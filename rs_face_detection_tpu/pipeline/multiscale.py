"""Size-bucketed multi-scale detection (high-res inference path).

XLA requires static shapes, so arbitrary input resolutions are served by a
small set of detector-input buckets (BASELINE.json config 3 — high-res
1920x1080 letterboxed inference).  RetinaFace/SCRFD are fully convolutional:
ONE set of weights serves every bucket; each bucket gets its own precomputed
anchor table and compiled executable, and images route to the smallest bucket
that preserves their resolution (anything larger than the biggest bucket is
letterboxed down, exactly like the reference's fixed 640 path).

This replaces the reference's single hardcoded 640x640 input
(face_pipeline/config.rs:27) with a resolution ladder at zero weight cost.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..configs import FaceDetectionConfig
from .detection import RetinaFaceDetection

DEFAULT_BUCKETS: Tuple[Tuple[int, int], ...] = ((640, 640), (1280, 768), (1920, 1088))


class MultiScaleDetection:
    """Route images to per-resolution compiled detectors sharing one model."""

    def __init__(
        self,
        buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
        cfg: Optional[FaceDetectionConfig] = None,
        registry=None,
        nms_mode: str = "fixpoint",
        model=None,
        variables=None,
        detector_factory=None,
    ) -> None:
        """detector_factory(image_size, model, variables) -> detector lets
        any duck-typed detector family build the ladder (e.g. SCRFD:
        ``lambda size, m, v: SCRFDDetection(model=m, variables=v,
        image_size=size)``); default = RetinaFaceDetection with this cfg."""
        if not buckets:
            raise ValueError("need at least one bucket")
        base = cfg or FaceDetectionConfig()
        # Sort ascending by area; detectors share model + variables.
        self.buckets = sorted(
            (tuple(b) for b in buckets), key=lambda b: b[0] * b[1]
        )
        first_cfg = self._cfg_for(base, self.buckets[0])
        if detector_factory is None:
            first = RetinaFaceDetection(
                first_cfg,
                registry=registry,
                nms_mode=nms_mode,
                model=model,
                variables=variables,
            )

            def detector_factory(size, m, v):
                # Propagate the first detector's registry so EVERY bucket's
                # traffic feeds the model statistics, not just the smallest.
                det = RetinaFaceDetection(
                    self._cfg_for(base, size),
                    nms_mode=nms_mode,
                    model=m,
                    variables=v,
                )
                det._registry = first._registry
                return det

        else:
            first = detector_factory(self.buckets[0], model, variables)
        self.detectors = {self.buckets[0]: first}
        for bucket in self.buckets[1:]:
            self.detectors[bucket] = detector_factory(
                bucket, first.model, first.variables
            )

    @staticmethod
    def _cfg_for(base: FaceDetectionConfig, bucket: Tuple[int, int]):
        import dataclasses

        return dataclasses.replace(base, image_size=bucket)

    def pick_bucket(self, height: int, width: int) -> Tuple[int, int]:
        """Smallest bucket that fully contains the (letterboxed) image."""
        for bucket in self.buckets:
            bw, bh = bucket
            if width <= bw and height <= bh:
                return bucket
        return self.buckets[-1]

    def __call__(self, image_bgr: np.ndarray):
        h, w = image_bgr.shape[:2]
        return self.detectors[self.pick_bucket(h, w)](image_bgr)
