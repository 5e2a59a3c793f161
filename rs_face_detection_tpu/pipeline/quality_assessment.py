"""Scalar face-quality assessment (the `face_quality_assetment` model).

Rework of the reference's FaceQualityAssessment
(/root/reference/src/pipeline/module/face_quality_assessment.rs): per-image
resize 112 + BGR->RGB + (px-127.5)*0.00784313725 + gRPC loop (:48-160)
becomes one batched jit graph.  A score above `threshold` (55.0 on the 0-100
scale) passes (:150-155).  Standalone module, not invoked by
FacePipeline.extract — same as the reference.
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.cache import instance_cache
from ..configs import FaceQualityAssessmentConfig
from ..models.registry import ModelRegistry, default_registry
from ..ops.image import bgr_to_rgb, normalize, resize_bilinear


class FaceQualityAssessment:
    def __init__(
        self,
        cfg: Optional[FaceQualityAssessmentConfig] = None,
        registry: Optional[ModelRegistry] = None,
        model=None,
        variables=None,
    ) -> None:
        self.cfg = cfg or FaceQualityAssessmentConfig()
        if model is None or variables is None:
            registry = registry or default_registry()
            model, variables = registry.get(self.cfg.model_name)
        self.model = model
        self.variables = variables
        self._registry = registry

    @instance_cache
    def _jit_for(self, batch: int, src_h: int, src_w: int):
        out_w, out_h = self.cfg.image_size

        def run(variables, imgs_bgr):
            x = jax.vmap(lambda im: resize_bilinear(im, out_h, out_w))(
                imgs_bgr.astype(jnp.float32)
            )
            x = bgr_to_rgb(x)
            x = normalize(x, (127.5,) * 3, (0.00784313725,) * 3)
            return self.model.apply(variables, x, train=False)  # (B, 1)

        return jax.jit(run)

    def __call__(
        self, imgs_bgr: Sequence[np.ndarray]
    ) -> Tuple[List[float], List[int]]:
        """Score crops; returns (scores, pass flags (score > threshold))."""
        if len(imgs_bgr) == 0:
            return [], []
        stack = jnp.asarray(np.stack(imgs_bgr))
        fn = self._jit_for(stack.shape[0], stack.shape[1], stack.shape[2])
        start = time.perf_counter()
        out = np.asarray(fn(self.variables, stack)).reshape(-1)
        if self._registry is not None:
            self._registry.record(
                self.cfg.model_name, stack.shape[0], time.perf_counter() - start
            )
        scores = [float(s) for s in out]
        flags = [1 if s > self.cfg.threshold else 0 for s in scores]
        return scores, flags
