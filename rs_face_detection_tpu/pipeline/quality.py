"""Face-quality classification (Bad / Good / WearingMask / WearingSunGlasses).

Rework of the reference's FaceQuality
(/root/reference/src/pipeline/module/face_quality.rs): the per-image host
loop — cv2 resize, BGR->RGB, a 3*112*112 scalar normalize loop (:89-96), one
gRPC call per image — becomes a single jit graph that resizes, normalizes and
classifies the whole batch on device.

Semantics preserved: ImageNet mean/std normalization constants (:43-44),
argmax class with threshold demotion — class 1 below `threshold` drops to
class 0 and reports class 0's probability (:160-166).
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.cache import instance_cache
from ..configs import FaceQualityConfig
from ..models.registry import ModelRegistry, default_registry
from ..ops.image import bgr_to_rgb, normalize, resize_bilinear

_MEAN = (123.675, 116.28, 103.53)
_STD = (0.01712475, 0.017507, 0.01742919)


def demote_quality(probs, threshold: float):
    """Argmax + threshold demotion (face_quality.rs:160-166).

    Class 1 (Good) below `threshold` demotes to class 0 (Bad), reporting
    class 0's probability.  Shared by the staged module and the fused
    pipeline tails so the rule lives in one place.
    """
    import numpy as _np

    predict = int(_np.argmax(probs))
    score = float(probs[predict])
    if predict == 1 and score < threshold:
        predict = 0
        score = float(probs[0])
    return predict, score


class FaceQuality:
    def __init__(
        self,
        cfg: Optional[FaceQualityConfig] = None,
        registry: Optional[ModelRegistry] = None,
        model=None,
        variables=None,
    ) -> None:
        self.cfg = cfg or FaceQualityConfig()
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
            x = normalize(x, _MEAN, _STD)
            return self.model.apply(variables, x, train=False)  # (B, 4) probs

        return jax.jit(run)

    def probabilities(self, imgs_bgr: Sequence[np.ndarray]) -> np.ndarray:
        """Raw (B, 4) class probabilities for same-shaped BGR crops."""
        stack = jnp.asarray(np.stack(imgs_bgr))
        fn = self._jit_for(stack.shape[0], stack.shape[1], stack.shape[2])
        start = time.perf_counter()
        out = np.asarray(fn(self.variables, stack))
        if self._registry is not None:
            self._registry.record(
                self.cfg.model_name, stack.shape[0], time.perf_counter() - start
            )
        return out

    def __call__(
        self, imgs_bgr: Sequence[np.ndarray]
    ) -> Tuple[List[float], List[int]]:
        """Classify crops; returns (scores, class indices) per image."""
        if len(imgs_bgr) == 0:
            return [], []
        probs = self.probabilities(imgs_bgr)
        scores: List[float] = []
        classes: List[int] = []
        for row in probs:
            predict, score = demote_quality(row, self.cfg.threshold)
            classes.append(predict)
            scores.append(score)
        return scores, classes
