"""ArcFace embedding extraction (the `face_identification` model).

Rework of the reference's FaceExtraction
(/root/reference/src/pipeline/module/face_extraction.rs): the serial
batch_size-stepped gRPC loop (:98-161) becomes one batched on-device forward;
preprocessing (resize 112, BGR->RGB, (px-127.5)*0.0078125, :38-77) fuses into
the same graph.

L2 normalization: per-row.  The reference's normalize_outputs
(utils.rs:148-154) divides each batch chunk by its whole-matrix Frobenius
norm, which equals the row norm at its default batch_size=1 — per-row is the
evident intent and is what downstream cosine similarity assumes (documented
deviation for batch > 1).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.cache import instance_cache
from ..configs import FaceIdentificationConfig
from ..models.registry import ModelRegistry, default_registry
from ..ops.image import bgr_to_rgb, normalize, resize_bilinear


#: ArcFace preprocessing constants (face_extraction.rs:69): (px-127.5)*0.0078125.
EMBED_MEAN = (127.5, 127.5, 127.5)
EMBED_SCALE = (0.0078125, 0.0078125, 0.0078125)


class FaceExtraction:
    def __init__(
        self,
        cfg: Optional[FaceIdentificationConfig] = None,
        registry: Optional[ModelRegistry] = None,
        model=None,
        variables=None,
        quantized: bool = False,
    ) -> None:
        self.cfg = cfg or FaceIdentificationConfig()
        if model is None or variables is None:
            registry = registry or default_registry()
            model, variables = registry.get(self.cfg.model_name)
        self.model = model
        self.quantized = quantized
        if quantized:
            # Weight-only int8: params stored int8 + per-channel scales,
            # dequantized inside the jit graph (ops/quantize.py).
            import jax as _jax

            from ..ops.quantize import quantize_tree

            host_vars = _jax.device_get(variables)
            variables = dict(host_vars)
            variables["params"] = quantize_tree(host_vars["params"])
            # Resident on device once: int8 leaves stream from HBM per call
            # instead of re-uploading from host.
            variables = _jax.tree.map(_jax.numpy.asarray, variables)
        self.variables = variables
        self._registry = registry

    @instance_cache
    def _jit_for(self, batch: int, src_h: int, src_w: int):
        out_w, out_h = self.cfg.image_size

        def run(variables, imgs_bgr):
            if self.quantized:
                from ..ops.quantize import dequantize_tree

                variables = dict(variables)
                variables["params"] = dequantize_tree(variables["params"])
            x = jax.vmap(lambda im: resize_bilinear(im, out_h, out_w))(
                imgs_bgr.astype(jnp.float32)
            )
            x = bgr_to_rgb(x)
            x = normalize(x, EMBED_MEAN, EMBED_SCALE)
            emb = self.model.apply(variables, x, train=False)  # (B, D)
            norm = jnp.linalg.norm(emb, axis=1, keepdims=True)
            return emb / jnp.maximum(norm, 1e-12)

        return jax.jit(run)

    def __call__(self, imgs_bgr: Sequence[np.ndarray]) -> np.ndarray:
        """Embed aligned BGR crops -> (N, embedding_dim) float32, L2-normalized rows."""
        if len(imgs_bgr) == 0:
            return np.zeros((0, self.cfg.embedding_dim), np.float32)
        stack = jnp.asarray(np.stack(imgs_bgr))
        fn = self._jit_for(stack.shape[0], stack.shape[1], stack.shape[2])
        start = time.perf_counter()
        out = np.asarray(fn(self.variables, stack))
        if self._registry is not None:
            self._registry.record(
                self.cfg.model_name, stack.shape[0], time.perf_counter() - start
            )
        return out
