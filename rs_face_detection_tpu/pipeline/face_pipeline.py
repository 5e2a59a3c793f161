"""FacePipeline: the end-to-end face-ID extraction API.

The public entry point, mirroring the reference's FacePipeline
(/root/reference/src/pipeline/face_pipeline/pipeline.rs): `extract(im_bytes)`
decodes, detects, selects one face, aligns it, classifies quality and
extracts a 512-d embedding, returning a FaceExtractionResult with the exact
reference result schema (:42-49).

Where the reference's constructor dials Triton and fetches three model
configs over gRPC (:81-116), this constructor resolves models from the
in-process registry.  The three ModelInfer round-trips per extract()
(detect, quality, embed — :198-237) become three jit dispatches with no wire.

Documented deviation (SURVEY.md §7): the reference's `if let _x = ...`
always-true binding (:215) makes it align/classify/embed a default center
crop even when selection finds no face; by default we skip those stages and
return an empty result when no face is selected (``process_on_no_face=True``
restores the reference behavior).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..configs import FacePipelineConfig, FaceQualityClass
from ..models.registry import ModelRegistry, default_registry
from ..utils.cache import instance_cache
from ..utils.image_io import decode_image_bytes
from .alignment import FaceAlignment
from .detection import RetinaFaceDetection
from .extraction import FaceExtraction
from .quality import FaceQuality
from .selection import FaceSelection


@dataclass
class FaceExtractionResult:
    """Mirror of the reference FaceExtractionResult (pipeline.rs:42-49)."""

    face_count: int = 0
    face_quality: Optional[FaceQualityClass] = None
    quality_score: Optional[float] = None
    facial_feature: Optional[np.ndarray] = None  # (512,)
    selected_face_box: Optional[np.ndarray] = None  # (5,)


class FacePipeline:
    def __init__(
        self,
        config: Optional[FacePipelineConfig] = None,
        registry: Optional[ModelRegistry] = None,
        is_enroll: bool = False,
        is_debug: bool = False,
        process_on_no_face: bool = False,
        nms_mode: str = "fixpoint",
    ) -> None:
        self.config = config or FacePipelineConfig()
        registry = registry or default_registry()
        self.enroll = is_enroll
        self.debug = is_debug
        self.process_on_no_face = process_on_no_face

        self.face_detection = RetinaFaceDetection(
            self.config.detection, registry=registry, nms_mode=nms_mode
        )
        self.face_selection = FaceSelection(self.config.selection)
        self.face_alignment = FaceAlignment(self.config.alignment)
        self.face_quality = FaceQuality(self.config.quality, registry=registry)
        self.face_extraction = FaceExtraction(
            self.config.identification, registry=registry
        )
        self._registry = registry

    @instance_cache
    def _fused_tail_jit(self, src_h: int, src_w: int):
        """One jit graph for align-warp -> quality probs + embedding.

        The reference pays one RPC per stage (pipeline.rs:216-237); even
        in-process, separate dispatches pay host<->device latency per stage.
        Warping the selected face and running both 112x112 heads on it is a
        single small graph — fuse it so extract() costs exactly two device
        dispatches (detect + tail).
        """
        import jax
        import jax.numpy as jnp

        from ..ops.image import bgr_to_rgb, normalize, resize_bilinear, warp_affine
        from .extraction import EMBED_MEAN, EMBED_SCALE
        from .quality import _MEAN as _Q_MEAN, _STD as _Q_STD

        out_w, out_h = self.config.alignment.image_size
        q_w, q_h = self.config.quality.image_size
        e_w, e_h = self.config.identification.image_size
        q_model = self.face_quality.model
        e_model = self.face_extraction.model

        def run(q_vars, e_vars, img_u8, matrix):
            face = warp_affine(img_u8.astype(jnp.float32), matrix, out_h, out_w)
            rgb = bgr_to_rgb(face)
            # Per-head resize (no-op when head size == alignment size) keeps
            # parity with the staged modules under any config.
            q_in = resize_bilinear(rgb, q_h, q_w)[None]
            e_in = resize_bilinear(rgb, e_h, e_w)[None]
            q_probs = q_model.apply(
                q_vars, normalize(q_in, _Q_MEAN, _Q_STD), train=False
            )
            emb = e_model.apply(
                e_vars, normalize(e_in, EMBED_MEAN, EMBED_SCALE), train=False
            )
            emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
            return q_probs[0], emb[0]

        return jax.jit(run)

    def extract(self, im_bytes: bytes) -> FaceExtractionResult:
        """Decode bytes -> detect -> select -> align -> quality -> embed."""
        image = decode_image_bytes(im_bytes)
        return self.extract_image(image)

    @instance_cache
    def _batch_jits(self, batch: int):
        """Batched detect + batched fused tail for extract_batch."""
        import jax
        import jax.numpy as jnp

        from ..ops.image import bgr_to_rgb, normalize, resize_bilinear, warp_affine
        from .extraction import EMBED_MEAN, EMBED_SCALE
        from .quality import _MEAN as _Q_MEAN, _STD as _Q_STD

        # Eligible configs detect through the dense-stem s4d fast path
        # (ops/stem_s4d.py for R50, ops/mnet_s4d.py for the default
        # MobileNet0.25): the detect graph then consumes a host-side
        # (B, H/4, W/4, 48) reshuffle (cheap; native loader does it
        # threaded) while the fused tail still warps faces from the full
        # canvases — two small uploads instead of one.  Eligibility is the
        # detector's own make_batched_fn validation (probe, don't copy the
        # rules — the serving layer's inline copy drifted once already).
        width_d, height_d = self.config.detection.image_size
        detect_fn = None
        self._detect_layout = "none"
        if width_d % 4 == 0 and height_d % 4 == 0:
            try:
                detect_fn = self.face_detection.make_batched_fn(stem="s4d")
                self._detect_layout = "s4d"
            except ValueError:
                detect_fn = None
        if detect_fn is None:
            detect_fn = self.face_detection.make_batched_fn()
        out_w, out_h = self.config.alignment.image_size
        q_w, q_h = self.config.quality.image_size
        e_w, e_h = self.config.identification.image_size
        q_model = self.face_quality.model
        e_model = self.face_extraction.model

        def tail(q_vars, e_vars, imgs_u8, matrices):
            def warp_one(img, m):
                return warp_affine(img.astype(jnp.float32), m, out_h, out_w)

            faces = jax.vmap(warp_one)(imgs_u8, matrices)
            rgb = bgr_to_rgb(faces)
            q_in = jax.vmap(lambda f: resize_bilinear(f, q_h, q_w))(rgb)
            e_in = jax.vmap(lambda f: resize_bilinear(f, e_h, e_w))(rgb)
            q_probs = q_model.apply(
                q_vars, normalize(q_in, _Q_MEAN, _Q_STD), train=False
            )
            emb = e_model.apply(
                e_vars, normalize(e_in, EMBED_MEAN, EMBED_SCALE), train=False
            )
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12
            )
            return q_probs, emb

        return detect_fn, jax.jit(tail)

    def extract_batch(self, payloads) -> list:
        """Throughput-mode extract over a batch of images (bytes or BGR arrays).

        Two device dispatches total: one batched detect over letterboxed
        canvases, one fused warp+quality+embed over every selected face.
        Faces are warped from the letterboxed canvas (matrix rescaled by
        det_scale), so very large inputs are sampled at detector resolution —
        the single-image extract() path samples the original instead.
        """
        import time
        from concurrent.futures import ThreadPoolExecutor

        import jax.numpy as jnp

        from ..parallel.serving import letterbox_host
        from ..utils.image_io import decode_image_bytes as _decode

        n = len(payloads)
        if n == 0:
            return []
        width, height = self.config.detection.image_size

        def prep(p):
            img = _decode(p) if isinstance(p, (bytes, bytearray)) else p
            canvas, scale = letterbox_host(img, width, height)
            return img, canvas, scale

        with ThreadPoolExecutor(max_workers=min(8, n)) as pool:
            prepped = list(pool.map(prep, payloads))
        images = [p[0] for p in prepped]
        canvases = np.stack([p[1] for p in prepped])
        scales = np.asarray([p[2] for p in prepped], np.float32)

        detect_fn, tail_fn = self._batch_jits(n)
        detect_start = time.perf_counter()
        # One host->device transfer for the canvases: detect and the fused
        # tail share the same device buffer.
        import jax

        canvases_dev = jnp.asarray(canvases)
        if getattr(self, "_detect_layout", "none") == "s4d":
            from ..ops.image import s4d_layout_host

            try:
                from ..runtime import native as _native

                det_in = (
                    _native.s4d_batch(canvases)
                    if _native.available()
                    else s4d_layout_host(canvases)
                )
            except (ImportError, OSError, RuntimeError) as e:
                # Expected native-loader failure modes (missing .so, ABI
                # mismatch); anything else should surface, not be hidden.
                warnings.warn(
                    f"native s4d loader failed ({e!r}); numpy fallback",
                    RuntimeWarning,
                    stacklevel=2,
                )
                det_in = s4d_layout_host(canvases)
            det_in = jnp.asarray(det_in)
        else:
            det_in = canvases_dev
        det_out = detect_fn(
            self.face_detection.variables,
            det_in,
            jnp.asarray(scales),
        )
        # One device->host sync for all three outputs.
        counts, all_det, all_kps = jax.device_get(
            (det_out.count, det_out.det, det_out.kps)
        )
        if self._registry is not None:
            self._registry.record(
                self.config.detection.model_name,
                n,
                time.perf_counter() - detect_start,
            )

        results = [FaceExtractionResult() for _ in range(n)]
        matrices = np.zeros((n, 2, 3), np.float32)
        selected = np.zeros(n, bool)
        staged = []  # (index, box, points): crop-fallback / no-face-compat
        for i in range(n):
            boxes = all_det[i, : counts[i]]
            kps = all_kps[i, : counts[i]]
            results[i].face_count = int(counts[i])
            box, points = self.face_selection(
                images[i].shape[:2], boxes, kps, is_enroll=self.enroll
            )
            if box is None:
                if self.process_on_no_face:
                    staged.append((i, None, None))
                continue
            m = self.face_alignment.estimate(points) if points is not None else None
            if m is None:
                # Degenerate/missing landmarks: same margin-crop fallback as
                # extract_image, staged per image.
                results[i].selected_face_box = box
                staged.append((i, box, points))
                continue
            results[i].selected_face_box = box
            # Rescale: matrix maps original coords; we warp the letterboxed
            # canvas, where canvas = original * det_scale.
            m_canvas = m.copy()
            m_canvas[:, :2] /= scales[i]
            matrices[i] = m_canvas
            selected[i] = True

        from .quality import demote_quality

        if selected.any():
            tail_start = time.perf_counter()
            q_probs, embs = jax.device_get(
                tail_fn(
                    self.face_quality.variables,
                    self.face_extraction.variables,
                    canvases_dev,
                    jnp.asarray(matrices),
                )
            )
            if self._registry is not None:
                dur = time.perf_counter() - tail_start
                k = int(selected.sum())
                self._registry.record(self.config.quality.model_name, k, dur)
                self._registry.record(self.config.identification.model_name, k, dur)
            thr = self.config.quality.threshold
            for i in range(n):
                if not selected[i]:
                    continue
                predict, score = demote_quality(q_probs[i], thr)
                results[i].face_quality = FaceQualityClass(predict)
                results[i].quality_score = score
                results[i].facial_feature = embs[i]

        if staged:
            # Crop-fallback images (degenerate landmarks): align each on
            # host, then ONE batched quality call and ONE batched embed call
            # — the aligned crops share the static (112, 112, 3) shape, so
            # per-image dispatches would pay k extra device round trips.
            aligned = [
                self.face_alignment(images[i], box, points)
                for i, box, points in staged
            ]
            scores_q, classes_q = self.face_quality(aligned)
            feats = self.face_extraction(aligned)
            for j, (i, _, _) in enumerate(staged):
                results[i].face_quality = FaceQualityClass(classes_q[j])
                results[i].quality_score = scores_q[j]
                results[i].facial_feature = feats[j]
        return results

    def extract_image(self, image_bgr: np.ndarray) -> FaceExtractionResult:
        """Same as extract() for an already-decoded (H, W, 3) uint8 BGR image."""
        import jax.numpy as jnp

        result = FaceExtractionResult()

        # One host->device transfer: detect and the fused tail share it.
        img_dev = jnp.asarray(image_bgr)
        detections, key_points = self.face_detection(img_dev)
        result.face_count = int(detections.shape[0])
        if self.debug:
            print(f"face_pipeline - detections: {detections}")

        selected_box, selected_points = self.face_selection(
            image_bgr.shape[:2], detections, key_points, is_enroll=self.enroll
        )

        if selected_box is None and not self.process_on_no_face:
            return result

        # Fast path: a usable similarity transform lets warp + both heads run
        # as ONE fused dispatch; otherwise (crop fallback) stage separately.
        matrix = (
            self.face_alignment.estimate(selected_points)
            if selected_points is not None
            else None
        )
        if matrix is not None:
            import time

            from .quality import demote_quality

            fn = self._fused_tail_jit(*image_bgr.shape[:2])
            tail_start = time.perf_counter()
            q_probs, feature = fn(
                self.face_quality.variables,
                self.face_extraction.variables,
                img_dev,
                jnp.asarray(matrix),
            )
            q_probs = np.asarray(q_probs)
            features = np.asarray(feature)[None]
            if self._registry is not None:
                dur = time.perf_counter() - tail_start
                self._registry.record(self.config.quality.model_name, 1, dur)
                self._registry.record(
                    self.config.identification.model_name, 1, dur
                )
            predict, score = demote_quality(q_probs, self.config.quality.threshold)
            quality_classes, quality_scores = [predict], [score]
        else:
            aligned = self.face_alignment(image_bgr, selected_box, selected_points)
            quality_scores, quality_classes = self.face_quality([aligned])
            features = self.face_extraction([aligned])

        result.facial_feature = features[0]
        result.face_quality = FaceQualityClass(quality_classes[0])
        result.quality_score = quality_scores[0]
        result.selected_face_box = selected_box
        if self.debug:
            print(f"face_pipeline - result: {result}")
        return result


