"""eKYC pipeline: ID-document face vs selfie verification.

The reference planned this as its second pipeline but shipped an empty struct
(/root/reference/src/pipeline/ekyc_pipeline/pipeline.rs:3-6); only the model
family and thresholds exist in its config
(src/pipeline/ekyc_pipeline/config.rs): SCRFD detector, `face_id` embeddings
with same-person/same-ekyc cosine thresholds 0.4/0.3, a mask-attribute head
(threshold 0.5 @ 128px), `face_quality_vp`, and CLIP-L/14 anti-spoofing on
face-crop and full-image inputs (thresholds 0.58 / 0.48 @ 224, ImageNet
normalization).

This module implements that capability end to end, TPU-first: SCRFD
distance-decode detection reuses the fused select/NMS machinery, every head
runs as one batched jit graph, and verify() is the public API:

    result = EKYCPipeline().verify(card_bytes, selfie_bytes)
    result.same_person, result.similarity, result.selfie_live, ...
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.cache import instance_cache
from ..configs import (
    EkycFaceAttributeConfig,
    EkycFaceDetectionConfig,
    EkycFaceIDConfig,
    EkycFaceQualityConfig,
    EkycFASCropConfig,
    EkycFASFullConfig,
    FaceAlignmentConfig,
    FaceDetectionConfig,
)
from ..models.registry import ModelRegistry, default_registry
from ..ops.box_decode import clip_boxes, distance2bbox, distance2kps
from ..ops.image import bgr_to_rgb, letterbox, normalize, resize_bilinear
from ..utils.image_io import decode_image_bytes
from .alignment import FaceAlignment
from .detection import PaddedDetections, select_and_nms


def scrfd_anchor_centers(
    image_size: Tuple[int, int], strides=(8, 16, 32), num_anchors: int = 2
) -> Tuple[np.ndarray, list]:
    """Anchor centers (total, 2) + level info [(stride, h, w, A)].

    Centers are (x*stride, y*stride), repeated per anchor, flattened in
    (h, w, a) order to match the NHWC head maps.
    """
    width, height = image_size
    centers = []
    levels = []
    for s in strides:
        fh, fw = -(-height // s), -(-width // s)
        xs = (np.arange(fw, dtype=np.float32) * s)[None, :, None]
        ys = (np.arange(fh, dtype=np.float32) * s)[:, None, None]
        grid = np.zeros((fh, fw, num_anchors, 2), np.float32)
        grid[..., 0] = xs
        grid[..., 1] = ys
        centers.append(grid.reshape(-1, 2))
        levels.append((s, fh, fw, num_anchors))
    return np.concatenate(centers), levels


class SCRFDDetection:
    """SCRFD detector with the same host contract as RetinaFaceDetection."""

    def __init__(
        self,
        cfg: Optional[EkycFaceDetectionConfig] = None,
        registry: Optional[ModelRegistry] = None,
        image_size: Tuple[int, int] = (640, 640),
        confidence_threshold: float = 0.5,
        iou_threshold: float = 0.45,
        # NMS cost is quadratic in the candidate cap; 256 matches the tuned
        # RetinaFace path (commit 08410a0) — at conf 0.5, >256 survivors
        # do not occur on real scenes.
        max_candidates: int = 256,
        max_detections: int = 100,
        nms_mode: str = "fixpoint",
        model=None,
        variables=None,
    ) -> None:
        self.cfg = cfg or EkycFaceDetectionConfig()
        if (model is None) != (variables is None):
            raise ValueError(
                "pass model AND variables together (or neither, to take "
                "both from the registry)"
            )
        if model is None:
            registry = registry or default_registry()
            model, variables = registry.get(self.cfg.model_name)
        self.model = model
        self.variables = variables
        self.image_size = image_size
        self.nms_mode = nms_mode
        self._registry = registry
        centers, levels = scrfd_anchor_centers(image_size)
        self.centers = jnp.asarray(centers)
        self.levels = levels
        # Reuse the static-shape select/NMS stage via a detection-config shim.
        self._sel_cfg = FaceDetectionConfig(
            image_size=image_size,
            confidence_threshold=confidence_threshold,
            iou_threshold=iou_threshold,
            max_candidates=max_candidates,
            max_detections=max_detections,
        )

    def _decode(self, net_out, centers_table=None):
        """Flatten per-stride maps and distance-decode against the center
        table.  `centers_table` overrides self.centers (same row count) —
        the packed-head path passes a packed_anchor_perm-permuted table so
        packed-order maps decode without any relayout (decode is order-
        agnostic past the center lookup)."""
        width, height = self.image_size
        table = self.centers if centers_table is None else centers_table
        scores_l, boxes_l, kps_l = [], [], []
        offset = 0
        for stride, fh, fw, a in self.levels:
            maps = net_out[stride]
            k = fh * fw * a
            centers = jax.lax.dynamic_slice_in_dim(table, offset, k, 0)
            scores_l.append(maps["score"].reshape(k))
            dist = maps["bbox"].reshape(fh, fw, a, 4).reshape(k, 4) * float(stride)
            boxes = clip_boxes(distance2bbox(centers, dist), (height, width))
            boxes_l.append(boxes)
            kd = maps["kps"].reshape(fh, fw, a, 5, 2).reshape(k, 5, 2) * float(stride)
            kps_l.append(distance2kps(centers, kd))
            offset += k
        return (
            jnp.concatenate(scores_l),
            jnp.concatenate(boxes_l),
            jnp.concatenate(kps_l),
        )

    @instance_cache
    def _jit_for_shape(self, src_h: int, src_w: int):
        width, height = self.image_size
        mean, scale = self.cfg.mean, self.cfg.scale

        def run(variables, img_u8):
            padded, det_scale = letterbox(img_u8, width, height)
            x = bgr_to_rgb(padded)
            x = normalize(x, (mean,) * 3, (scale,) * 3)
            net_out = self.model.apply(variables, x[None], train=False)
            single = jax.tree.map(lambda t: t[0], net_out)
            scores, boxes, kps = self._decode(single)
            padded_out = select_and_nms(scores, boxes, kps, self._sel_cfg, self.nms_mode)
            inv = jnp.float32(1.0 / det_scale)
            return PaddedDetections(
                padded_out.det.at[:, :4].multiply(inv),
                padded_out.kps * inv,
                padded_out.count,
            )

        return jax.jit(run)

    def record_traffic(self, n_images: int, duration_s: float) -> None:
        """Feed registry statistics for traffic served outside __call__
        (batched serving via DetectionServer)."""
        if self._registry is not None:
            self._registry.record(self.cfg.model_name, n_images, duration_s)

    def make_batched_fn(
        self, stem: str = "xla", pre_s2d: bool = False, packed_heads=None
    ):
        """Jitted (variables, images u8 BGR, (B,) det_scales) -> PaddedDetections batch.

        Batched serving path with the same contract as
        RetinaFaceDetection.make_batched_fn: images arrive letterboxed
        host-side to the static `image_size`; normalize, forward, distance
        decode, select and NMS trace into one vmapped XLA program.  Decode
        math is identical to the single-image path (`_jit_for_shape`) —
        parity-tested in tests/test_scrfd_decode.py.

        stem: "xla" (default; input (B, H, W, 3)) | "s4d" | "auto".
          "s4d" switches the input contract to the 4x4 space-to-depth host
          layout (B, H/4, W/4, 48) uint8 (ops.image.s4d_layout_host / the
          native loader) and runs both stem convs as dense MXU-shaped 2x2
          convs on the quarter grid (ops/scrfd_s4d.py, f32-exact); the
          weight folds ride the fn.fold/fn.jitted aux protocol.

        packed_heads (s4d path only): run the shared head on the
        half-resolution grid at 4x channels (ops/scrfd_packed.py — the
        64-channel tower wastes half the MXU lanes at natural layout),
        consuming packed-order maps through a permuted centers table.
        Accepts an iterable of pyramid levels (0=stride 8, 1=16, 2=32),
        True (all even-grid levels), False/None (off — opt-in pending a
        hardware A/B, tools/ab_scrfd.py).
        """
        if stem not in ("xla", "auto", "s4d"):
            raise ValueError(f"stem={stem!r} not in ('xla', 'auto', 's4d')")
        if pre_s2d:
            raise ValueError("SCRFD has no s2d-stem layout")
        width, height = self.image_size
        use_s4d = stem == "s4d"
        if use_s4d and not (
            getattr(self.model, "backbone", None) == "scrfd"
            and "stem1" in self.variables.get("params", {})
            and width % 4 == 0
            and height % 4 == 0
        ):
            raise ValueError(
                "stem='s4d' needs the in-house SCRFD stem layout "
                "(stem1/stem2 params) and image dims divisible by 4"
            )
        grid_by_stride = {s: (fh, fw) for s, fh, fw, _a in self.levels}
        eligible = tuple(
            i
            for i, s in enumerate((8, 16, 32))
            if use_s4d
            and s in grid_by_stride
            and grid_by_stride[s][0] % 2 == 0
            and grid_by_stride[s][1] % 2 == 0
        )
        from ..ops.ssh_packed import resolve_packed_levels

        # SCRFD default (None) = off, pending a hardware A/B.
        packed_levels = resolve_packed_levels(
            packed_heads, eligible,
            hint="needs stem='s4d' and even feature grids",
        )
        packed_strides = tuple(8 * 2**i for i in packed_levels)
        mean, scale = self.cfg.mean, self.cfg.scale

        centers_decode = self.centers
        if packed_levels:
            import numpy as _np

            from ..ops.ssh_packed import permute_table_for_packed

            centers_decode = jnp.asarray(
                permute_table_for_packed(
                    _np.asarray(self.centers), self.levels, set(packed_strides)
                )
            )

        def decode_one(single, inv_scale):
            scores, boxes, kps = self._decode(single, centers_decode)
            p = select_and_nms(
                scores, boxes, kps, self._sel_cfg, self.nms_mode
            )
            return PaddedDetections(
                p.det.at[:, :4].multiply(inv_scale),
                p.kps * inv_scale,
                p.count,
            )

        if not use_s4d:
            def batched(variables, imgs_u8, det_scales):
                x = bgr_to_rgb(imgs_u8.astype(jnp.float32))
                x = normalize(x, (mean,) * 3, (scale,) * 3)
                net_out = self.model.apply(variables, x, train=False)
                return jax.vmap(decode_one)(net_out, 1.0 / det_scales)

            return jax.jit(batched)

        from ..ops.scrfd_s4d import fold_scrfd_s4d_params, scrfd_s4d_front

        def fold_aux(variables):
            aux = {"front": fold_scrfd_s4d_params(variables, mean, scale)}
            if packed_levels:
                from ..ops.scrfd_packed import fold_scrfd_head_packed

                aux["head"] = fold_scrfd_head_packed(variables)
            return aux

        def batched_s4d(variables, aux, imgs_s4d_u8, det_scales):
            dt = getattr(self.model, "dtype", jnp.float32)
            front = scrfd_s4d_front(
                imgs_s4d_u8, aux["front"], compute_dtype=dt, out_dtype=dt
            )
            net_out = self.model.apply(
                variables, front, train=False, stem_precomputed=True,
                skip_head_strides=packed_strides,
            )
            if packed_levels:
                from ..ops.scrfd_packed import scrfd_head_packed

                net_out = dict(net_out)
                for s in packed_strides:
                    net_out[s] = scrfd_head_packed(
                        net_out[s]["feat"], aux["head"], compute_dtype=dt
                    )
            return jax.vmap(decode_one)(net_out, 1.0 / det_scales)

        from .detection import make_folding_fn

        return make_folding_fn(batched_s4d, fold_aux)

    def __call__(self, image_bgr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        h, w = image_bgr.shape[:2]
        start = time.perf_counter()
        out = self._jit_for_shape(h, w)(self.variables, jnp.asarray(image_bgr))
        # Single device->host sync for all three outputs.
        count, det, kps = jax.device_get((out.count, out.det, out.kps))
        n = int(count)
        if self._registry is not None:
            self._registry.record(
                self.cfg.model_name, 1, time.perf_counter() - start
            )
        return det[:n], kps[:n]


@dataclass
class EKYCResult:
    """Verification outcome between an ID-document face and a selfie."""

    similarity: float = 0.0
    same_person: bool = False
    same_ekyc: bool = False
    card_face_found: bool = False
    selfie_face_found: bool = False
    selfie_mask: Optional[bool] = None
    selfie_quality: Optional[float] = None
    selfie_covered: Optional[bool] = None
    selfie_live_crop: Optional[bool] = None
    selfie_live_full: Optional[bool] = None
    card_face_box: Optional[np.ndarray] = None
    selfie_face_box: Optional[np.ndarray] = None


class EKYCPipeline:
    """verify(card_bytes, selfie_bytes) -> EKYCResult."""

    def __init__(
        self,
        registry: Optional[ModelRegistry] = None,
        nms_mode: str = "fixpoint",
        detector_image_size: Tuple[int, int] = (640, 640),
    ) -> None:
        registry = registry or default_registry()
        self.id_cfg = EkycFaceIDConfig()
        self.attr_cfg = EkycFaceAttributeConfig()
        self.quality_cfg = EkycFaceQualityConfig()
        self.fas_crop_cfg = EkycFASCropConfig()
        self.fas_full_cfg = EkycFASFullConfig()

        self.detection = SCRFDDetection(
            registry=registry, image_size=detector_image_size, nms_mode=nms_mode
        )
        self.alignment = FaceAlignment(FaceAlignmentConfig())
        self._face_id = registry.get(self.id_cfg.model_name)
        self._attribute = registry.get(self.attr_cfg.model_name)
        self._quality = registry.get(self.quality_cfg.model_name)
        self._fas_crop = registry.get(self.fas_crop_cfg.model_name)
        self._fas_full = registry.get(self.fas_full_cfg.model_name)

    # -- jitted heads ------------------------------------------------------

    @instance_cache
    def _embed_jit(self, batch: int):
        model, _ = self._face_id
        mean, scale = self.id_cfg.mean, self.id_cfg.scale

        def run(variables, imgs_bgr):
            x = normalize(bgr_to_rgb(imgs_bgr), (mean,) * 3, (scale,) * 3)
            emb = model.apply(variables, x, train=False)
            return emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)

        return jax.jit(run)

    @instance_cache
    def _head_jit(self, which: str, batch: int, src_h: int, src_w: int):
        if which == "attribute":
            model, _ = self._attribute
            size = (self.attr_cfg.imsize, self.attr_cfg.imsize)
            mean = (self.attr_cfg.mean,) * 3
            scale = (self.attr_cfg.scale,) * 3
        elif which == "quality":
            model, _ = self._quality
            size = (self.quality_cfg.imsize, self.quality_cfg.imsize)
            mean = self.quality_cfg.mean
            scale = self.quality_cfg.scale
        elif which == "fas_crop":
            model, _ = self._fas_crop
            size = (self.fas_crop_cfg.imsize, self.fas_crop_cfg.imsize)
            mean = tuple(m * 255.0 for m in self.fas_crop_cfg.mean)
            scale = tuple(1.0 / (s * 255.0) for s in self.fas_crop_cfg.std)
        elif which == "fas_full":
            model, _ = self._fas_full
            size = (self.fas_full_cfg.imsize, self.fas_full_cfg.imsize)
            mean = tuple(m * 255.0 for m in self.fas_full_cfg.mean)
            scale = tuple(1.0 / (s * 255.0) for s in self.fas_full_cfg.std)
        else:
            raise ValueError(which)

        def run(variables, imgs_bgr):
            x = jax.vmap(lambda im: resize_bilinear(im, size[1], size[0]))(
                imgs_bgr.astype(jnp.float32)
            )
            x = normalize(bgr_to_rgb(x), mean, scale)
            return model.apply(variables, x, train=False)

        return jax.jit(run)

    def _dispatch_head(self, which: str, imgs: np.ndarray):
        """Async head dispatch: returns the device array future (gather with
        np.asarray) so independent heads overlap on device."""
        fn = self._head_jit(which, imgs.shape[0], imgs.shape[1], imgs.shape[2])
        variables = {
            "attribute": self._attribute,
            "quality": self._quality,
            "fas_crop": self._fas_crop,
            "fas_full": self._fas_full,
        }[which][1]
        return fn(variables, jnp.asarray(imgs))

    def _run_head(self, which: str, imgs: np.ndarray) -> np.ndarray:
        return np.asarray(self._dispatch_head(which, imgs))

    # -- public API --------------------------------------------------------

    def _best_face(self, image_bgr: np.ndarray):
        boxes, kps = self.detection(image_bgr)
        if boxes.shape[0] == 0:
            return None, None
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        i = int(np.argmax(areas))
        return boxes[i], kps[i]

    def verify(self, card_bytes: bytes, selfie_bytes: bytes) -> EKYCResult:
        card = decode_image_bytes(card_bytes)
        selfie = decode_image_bytes(selfie_bytes)
        return self.verify_images(card, selfie)

    def verify_images(
        self, card_bgr: np.ndarray, selfie_bgr: np.ndarray
    ) -> EKYCResult:
        result = EKYCResult()

        card_box, card_kps = self._best_face(card_bgr)
        selfie_box, selfie_kps = self._best_face(selfie_bgr)
        result.card_face_found = card_box is not None
        result.selfie_face_found = selfie_box is not None
        result.card_face_box = card_box
        result.selfie_face_box = selfie_box
        if card_box is None or selfie_box is None:
            return result

        card_face = self.alignment(card_bgr, card_box, card_kps)
        selfie_face = self.alignment(selfie_bgr, selfie_box, selfie_kps)

        faces = np.stack([card_face, selfie_face])
        emb = np.asarray(
            self._embed_jit(2)(self._face_id[1], jnp.asarray(faces))
        )
        result.similarity = float(np.dot(emb[0], emb[1]))
        result.same_person = result.similarity >= self.id_cfg.threshold_same_person
        result.same_ekyc = result.similarity >= self.id_cfg.threshold_same_ekyc

        # The full-frame FAS input is resized to the model's static size on
        # HOST (matching the serving letterbox's cv2 INTER_LINEAR) so the
        # ViT-L/14 graph compiles ONCE — an in-graph resize keyed on the
        # selfie's (H, W) would recompile the largest model in the system
        # for every novel phone resolution (minutes each on the remote TPU).
        full_size = self.fas_full_cfg.imsize
        try:
            import cv2 as _cv2

            selfie_full = _cv2.resize(
                selfie_bgr, (full_size, full_size),
                interpolation=_cv2.INTER_LINEAR,
            )
        except ImportError:  # cv2-less host: the in-graph resize still works
            selfie_full = selfie_bgr

        # Dispatch every independent head before the first host sync: XLA's
        # async dispatch overlaps them, and through the tunneled TPU each
        # synchronous round trip costs ~29 ms of fixed latency.
        face1 = selfie_face[None]
        attr_d = self._dispatch_head("attribute", face1)
        quality_d = self._dispatch_head("quality", face1)
        fas_crop_d = self._dispatch_head("fas_crop", face1)
        fas_full_d = self._dispatch_head(
            "fas_full", selfie_full[None].astype(np.float32)
        )

        attr = np.asarray(attr_d)
        result.selfie_mask = bool(attr[0, 1] > self.attr_cfg.threshold_face_mask)
        # Builder output spec: col 0 = P(not covered), col 1 = P(covered).
        # selfie_quality reports P(uncovered); threshold_cover gates the
        # boolean.  threshold_all is carried from the reference config
        # (ekyc_pipeline/config.rs:74-87) whose stub pipeline never read
        # it — kept for config-surface parity only.
        quality = np.asarray(quality_d)
        result.selfie_quality = float(quality.reshape(-1)[0])
        result.selfie_covered = bool(
            quality[0, 1] > self.quality_cfg.threshold_cover
        )

        fas_crop = np.asarray(fas_crop_d)
        result.selfie_live_crop = bool(fas_crop[0, 1] > self.fas_crop_cfg.threshold)
        fas_full = np.asarray(fas_full_d)
        result.selfie_live_full = bool(fas_full[0, 1] > self.fas_full_cfg.threshold)
        return result
