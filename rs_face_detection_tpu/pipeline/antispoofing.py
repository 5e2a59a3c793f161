"""MiniFAS multi-scale anti-spoofing ensemble.

Rework of the reference's FaceAntiSpoofing
(/root/reference/src/pipeline/module/face_antispoofing.rs): four liveness
models at scales (4.0, 2.7, 2.0, 1.0) and input sizes 80/80/256/128 vote on
scale-clamped square crops around the detection; liveness = weighted mean of
each model's class-1 probability > threshold (:219-243, hardcoded 0.55).

Preserved semantics:
  - square crop geometry: c_x +/- 0.47 * det_height, top/bottom = det y range
    (:249-262);
  - _get_new_box scale clamping and edge-shifting (:342-385), with the crop
    weight = clamped_scale / requested_scale;
  - raw 0-255 pixels, original (BGR) channel order — the reference's double
    channel reversal nets out to identity (:61-68 and :203-210);
  - weighted class-1 mean across scales, live if > threshold (:228-239).

TPU-native: crop geometry is host scalar math; crop + resize + all four model
forwards run as one jit graph per scale (batched over faces).  Standalone
module, not invoked by FacePipeline.extract — same as the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.cache import instance_cache
from ..configs import FaceAntiSpoofingConfig
from ..models.registry import ModelRegistry, default_registry
from ..ops.image import crop_resize


def get_new_box(
    src_w: int, src_h: int, box_xywh: Tuple[float, float, float, float], scale: float
) -> Tuple[int, int, int, int, float]:
    """Scale-clamped square crop (face_antispoofing.rs:342-385).

    Returns integer (left, top, right, bottom) inclusive corners plus the
    weight = achieved_scale / requested_scale.
    """
    x, y, box_w, box_h = box_xywh
    eff = min((src_h - 1.0) / box_h, (src_w - 1.0) / box_w, scale)

    new_w = box_w * eff
    new_h = box_h * eff
    cx, cy = box_w / 2.0 + x, box_h / 2.0 + y

    ltx = cx - new_w / 2.0
    lty = cy - new_h / 2.0
    rbx = cx + new_w / 2.0
    rby = cy + new_h / 2.0

    if ltx < 0:
        rbx -= ltx
        ltx = 0.0
    if lty < 0:
        rby -= lty
        lty = 0.0
    if rbx > src_w - 1.0:
        ltx -= rbx - src_w + 1.0
        rbx = src_w - 1.0
    if rby > src_h - 1.0:
        lty -= rby - src_h + 1.0
        rby = src_h - 1.0

    return int(ltx), int(lty), int(rbx), int(rby), eff / scale


def detection_to_crop_box(face_box: np.ndarray) -> Tuple[float, float, float, float]:
    """Detection -> pre-crop square bbox (x, y, w, h) (face_antispoofing.rs:249-262).

    Every component is TRUNCATED to an integer exactly like the reference's
    Rect::new(left as i32, top as i32, (right-left+1) as i32,
    (bottom-top+1.0) as i32) — fractional detection corners shift the crop
    and the clamped ensemble weight otherwise.
    """
    x1, y1, x2, y2 = (float(face_box[i]) for i in range(4))
    det_h = y2 - y1
    cx = (x1 + x2) / 2.0
    left = float(int(cx - 0.47 * det_h))
    right = float(int(cx + 0.47 * det_h))
    return left, float(int(y1)), float(int(right - left + 1.0)), float(int(y2 - y1 + 1.0))


class FaceAntiSpoofing:
    def __init__(
        self,
        cfg: Optional[FaceAntiSpoofingConfig] = None,
        registry: Optional[ModelRegistry] = None,
    ) -> None:
        self.cfg = cfg or FaceAntiSpoofingConfig()
        registry = registry or default_registry()
        self._models = [registry.get(name) for name in self.cfg.model_names]

    @instance_cache
    def _scale_jit(self, scale_idx: int, batch: int, src_h: int, src_w: int):
        out_w, out_h = self.cfg.image_sizes[scale_idx]
        model, _ = self._models[scale_idx]

        def run(variables, imgs_bgr, boxes):
            def crop_one(img, box):
                return crop_resize(img.astype(jnp.float32), box, out_h, out_w)

            crops = jax.vmap(crop_one)(imgs_bgr, boxes)  # raw 0-255 BGR
            return model.apply(variables, crops, train=False)  # (B, 3) probs

        return jax.jit(run)

    def __call__(
        self,
        imgs_bgr: Sequence[np.ndarray],
        face_boxes: Sequence[np.ndarray],
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Liveness for (image, detection) pairs.

        Returns (liveness (N,) int32 0/1, live_scores (N,) float32).
        Images must share one shape per call (batched jit); mixed sizes can be
        submitted in groups.
        """
        n = len(imgs_bgr)
        if n == 0:
            return np.zeros((0,), np.int32), np.zeros((0,), np.float32)
        assert len(face_boxes) == n
        src_h, src_w = imgs_bgr[0].shape[:2]

        crop_boxes = np.zeros((len(self.cfg.scales), n, 4), np.float32)
        weights = np.zeros((len(self.cfg.scales), n), np.float32)
        for i, face_box in enumerate(face_boxes):
            xywh = detection_to_crop_box(np.asarray(face_box))
            for s, scale in enumerate(self.cfg.scales):
                l, t, r, b, w = get_new_box(src_w, src_h, xywh, scale)
                crop_boxes[s, i] = (l, t, r, b)
                weights[s, i] = w

        # Pad the face count to a small bucket so varying per-frame counts
        # don't compile 4 fresh graphs per distinct n (and thrash the jit
        # cache); pad rows crop a zero box and are sliced off below.
        bucket = 1
        while bucket < n:
            bucket *= 2
        stack_np = np.stack(imgs_bgr)
        if bucket != n:
            stack_np = np.concatenate(
                [stack_np, np.zeros((bucket - n, *stack_np.shape[1:]),
                                    stack_np.dtype)]
            )
        stack = jnp.asarray(stack_np)
        # Dispatch all four scale graphs BEFORE the first host sync: each
        # synchronous round trip costs ~29 ms of fixed latency through the
        # tunneled TPU; async dispatch overlaps them.
        pending = []
        for s in range(len(self.cfg.scales)):
            fn = self._scale_jit(s, bucket, src_h, src_w)
            _, variables = self._models[s]
            boxes_s = np.zeros((bucket, 4), np.float32)
            boxes_s[:n] = crop_boxes[s]
            pending.append(fn(variables, stack, jnp.asarray(boxes_s)))
        weighted = np.zeros((n,), np.float64)
        total_w = np.zeros((n,), np.float64)
        for s, probs_dev in enumerate(pending):
            probs = np.asarray(probs_dev)[:n]
            weighted += probs[:, 1] * weights[s]
            total_w += weights[s]

        live_score = (weighted / np.maximum(total_w, 1e-12)).astype(np.float32)
        liveness = (live_score > self.cfg.threshold).astype(np.int32)
        return liveness, live_score
