"""RetinaFace detection module: one fused jit graph from pixels to boxes.

TPU-native rework of the reference's RetinaFaceDetection
(/root/reference/src/pipeline/module/face_detection.rs): where the reference
does host OpenCV letterbox (:131-198), a gRPC round-trip to Triton (:254-284),
then host ndarray decode + NMS (:319-431), here letterbox, normalize,
backbone+FPN+SSH forward, per-stride anchor decode, confidence filter, top-k
and NMS all trace into a single XLA executable with static shapes.  Dynamic
result counts become (max_detections)-padded arrays plus a validity count; the
host wrapper slices them back to the reference's dynamic (N, 5) / (N, 5, 2)
contract.

Decode semantics preserved exactly (see tests/test_detection.py):
  - per-stride flatten order (h, w, a) matching the anchor plane
    (face_detection.rs:322-371),
  - bbox_stds / landmark_std scaling (:366-371, :398),
  - clip to the padded 640x640 frame (:373),
  - confidence filter `score >= threshold` (:375),
  - stable descending score sort across strides (:421-423),
  - greedy IoU NMS with "+1" areas, keep `ovr <= thresh` (:431),
  - descale boxes and landmarks by det_scale (:473-493).
"""

from __future__ import annotations

import time
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.cache import instance_cache
from ..configs import RPN_ANCHOR_CFG, FaceDetectionConfig
from ..models.registry import ModelRegistry, default_registry
from ..ops.anchors import full_anchor_table
from ..ops.box_decode import bbox_pred, clip_boxes, landmark_pred
from ..ops.image import bgr_to_rgb, letterbox, normalize, s2d_stem_input
from ..ops.nms import nms_mask


class PaddedDetections(NamedTuple):
    """Fixed-shape detector output (device): padded rows + validity count."""

    det: jnp.ndarray  # (max_det, 5) [x1, y1, x2, y2, score]
    kps: jnp.ndarray  # (max_det, 5, 2)
    count: jnp.ndarray  # () int32 valid rows


def decode_level_outputs(
    net_out: Dict[int, Dict[str, jnp.ndarray]],
    anchors: jnp.ndarray,
    level_info,
    cfg: FaceDetectionConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flatten per-stride maps into (total,) scores, (total, 4) boxes, (total, 5, 2) landmarks.

    Consumes a single-image slice (no batch dim) of the model outputs.
    Iterates strides in the reference's order (face_detection.rs:319) so the
    row order matches the precomputed anchor table.
    """
    width, height = cfg.image_size
    scores_l, boxes_l, lms_l = [], [], []
    offset = 0
    bbox_stds = jnp.asarray(cfg.bbox_stds, dtype=jnp.float32)
    for stride, fh, fw, a in level_info:
        out = net_out[stride]
        k = fh * fw * a
        anchor_slice = jax.lax.dynamic_slice_in_dim(anchors, offset, k, axis=0)

        scores = out["score"].reshape(k)
        deltas = out["bbox"].reshape(fh, fw, a, 4).reshape(k, 4) * bbox_stds
        boxes = clip_boxes(bbox_pred(anchor_slice, deltas), (height, width))

        lm_deltas = (
            out["landmark"].reshape(fh, fw, a, 5, 2).reshape(k, 5, 2)
            * cfg.landmark_std
        )
        lms = landmark_pred(anchor_slice, lm_deltas)

        scores_l.append(scores)
        boxes_l.append(boxes)
        lms_l.append(lms)
        offset += k
    return (
        jnp.concatenate(scores_l),
        jnp.concatenate(boxes_l, axis=0),
        jnp.concatenate(lms_l, axis=0),
    )


def detector_image_size(detector) -> Tuple[int, int]:
    """The (width, height) static input size of a duck-typed detector.

    The one place the informal detector contract's size lookup lives
    (RetinaFaceDetection carries cfg.image_size; SCRFDDetection an
    image_size attribute) — shared by DetectionServer, the AOT exporter,
    and the TTA wrapper so their probes cannot drift.
    """
    size = getattr(detector, "image_size", None)
    if size is None:
        size = detector.cfg.image_size
    return tuple(size)


def build_batched_fn(detector, *, stem: str = "xla", pre_s2d: bool = False,
                     **kwargs):
    """make_batched_fn via signature probe (the duck-type dispatch).

    Detectors without layout options are called bare and only support the
    natural (B, H, W, 3) layout — requesting anything else raises instead
    of silently exporting/serving a different contract.  Extra kwargs
    (packed_heads, s4d_mid, ...) forward to make_batched_fn when present.
    """
    import inspect

    params = inspect.signature(detector.make_batched_fn).parameters
    if "stem" in params:
        return detector.make_batched_fn(pre_s2d=pre_s2d, stem=stem, **kwargs)
    if stem != "xla" or pre_s2d or kwargs:
        raise ValueError(
            f"{type(detector).__name__}.make_batched_fn has no layout "
            f"options; stem={stem!r}/pre_s2d={pre_s2d}"
            + (f"/{sorted(kwargs)}" if kwargs else "")
            + " unsupported"
        )
    return detector.make_batched_fn()


def make_folding_fn(batched, fold_aux):
    """Wrap a (variables, aux, *args) graph and its pure weight fold into
    the make_batched_fn calling convention with the fn.fold / fn.jitted
    aux protocol.

    Plain calls fold ONCE per weights object (identity-keyed 2-entry
    cache) and pass the folded constants in as jit inputs so the fold
    stays out of the per-batch graph; re-traces under an outer transform
    (an enclosing jit/scan) inline the fold — semantics identical,
    hoisting is then the outer caller's job via fn.fold + fn.jitted.
    """
    jitted = jax.jit(batched)
    jit_fold = jax.jit(fold_aux)
    fold_cache: list = []  # [(variables, folded aux)], identity-keyed

    def fn(variables, *args):
        leaves = jax.tree_util.tree_leaves(variables)
        if leaves and isinstance(leaves[0], jax.core.Tracer):
            return batched(variables, fold_aux(variables), *args)
        aux = None
        for v, a in fold_cache:
            if v is variables:
                aux = a
                break
        if aux is None:
            aux = jit_fold(variables)
            fold_cache.append((variables, aux))
            # ONE entry: serving swaps weights (checkpoint reload) rather
            # than alternating them, and a deeper cache would pin the
            # superseded model's device buffers (~100 MB for R50) in HBM.
            del fold_cache[:-1]
        return jitted(variables, aux, *args)

    fn.jitted = jitted
    fn.fold = jit_fold
    return fn


def resolve_fold(fn):
    """(fold, inner) for make_batched_fn's hoisted-fold aux protocol.

    Plain batched callables (no .fold/.jitted) get a trivial empty fold so
    consumers (sharded serving, the AOT exporter) handle both uniformly:
    inner always takes (variables, aux, imgs, scales).
    """
    if hasattr(fn, "fold"):
        return fn.fold, fn.jitted
    return (
        lambda variables: {},
        lambda variables, aux, imgs, scales: fn(variables, imgs, scales),
    )


def host_layout_shape(
    image_size, batch_size: int, stem: str = "xla", pre_s2d: bool = False
):
    """(layout tag, input shape) for a batched serving config.

    The single source of truth mapping make_batched_fn's configuration to
    its host input contract — shared by DetectionServer consumers and the
    AOT exporter so recorded layouts can't diverge from what the graph
    actually consumes: "s4d" -> (B, H/4, W/4, 48) uint8
    (ops.image.s4d_layout_host), "s2d" -> (B, H/2, W/2, 12) uint8,
    "none" -> (B, H, W, 3) uint8.
    """
    width, height = image_size
    if stem == "s4d":
        return "s4d", (batch_size, height // 4, width // 4, 48)
    if pre_s2d:
        return "s2d", (batch_size, height // 2, width // 2, 12)
    return "none", (batch_size, height, width, 3)


def topk_decode_and_nms(
    net_out: Dict[int, Dict[str, jnp.ndarray]],
    anchors: jnp.ndarray,
    level_info,
    cfg: FaceDetectionConfig,
    nms_mode: str,
) -> PaddedDetections:
    """Filter-then-decode fast path: top-k on scores, decode only the winners.

    Equivalent to decode_level_outputs + select_and_nms (candidate selection
    depends only on scores, and per-row decode math is identical), but the
    box/landmark delta decode, clip, and landmark expansion run on the
    (max_candidates,) gathered rows instead of every anchor — at 640x640
    that's 256 rows instead of 16,800, removing the full-grid decode fusions
    and their HBM traffic from the hot loop (profiled ~10% of the mnet b32
    graph).  Raw head outputs are only reshaped/concatenated (layout-only)
    before the gather.
    """
    width, height = cfg.image_size
    scores_l, bbox_l, lm_l = [], [], []
    for stride, fh, fw, a in level_info:
        out = net_out[stride]
        k = fh * fw * a
        scores_l.append(out["score"].reshape(k))
        bbox_l.append(out["bbox"].reshape(k, 4))
        # Keep landmarks flat (k, 10) until after the top-k gather: a
        # (16800, 5, 2) layout tiles as T(2, 128) on TPU — 2 of 128 lanes
        # live — and its full-grid concat copy alone profiled ~0.2 ms of
        # the mnet b8 graph.  The (5, 2) split is exact element-order-
        # preserving, so deferring it to the 256 gathered rows is free.
        lm_l.append(out["landmark"].reshape(k, 10))
    scores = jnp.concatenate(scores_l)
    bbox_raw = jnp.concatenate(bbox_l, axis=0)
    lm_raw = jnp.concatenate(lm_l, axis=0)

    neg_inf = jnp.float32(-jnp.inf)
    passing = scores >= cfg.confidence_threshold
    masked = jnp.where(passing, scores, neg_inf)
    k = min(cfg.max_candidates, scores.shape[0])
    if getattr(cfg, "candidate_selection", "exact") == "approx":
        # TPU-native partial-reduce top-k; final aggregate keeps the output
        # score-sorted (required by NMS).  See FaceDetectionConfig.
        top_scores, top_idx = jax.lax.approx_max_k(
            masked, k, recall_target=0.95
        )
    else:
        top_scores, top_idx = jax.lax.top_k(masked, k)  # stable: ties keep order
    valid = top_scores > neg_inf

    bbox_stds = jnp.asarray(cfg.bbox_stds, dtype=jnp.float32)
    anchor_sel = anchors[top_idx]
    deltas = bbox_raw[top_idx] * bbox_stds
    top_boxes = clip_boxes(bbox_pred(anchor_sel, deltas), (height, width))
    lm_sel = lm_raw[top_idx].reshape(k, 5, 2)
    top_lms = landmark_pred(anchor_sel, lm_sel * cfg.landmark_std)

    return _nms_and_compact(top_boxes, top_scores, top_lms, valid, cfg, nms_mode)


def _nms_and_compact(
    top_boxes: jnp.ndarray,
    top_scores: jnp.ndarray,
    top_lms: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: FaceDetectionConfig,
    nms_mode: str,
) -> PaddedDetections:
    """NMS over score-sorted candidates, then compact kept rows
    (score-descending) into the first `count` of max_detections rows.

    Shared tail of topk_decode_and_nms and select_and_nms (SCRFD reuses the
    latter) — one copy so the scatter/count semantics can't drift between
    the detector families.
    """
    keep = nms_mask(top_boxes, valid, cfg.iou_threshold, mode=nms_mode)

    max_det = cfg.max_detections
    rank = jnp.cumsum(keep) - 1
    target = jnp.where(keep & (rank < max_det), rank, max_det)
    det_rows = jnp.concatenate([top_boxes, top_scores[:, None]], axis=1)
    det = jnp.zeros((max_det + 1, 5), jnp.float32).at[target].set(det_rows)[:max_det]
    kps = (
        jnp.zeros((max_det + 1, 5, 2), jnp.float32).at[target].set(top_lms)[:max_det]
    )
    count = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), max_det)
    return PaddedDetections(det, kps, count)


def select_and_nms(
    scores: jnp.ndarray,
    boxes: jnp.ndarray,
    lms: jnp.ndarray,
    cfg: FaceDetectionConfig,
    nms_mode: str,
) -> PaddedDetections:
    """Confidence filter -> stable top-k sort -> NMS -> compact to max_det rows."""
    neg_inf = jnp.float32(-jnp.inf)
    passing = scores >= cfg.confidence_threshold
    masked = jnp.where(passing, scores, neg_inf)

    k = min(cfg.max_candidates, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked, k)  # stable: ties keep order
    valid = top_scores > neg_inf
    top_boxes = boxes[top_idx]
    top_lms = lms[top_idx]
    return _nms_and_compact(top_boxes, top_scores, top_lms, valid, cfg, nms_mode)


def _descale(padded: PaddedDetections, det_scale: float) -> PaddedDetections:
    """Undo the letterbox scale on boxes and landmarks (face_detection.rs:473-493)."""
    inv = jnp.float32(1.0 / det_scale)
    det = padded.det.at[:, :4].multiply(inv)
    kps = padded.kps * inv
    return PaddedDetections(det, kps, padded.count)


class RetinaFaceDetection:
    """Detector with the reference's host-facing call contract.

    `__call__(image_bgr_u8) -> (det (N, 5) np, kps (N, 5, 2) np)` where N is
    the post-NMS face count and coordinates are in original-image pixels.
    """

    def __init__(
        self,
        cfg: Optional[FaceDetectionConfig] = None,
        registry: Optional[ModelRegistry] = None,
        nms_mode: str = "fixpoint",
        variables=None,
        model=None,
    ) -> None:
        self.cfg = cfg or FaceDetectionConfig()
        if (model is None) != (variables is None):
            # Half a pair would be silently overwritten by the registry's —
            # the caller's fine-tuned weights (or custom architecture) must
            # never be discarded without error.
            raise ValueError(
                "pass model AND variables together (or neither, to take "
                "both from the registry)"
            )
        if model is None:
            registry = registry or default_registry()
            model, variables = registry.get(self.cfg.model_name)
        self.model = model
        self.variables = variables
        self.nms_mode = nms_mode
        self._registry = registry
        anchors, level_info = full_anchor_table(
            self.cfg.image_size,
            RPN_ANCHOR_CFG,
            self.cfg.feat_strides,
            self.cfg.dense_anchor,
        )
        self.anchors = jnp.asarray(anchors)
        self.level_info = tuple(level_info)
        # The anchor table's per-cell count must match the model's head width
        # (dense_anchor doubles A; the model must be built to match).
        table_a = level_info[0][3]
        model_a = getattr(self.model, "num_anchors", table_a)
        if table_a != model_a:
            raise ValueError(
                f"anchor table has {table_a} anchors/cell but the model head "
                f"predicts {model_a}; build the model with num_anchors={table_a}"
            )

    # ---- single-image path (shape-bucketed jit cache) -------------------

    @instance_cache
    def _jit_for_shape(self, src_h: int, src_w: int):
        cfg = self.cfg
        width, height = cfg.image_size

        def run(variables, img_u8):
            padded_img, det_scale = letterbox(img_u8, width, height)
            x = bgr_to_rgb(padded_img)
            x = normalize(
                x,
                tuple(m * cfg.pixel_scale for m in cfg.pixel_means),
                tuple(1.0 / s for s in cfg.pixel_stds),
            ) / cfg.pixel_scale
            net_out = self.model.apply(variables, x[None], train=False)
            single = jax.tree.map(lambda t: t[0], net_out)
            padded = topk_decode_and_nms(
                single, self.anchors, self.level_info, cfg, self.nms_mode
            )
            return _descale(padded, det_scale)

        return jax.jit(run)

    def __call__(self, image_bgr_u8: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        h, w = image_bgr_u8.shape[:2]
        fn = self._jit_for_shape(h, w)
        start = time.perf_counter()
        out = fn(self.variables, jnp.asarray(image_bgr_u8))
        # Single device->host sync for all three outputs.
        count, det, kps = jax.device_get((out.count, out.det, out.kps))
        n = int(count)
        if self._registry is not None:
            self._registry.record(
                self.cfg.model_name, 1, time.perf_counter() - start
            )
        return det[:n], kps[:n]

    def record_traffic(self, n_images: int, duration_s: float) -> None:
        """Feed registry statistics for traffic served outside __call__
        (batched serving paths — DetectionServer, DynamicBatcher)."""
        if self._registry is not None:
            self._registry.record(self.cfg.model_name, n_images, duration_s)

    def detect_padded(self, image_bgr_u8: np.ndarray) -> PaddedDetections:
        """Device-resident padded result (no host sync beyond the count)."""
        h, w = image_bgr_u8.shape[:2]
        return self._jit_for_shape(h, w)(self.variables, jnp.asarray(image_bgr_u8))

    # ---- batched serving path (pre-letterboxed input) --------------------

    def make_batched_fn(
        self, pre_s2d: bool = False, stem: str = "xla", s4d_mid=None,
        packed_heads=None, packed_fpn=None,
    ):
        """Jitted (variables, (B, 640, 640, 3) u8, (B,) det_scales) -> PaddedDetections batch.

        Serving path: images are letterboxed host-side (or by the native
        loader) to the static detector size; everything else — normalize,
        forward, decode, NMS — runs as one vmapped XLA program.

        For s2d-stem backbones the BGR flip, normalize, and 2x2 space-to-depth
        reshuffle run in one fused uint8-domain op emitting the backbone
        compute dtype directly (ops.image.s2d_stem_input).  With pre_s2d=True
        the input is instead (B, H/2, W/2, 12) uint8 already reshuffled on
        host (ops.image.s2d_layout_host / the native loader): an 8-bit TPU
        transpose costs as much as a float one, so the production path moves
        the memcpy-speed reshuffle into the loader and keeps only fusible
        elementwise work on device.

        stem: "xla" (default) | "s4d" | "pallas" | "auto".
          - "s4d": the production fast path for both backbones.  Input
            contract changes to the 4x4 space-to-depth host layout
            (B, H/4, W/4, 48) uint8 (ops.image.s4d_layout_host).  R50: the
            whole stem chain — normalize, stem conv, BN, ReLU, 3x3/s2
            max-pool — runs as one dense MXU-shaped 3x3x48->256 conv plus
            fused phase maxes (ops/stem_s4d.py).  MobileNet0.25: the whole
            conv1..ds2.dw front runs as four dense phase-packed convs
            (ops/mnet_s4d.py; needs the standard 3x3 stem).  Exact in f32,
            bf16-rounding-close in serving dtype.
          - "pallas": fully fused single-kernel stem (ops/stem_pallas.py) on
            the pre_s2d layout.  Kept opt-in: on current v5e+XLA it profiled
            slower than the XLA chain (Mosaic lane-pads the 12-channel
            operands); see the module docstring.
          - "auto": "s4d"-eligible models still take "xla" here ("s4d"
            changes the input layout, so callers must opt in explicitly).

        s4d_mid (MobileNet s4d path only): continue the dense packing one
        stage deeper (ds2.pw..ds4.dw on the 80^2 grid at 128 lanes —
        ops.mnet_s4d.mnet_s4d_mid).  None (default) = on when the image
        dims divide by 8; pass False to opt out.

        packed_heads (MobileNet s4d path only): run SSH context modules and
        detection heads on the half-resolution grid at 4x channels
        (ops/ssh_packed.py), consuming their packed-order output maps
        through a permuted anchor table.  Accepts an iterable of pyramid
        levels (0=stride 8, 1=16, 2=32), True (all eligible levels), False
        (none), or None (default) = every level whose feature grid is even.
        The stride-8 level carries 16x the spatial work of stride-32, so
        level 0 is where the win is; 1-2 ride along when eligible.

        packed_fpn: extend the packing through the FPN lateral+merge chains
        (ops/ssh_packed.fpn_packed: block-diagonal lateral, channel-tiled
        nearest upsample-add, dense-packed merge — no full-resolution
        tensor is materialized).  Accepts an iterable of FPN levels (0
        and/or 1; must be downward-closed), True (all eligible), False
        (none), or None (default) = level 0 when levels 0 AND 1 are packed
        (the chain consumes the merged P4).  Level 1 additionally needs
        level 2 packed (it consumes P5) and is opt-in pending measurement.
        """
        if stem not in ("xla", "auto", "s4d", "pallas"):
            raise ValueError(
                f"stem={stem!r} not in ('xla', 'auto', 's4d', 'pallas')"
            )
        if stem == "s4d" and pre_s2d:
            # Conflicting input contracts: pre_s2d promises the (B, H/2,
            # W/2, 12) host layout but the s4d graph consumes (B, H/4,
            # W/4, 48) — fail at build time, not deep inside the trace.
            raise ValueError("stem='s4d' and pre_s2d=True are mutually exclusive")
        cfg = self.cfg
        width, height = cfg.image_size
        s2d_stem = (
            getattr(self.model, "uses_s2d_stem", lambda: False)()
            and width % 2 == 0
            and height % 2 == 0
        )
        if pre_s2d and not s2d_stem:
            raise ValueError(
                "pre_s2d=True requires an s2d-stem model and even image_size"
            )
        from ..ops.stem_pallas import supported_shape

        pallas_ok = (
            pre_s2d
            and getattr(self.model, "backbone", None) == "resnet50"
            and not getattr(self.model, "quant", False)
            and supported_shape(height // 2, width // 2)
        )
        if stem == "pallas" and not pallas_ok:
            raise ValueError(
                "stem='pallas' needs pre_s2d=True, a non-quant resnet50 "
                "model, and a tile-aligned image size "
                "(ops.stem_pallas.supported_shape)"
            )
        use_pallas_stem = stem == "pallas"
        backbone = getattr(self.model, "backbone", None)
        r50_s4d_ok = (
            backbone == "resnet50"
            and getattr(self.model, "uses_s2d_stem", lambda: False)()
        )
        mnet_s4d_ok = (
            backbone == "mobilenet025"
            and not getattr(self.model, "uses_s2d_stem", lambda: True)()
        )
        use_s4d_stem = stem == "s4d"
        if use_s4d_stem and not (
            (r50_s4d_ok or mnet_s4d_ok)
            and not getattr(self.model, "quant", False)
            and height % 4 == 0
            and width % 4 == 0
        ):
            raise ValueError(
                "stem='s4d' needs a non-quant model with image dims "
                "divisible by 4: resnet50 with the s2d stem (its (4,4,12,64) "
                "kernel is what fold_s4d_params re-expresses) or "
                "mobilenet025 with the standard 3x3 stem (ops/mnet_s4d.py "
                "re-expresses the whole conv1..ds2.dw front)"
            )
        mid_eligible = (
            use_s4d_stem and mnet_s4d_ok and height % 8 == 0 and width % 8 == 0
        )
        if s4d_mid and not mid_eligible:
            raise ValueError(
                "s4d_mid=True needs stem='s4d' on a mobilenet025 model with "
                "image dims divisible by 8"
            )
        use_s4d_mid = mid_eligible if s4d_mid is None else bool(s4d_mid)
        # Model pyramid level i has stride 8 * 2**i (models/retinaface.py);
        # note self.level_info lists levels in the reference's (32, 16, 8)
        # iteration order, so map by STRIDE, never by list index.
        grid_by_stride = {
            stride: (fh, fw) for stride, fh, fw, _a in self.level_info
        }
        packable = use_s4d_stem and mnet_s4d_ok
        eligible_levels = tuple(
            i
            for i, stride in enumerate((8, 16, 32))
            if packable
            and stride in grid_by_stride
            and grid_by_stride[stride][0] % 2 == 0
            and grid_by_stride[stride][1] % 2 == 0
        )
        from ..ops.ssh_packed import resolve_packed_levels

        # RetinaFace default (None) = all eligible levels.
        packed_levels = resolve_packed_levels(
            eligible_levels if packed_heads is None else packed_heads,
            eligible_levels,
            hint="needs stem='s4d' on a mobilenet025 model and an even "
            "feature grid per level",
        )
        packed_strides = {8 * 2**i for i in packed_levels}
        # FPN level i's packed chain needs level i's head packed (it emits
        # the packed layout) and level i+1's pyramid feature available
        # (head-packed levels return it).
        fpn_eligible = tuple(
            i
            for i in (0, 1)
            if i in packed_levels and (i + 1) in packed_levels
        )
        fpn_levels = resolve_packed_levels(
            ((0,) if 0 in fpn_eligible else ()) if packed_fpn is None
            else packed_fpn,
            fpn_eligible,
            what="packed_fpn",
            hint="each packed FPN chain needs its own and the next-coarser "
            "pyramid level in packed_heads",
        )
        if any(j not in fpn_levels for i in fpn_levels for j in range(i)):
            raise ValueError(
                f"packed_fpn {fpn_levels} must be downward-closed "
                "(skipping FPN level 1 re-expresses P4, which level 0's "
                "natural merge would need)"
            )

        anchors_decode = self.anchors
        if packed_levels:
            # The packed head maps flatten as (by, bx, phase, a); pair them
            # with anchor rows permuted to that order (decode is
            # order-agnostic past the anchor lookup) — no relayout copies.
            from ..ops.ssh_packed import permute_table_for_packed

            anchors_decode = jnp.asarray(
                permute_table_for_packed(
                    np.asarray(self.anchors), self.level_info, packed_strides
                )
            )

        def decode_one(single, inv_scale):
            padded = topk_decode_and_nms(
                single, anchors_decode, self.level_info, cfg, self.nms_mode
            )
            det = padded.det.at[:, :4].multiply(inv_scale)
            kps = padded.kps * inv_scale
            return PaddedDetections(det, kps, padded.count)

        def fold_aux(variables):
            """Fold the dense-front constants for `batched`'s `aux` argument.

            The BN folds and kernel re-packings (ops/mnet_s4d.py,
            ops/stem_s4d.py) are pure functions of the weights.  Traced
            inside the per-call graph they cost real device time per batch —
            profiled ~0.1 ms of converts plus conv fusions whose kernel
            operands are dynamic-update-slice packing chains — so the
            returned wrapper computes them ONCE per weights object and
            passes the folded arrays in as plain jit inputs.
            """
            if use_s4d_stem and mnet_s4d_ok:
                from ..ops.mnet_s4d import (
                    fold_mnet_s4d_mid_params,
                    fold_mnet_s4d_params,
                )

                aux = {
                    "front": fold_mnet_s4d_params(
                        variables,
                        cfg.pixel_means,
                        cfg.pixel_stds,
                        cfg.pixel_scale,
                    )
                }
                if use_s4d_mid:
                    aux["mid"] = fold_mnet_s4d_mid_params(variables)
                if packed_levels:
                    from ..ops.ssh_packed import fold_ssh_heads_packed

                    aux["packed"] = {
                        str(i): fold_ssh_heads_packed(variables, level=i)
                        for i in packed_levels
                    }
                if fpn_levels:
                    from ..ops.ssh_packed import fold_fpn_packed

                    aux["fpn"] = {
                        str(i): fold_fpn_packed(variables, level=i)
                        for i in fpn_levels
                    }
                return aux
            if use_s4d_stem or use_pallas_stem:
                if use_s4d_stem:
                    from ..ops.stem_s4d import fold_s4d_params as _fold
                else:
                    from ..ops.stem_pallas import fold_stem_params as _fold
                stem_p = variables["params"]["body"]["stem"]
                stem_s = variables["batch_stats"]["body"]["stem"]["BatchNorm_0"]
                return {
                    "stem": _fold(
                        stem_p["Conv_0"]["kernel"].astype(jnp.float32),
                        stem_p["BatchNorm_0"]["scale"],
                        stem_p["BatchNorm_0"]["bias"],
                        stem_s["mean"],
                        stem_s["var"],
                        cfg.pixel_means,
                        cfg.pixel_stds,
                        cfg.pixel_scale,
                    )
                }
            return {}

        def batched(variables, aux, imgs_u8, det_scales):
            mean = tuple(m * cfg.pixel_scale for m in cfg.pixel_means)
            scale = tuple(1.0 / s for s in cfg.pixel_stds)
            if use_s4d_stem and mnet_s4d_ok:
                from ..ops.mnet_s4d import mnet_s4d_front, mnet_s4d_mid

                dt = getattr(self.model, "dtype", jnp.float32)
                front = mnet_s4d_front(
                    imgs_u8, aux["front"], compute_dtype=dt, out_dtype=dt
                )
                # Packed mid chain (ds2.pw..ds4.dw at 128 lanes): on by
                # default when the grid divides; s4d_mid=False opts out.
                if use_s4d_mid:
                    front = mnet_s4d_mid(
                        front, aux["mid"], compute_dtype=dt, out_dtype=dt
                    )
                net_out = self.model.apply(
                    variables,
                    front,
                    train=False,
                    stem_precomputed="ds4.pw" if use_s4d_mid else True,
                    skip_head_levels=packed_levels,
                    skip_fpn_levels=fpn_levels,
                )
                if packed_levels:
                    from ..ops.ssh_packed import (
                        depth_to_space2,
                        fpn_packed,
                        ssh_heads_packed,
                    )

                    slope = self.model.negative_slope()
                    net_out = dict(net_out)
                    # Rebuild FPN-skipped pyramid levels coarse-to-fine:
                    # each packed chain consumes the next-coarser level in
                    # NATURAL layout (one small depth_to_space2 when that
                    # level was itself re-expressed packed).
                    packed_feat = {}
                    for i in sorted(fpn_levels, reverse=True):
                        if (i + 1) in fpn_levels:
                            p_up = depth_to_space2(packed_feat[i + 1])
                        else:
                            p_up = net_out[8 * 2 ** (i + 1)]["feat"]
                        packed_feat[i] = fpn_packed(
                            net_out[8 * 2**i]["c"], p_up,
                            aux["fpn"][str(i)],
                            negative_slope=slope, compute_dtype=dt,
                        )
                    for i in packed_levels:
                        stride = 8 * 2**i
                        pre = i in packed_feat
                        net_out[stride] = ssh_heads_packed(
                            packed_feat[i] if pre else net_out[stride]["feat"],
                            aux["packed"][str(i)],
                            self.model.num_anchors,
                            negative_slope=slope,
                            compute_dtype=dt,
                            pre_packed=pre,
                        )
                return jax.vmap(decode_one)(net_out, 1.0 / det_scales)
            if use_s4d_stem:
                from ..ops.stem_s4d import stem_s4d

                k4, a256, b256, m48, s48 = aux["stem"]
                dt = getattr(self.model, "dtype", jnp.float32)
                pooled = stem_s4d(
                    imgs_u8, k4, a256, b256, m48, s48,
                    compute_dtype=dt, out_dtype=dt,
                )
                net_out = self.model.apply(
                    variables, pooled, train=False, stem_precomputed=True
                )
                return jax.vmap(decode_one)(net_out, 1.0 / det_scales)
            if use_pallas_stem:
                from ..ops.stem_pallas import fused_stem_s2d

                w192, bn2, norm2 = aux["stem"]
                dt = getattr(self.model, "dtype", jnp.float32)
                pooled = fused_stem_s2d(
                    imgs_u8,
                    w192,
                    bn2,
                    norm2,
                    compute_dtype=dt,
                    out_dtype=dt,
                    interpret=jax.default_backend() not in ("tpu",),
                )
                net_out = self.model.apply(
                    variables, pooled, train=False, stem_precomputed=True
                )
                return jax.vmap(decode_one)(net_out, 1.0 / det_scales)
            if s2d_stem:
                x = s2d_stem_input(
                    imgs_u8,
                    mean,
                    scale,
                    post_div=cfg.pixel_scale,
                    out_dtype=getattr(self.model, "dtype", jnp.float32),
                    pre_s2d=pre_s2d,
                )
            else:
                x = bgr_to_rgb(imgs_u8.astype(jnp.float32))
                x = normalize(x, mean, scale) / cfg.pixel_scale
            net_out = self.model.apply(variables, x, train=False)  # batched maps
            return jax.vmap(decode_one)(net_out, 1.0 / det_scales)

        # Advanced protocol for callers that wrap the graph themselves
        # (bench's scan harness, DetectionServer's sharded jit): fold once
        # with fn.fold(variables), then call fn.jitted(variables, aux, ...)
        # with aux as a plain argument so the fold stays out of the loop.
        return make_folding_fn(batched, fold_aux)
