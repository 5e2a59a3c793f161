"""RetinaFace training: multi-task loss, anchor matching, sharded train step.

The reference ships no training (SURVEY.md §5 — checkpoints came from
Triton's repository); this module supplies the TPU-native training loop the
framework needs to own its weights: RetinaFace paper multi-task loss
(2-class softmax CE + smooth-L1 box regression + smooth-L1 landmark
regression over matched anchors), anchor matching in-graph with static
shapes, and a jit train step sharded over a ("data", "model") mesh — batch
data-parallel, parameters/optimizer FSDP-sharded (mesh.py).  XLA GSPMD
emits the all-gather/psum collectives over ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from ..configs import RPN_ANCHOR_CFG, FaceDetectionConfig
from ..models.retinaface import RetinaFace
from ..ops.anchors import full_anchor_table
from ..ops.box_decode import bbox_overlaps
from .mesh import data_sharding, replicated, shard_pytree_fsdp


class TrainBatch(NamedTuple):
    """One training batch with fixed-shape (padded) ground truth.

    images: (B, H, W, 3) float32 RGB in the RAW 0-255 pixel range — the
    same convention the serving graphs consume (the model normalizes
    in-graph); parallel/data.py feeds exactly this.
    gt_boxes: (B, M, 4) corner boxes; gt_lms: (B, M, 5, 2); gt_valid: (B, M).
    """

    images: jnp.ndarray
    gt_boxes: jnp.ndarray
    gt_lms: jnp.ndarray
    gt_valid: jnp.ndarray
    #: (B, M) per-face landmark availability (real datasets mark faces
    #: without annotated landmarks — retinaface label.txt uses -1 rows;
    #: WIDER bbx_gt has none at all).  None -> treated as all-available.
    gt_lm_valid: Any = None
    #: (B, K, 4) ignore regions (WIDER invalid faces: real but tiny/occluded)
    #: — anchors overlapping them are excluded from the negative pool.
    #: Zero-area rows are inert padding.  None -> no ignore regions.
    gt_ignore: Any = None


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    #: exponential moving average of params (Trainer(ema_decay>0)); the
    #: standard weights to EXPORT for serving.  None when EMA is off.
    ema_params: Any = None


def _smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    absx = jnp.abs(x)
    return jnp.where(absx < beta, 0.5 * x * x / beta, absx - 0.5 * beta)


def _centers_sizes(boxes: jnp.ndarray):
    """(w, h, cx, cy) under the +1 inclusive-corner convention — the ONE
    copy shared by box encoding and landmark targets (they must never
    desynchronize)."""
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    cx = boxes[:, 0] + 0.5 * (w - 1.0)
    cy = boxes[:, 1] + 0.5 * (h - 1.0)
    return w, h, cx, cy


def _intersection_over_min(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, M) intersection area over the smaller box area (+1 convention)."""
    iw = jnp.maximum(
        jnp.minimum(a[:, None, 2], b[None, :, 2])
        - jnp.maximum(a[:, None, 0], b[None, :, 0])
        + 1.0,
        0.0,
    )
    ih = jnp.maximum(
        jnp.minimum(a[:, None, 3], b[None, :, 3])
        - jnp.maximum(a[:, None, 1], b[None, :, 1])
        + 1.0,
        0.0,
    )
    area_a = (a[:, 2] - a[:, 0] + 1.0) * (a[:, 3] - a[:, 1] + 1.0)
    area_b = (b[:, 2] - b[:, 0] + 1.0) * (b[:, 3] - b[:, 1] + 1.0)
    return iw * ih / jnp.minimum(area_a[:, None], area_b[None, :])


def _encode_boxes(anchors: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ops.box_decode.bbox_pred (nonlinear_transform semantics,
    bbox_transform.rs:67-88): corner gt -> center/size deltas vs anchors."""
    aw, ah, acx, acy = _centers_sizes(anchors)
    gw, gh, gcx, gcy = _centers_sizes(gt)
    return jnp.stack(
        [
            (gcx - acx) / (aw + 1e-14),
            (gcy - acy) / (ah + 1e-14),
            jnp.log(gw / aw),
            jnp.log(gh / ah),
        ],
        axis=1,
    )


def match_anchors(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    pos_iou: float = 0.5,
    neg_iou: float = 0.3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Match (N,) anchors to (M,) padded ground truth.

    Returns (labels, best_gt, max_iou): labels in {1 pos, 0 neg, -1 ignore},
    best_gt the matched gt row per anchor.  Every valid gt's best anchor is
    forced positive (the paper's low-quality matching rule).
    """
    iou = bbox_overlaps(anchors, gt_boxes)  # (N, M)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    max_iou = jnp.max(iou, axis=1)

    labels = jnp.where(max_iou >= pos_iou, 1, jnp.where(max_iou < neg_iou, 0, -1))

    # Force-match each gt's best anchor.  scatter-max (not set): a padded
    # (invalid) gt's argmax lands on anchor 0 and a plain set with duplicate
    # indices could let its False clobber a valid gt's True there.
    best_anchor = jnp.argmax(iou, axis=0)  # (M,)
    forced = (
        jnp.zeros(anchors.shape[0], dtype=jnp.int32)
        .at[best_anchor]
        .max(gt_valid.astype(jnp.int32))
        .astype(bool)
    )
    labels = jnp.where(forced, 1, labels)
    best_gt = jnp.where(
        forced & (max_iou <= 0.0),
        jnp.zeros_like(best_gt),
        best_gt,
    )
    return labels, best_gt, max_iou


def flatten_raw_outputs(
    net_out: Dict[int, Dict[str, jnp.ndarray]],
    level_order: Tuple[int, ...],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-level raw maps -> (N, 2) logits, (N, 4) deltas, (N, 5, 2) lm deltas.

    Single-image slices, flattened in anchor-table order.
    """
    logits_l, box_l, lm_l = [], [], []
    for stride in level_order:
        maps = net_out[stride]
        h, w, a, _ = maps["score"].shape
        logits_l.append(maps["score"].reshape(h * w * a, 2))
        box_l.append(maps["bbox"].reshape(h, w, a, 4).reshape(-1, 4))
        lm_l.append(maps["landmark"].reshape(h, w, a, 5, 2).reshape(-1, 5, 2))
    return (
        jnp.concatenate(logits_l),
        jnp.concatenate(box_l),
        jnp.concatenate(lm_l),
    )


def detection_loss(
    logits: jnp.ndarray,
    box_deltas: jnp.ndarray,
    lm_deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_lms: jnp.ndarray,
    gt_valid: jnp.ndarray,
    box_weight: float = 2.0,
    lm_weight: float = 1.0,
    ohem_ratio: float = 3.0,
    pos_iou: float = 0.5,
    neg_iou: float = 0.3,
    gt_lm_valid: Any = None,
    ignore_boxes: Any = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """RetinaFace multi-task loss for one image (vmap over batch).

    Classification uses OHEM: all positives plus the hardest negatives at
    `ohem_ratio` negatives per positive (RetinaFace paper training recipe) —
    static-shape via rank thresholding instead of a dynamic top-k.
    """
    labels, best_gt, _ = match_anchors(
        anchors, gt_boxes, gt_valid, pos_iou=pos_iou, neg_iou=neg_iou
    )
    if ignore_boxes is not None and ignore_boxes.shape[0]:
        # Ignore regions (WIDER invalid faces + max_faces overflow): anchors
        # overlapping them must not train as negatives — they look like
        # faces.  Symmetric IoU cannot flag a sub-anchor-scale ignore face
        # (a 6x6 face centered in the smallest 16x16 anchor has IoU ~0.17),
        # so the criterion is intersection-over-MIN-area: it fires both
        # when the ignore face sits inside the anchor and when the anchor
        # sits inside a large ignore region (mmdet's iof handles only the
        # latter).  Degenerate padding rows are masked out explicitly.
        valid_ign = (ignore_boxes[:, 2] > ignore_boxes[:, 0]) & (
            ignore_boxes[:, 3] > ignore_boxes[:, 1]
        )
        iom = _intersection_over_min(anchors, ignore_boxes)
        iom = jnp.where(valid_ign[None, :], iom, 0.0)
        labels = jnp.where(
            (labels == 0) & (jnp.max(iom, axis=1) >= 0.5), -1, labels
        )
    pos = labels == 1
    neg = labels == 0
    num_pos = jnp.maximum(jnp.sum(pos), 1)

    # Classification CE with hard-negative mining.
    logp = jax.nn.log_softmax(logits, axis=-1)
    target = jnp.clip(labels, 0, 1)
    ce = -jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]
    neg_ce = jnp.where(neg, ce, -jnp.inf)
    # rank[i] = number of negatives with strictly larger loss; keep the
    # hardest ohem_ratio * num_pos negatives.
    order = jnp.argsort(-neg_ce)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    keep_neg = neg & (rank < (ohem_ratio * num_pos).astype(rank.dtype))
    cls_loss = (
        jnp.sum(jnp.where(pos, ce, 0.0)) + jnp.sum(jnp.where(keep_neg, ce, 0.0))
    ) / num_pos

    # Box regression on positives.
    matched_boxes = gt_boxes[best_gt]
    box_targets = _encode_boxes(anchors, matched_boxes)
    box_loss = (
        jnp.sum(jnp.where(pos[:, None], _smooth_l1(box_deltas - box_targets), 0.0))
        / num_pos
    )

    # Landmark regression on positives (encoded like landmark_pred's inverse).
    aw, ah, acx, acy = _centers_sizes(anchors)
    matched_lms = gt_lms[best_gt]  # (N, 5, 2)
    lm_targets = jnp.stack(
        [
            (matched_lms[:, :, 0] - acx[:, None]) / aw[:, None],
            (matched_lms[:, :, 1] - acy[:, None]) / ah[:, None],
        ],
        axis=-1,
    )
    # Faces without annotated landmarks (gt_lm_valid False) train the
    # classifier and box heads but contribute nothing to the landmark term;
    # the term normalizes by ITS positive count so mixed batches don't
    # dilute the gradient (the public RetinaFace training recipe).
    lm_ok = pos if gt_lm_valid is None else pos & gt_lm_valid[best_gt]
    num_lm = jnp.maximum(jnp.sum(lm_ok), 1)
    lm_loss = (
        jnp.sum(
            jnp.where(lm_ok[:, None, None], _smooth_l1(lm_deltas - lm_targets), 0.0)
        )
        / num_lm
    )

    total = cls_loss + box_weight * box_loss + lm_weight * lm_loss
    return total, {
        "cls_loss": cls_loss,
        "box_loss": box_loss,
        "lm_loss": lm_loss,
        "num_pos": num_pos.astype(jnp.float32),
    }


def arcface_margin_loss(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray,
    margin: float = 0.5,
    scale: float = 64.0,
) -> jnp.ndarray:
    """Additive-angular-margin softmax loss (ArcFace, Deng et al. 2019).

    The reference consumed a pre-trained `face_identification` model from
    Triton; training it in-framework needs this head: cosine logits between
    L2-normalized (B, D) embeddings and (C, D) class weights, the target
    class's angle shifted by `margin`, all scaled by `scale`.  One (B, D) x
    (D, C) matmul — pure MXU work — plus elementwise trig.
    """
    emb = embeddings / jnp.maximum(
        jnp.linalg.norm(embeddings, axis=1, keepdims=True), 1e-12
    )
    w = class_weights / jnp.maximum(
        jnp.linalg.norm(class_weights, axis=1, keepdims=True), 1e-12
    )
    cos = jnp.clip(emb @ w.T, -1.0 + 1e-7, 1.0 - 1e-7)  # (B, C)
    theta = jnp.arccos(cos)
    target_onehot = jax.nn.one_hot(labels, class_weights.shape[0])
    # Guard against theta + m wrapping past pi (which would make the target
    # logit non-monotonic in theta and reverse gradients for the
    # worst-misclassified samples): beyond the wrap point use the standard
    # linear fallback cos(theta) - m*sin(m).
    import math

    margined = jnp.where(
        theta <= math.pi - margin,
        jnp.cos(theta + margin),
        cos - margin * math.sin(margin),
    )
    cos_with_margin = jnp.where(target_onehot > 0, margined, cos)
    logits = scale * cos_with_margin
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(target_onehot * logp, axis=-1))


def _weight_decay_mask(params) -> Any:
    """True for leaves that should receive weight decay: conv/dense kernels
    only — biases and normalization scale/bias (any 1-D leaf) are exempt."""
    return jax.tree.map(lambda p: jnp.ndim(p) > 1, params)


class Trainer:
    """Sharded RetinaFace trainer: dp over "data", FSDP params over "model"."""

    def __init__(
        self,
        mesh: Mesh,
        cfg: Optional[FaceDetectionConfig] = None,
        learning_rate: float = 1e-3,
        dtype: Any = jnp.float32,
        pos_iou: float = 0.5,
        neg_iou: float = 0.3,
        remat: bool = False,
        warmup_steps: int = 0,
        total_steps: int = 0,
        weight_decay: float = 1e-4,
        ema_decay: float = 0.0,
    ) -> None:
        # pos/neg_iou: anchor-match thresholds (detection_loss).  The default
        # 0.5/0.3 is the RetinaFace recipe; datasets whose face sizes fall in
        # the anchor ladder's sqrt(2) coverage gaps (e.g. ~22 px between the
        # 16 and 32 anchors) can end up with a single force-matched positive
        # per face, which starves both heads — lower the thresholds there.
        self.mesh = mesh
        self.pos_iou = pos_iou
        self.neg_iou = neg_iou
        self.cfg = cfg or FaceDetectionConfig()
        anchors, level_info = full_anchor_table(
            self.cfg.image_size,
            RPN_ANCHOR_CFG,
            self.cfg.feat_strides,
            self.cfg.dense_anchor,
        )
        self.anchors = jnp.asarray(anchors)
        counts = {a for _stride, _fh, _fw, a in level_info}
        if len(counts) != 1:
            # level_info is in (32, 16, 8) reference order — never index it
            # positionally (CLAUDE.md); the heads share one anchor count.
            raise ValueError(f"per-level anchor counts differ: {sorted(counts)}")
        num_anchors = counts.pop()
        # remat: rematerialize backbone blocks on the backward pass
        # (nn.remat) — trades ~1 extra forward of block FLOPs for O(depth)
        # less activation HBM, the standard lever when a batch/resolution
        # doesn't fit.  Same params, same loss (tests/test_parallel.py).
        self.model = RetinaFace(
            backbone=self.cfg.backbone,
            num_anchors=num_anchors,
            dtype=dtype,
            remat=remat,
        )
        # LR schedule: constant by default; total_steps > 0 turns on linear
        # warmup -> cosine decay (the standard detector training recipe).
        if total_steps > 0:
            lr = optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=learning_rate,
                warmup_steps=max(warmup_steps, 1),
                decay_steps=total_steps,
            )
        else:
            lr = learning_rate
        # Decay masks out biases and normalization affines — decaying BN
        # scale/bias fights the running statistics instead of regularizing.
        self.tx = optax.adamw(
            lr, weight_decay=weight_decay, mask=_weight_decay_mask
        )
        #: ema_decay > 0 tracks an exponential moving average of params
        #: (state.ema_params) — the weights production detectors export.
        self.ema_decay = float(ema_decay)

    def init_state(self, seed: int = 0) -> TrainState:
        width, height = self.cfg.image_size
        dummy = jnp.zeros((1, height, width, 3), jnp.float32)
        variables = jax.jit(functools.partial(self.model.init, train=False))(
            jax.random.PRNGKey(seed), dummy
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)

        params = shard_pytree_fsdp(params, self.mesh)
        batch_stats = shard_pytree_fsdp(batch_stats, self.mesh)
        opt_state = shard_pytree_fsdp(opt_state, self.mesh)
        step = jax.device_put(jnp.zeros((), jnp.int32), replicated(self.mesh))
        # Distinct buffers with the params' shardings (donation would
        # otherwise alias the two trees).
        ema = jax.tree.map(jnp.copy, params) if self.ema_decay > 0 else None
        return TrainState(params, batch_stats, opt_state, step, ema)

    def make_train_step(self):
        mesh = self.mesh
        anchors = self.anchors
        model = self.model
        tx = self.tx

        def loss_fn(params, batch_stats, batch: TrainBatch):
            variables = {"params": params, "batch_stats": batch_stats}
            net_out, updates = model.apply(
                variables,
                batch.images,
                train=True,
                raw=True,
                mutable=["batch_stats"],
            )

            feat_strides = tuple(self.cfg.feat_strides)

            def per_image(i):
                single = jax.tree.map(lambda t: t[i], net_out)
                logits, boxes, lms = flatten_raw_outputs(single, feat_strides)
                return detection_loss(
                    logits,
                    boxes,
                    lms,
                    anchors,
                    batch.gt_boxes[i],
                    batch.gt_lms[i],
                    batch.gt_valid[i],
                    pos_iou=self.pos_iou,
                    neg_iou=self.neg_iou,
                    gt_lm_valid=batch.gt_lm_valid[i],
                    ignore_boxes=batch.gt_ignore[i],
                )

            losses, metrics = jax.vmap(per_image)(
                jnp.arange(batch.images.shape[0])
            )
            return jnp.mean(losses), (updates["batch_stats"], metrics)

        def train_step(state: TrainState, batch: TrainBatch):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (new_stats, metrics)), grads = grad_fn(
                state.params, state.batch_stats, batch
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            if self.ema_decay > 0:
                d = self.ema_decay
                ema = jax.tree.map(
                    lambda e, p: d * e + (1.0 - d) * p,
                    state.ema_params,
                    params,
                )
            else:
                ema = state.ema_params
            new_state = TrainState(
                params, new_stats, opt_state, state.step + 1, ema
            )
            mean_metrics = {k: jnp.mean(v) for k, v in metrics.items()}
            mean_metrics["loss"] = loss
            return new_state, mean_metrics

        batch_shard = data_sharding(mesh)
        batch_in = TrainBatch(*([batch_shard] * 6))
        jitted = jax.jit(
            train_step,
            in_shardings=(None, batch_in),
            donate_argnums=(0,),
        )

        def step(state: TrainState, batch: TrainBatch):
            if batch.gt_lm_valid is None:
                # Back-compat: 4-field batches (synthetic data) mean every
                # face has landmarks.
                batch = batch._replace(
                    gt_lm_valid=jnp.ones_like(batch.gt_valid)
                )
            if batch.gt_ignore is None:
                b = batch.gt_boxes.shape[0]
                batch = batch._replace(
                    gt_ignore=jnp.zeros((b, 1, 4), jnp.float32)
                )
            return jitted(state, batch)

        return step

    def make_batch(self, batch_size: int, max_faces: int = 8, seed: int = 0) -> TrainBatch:
        """Synthetic batch for smoke tests / dryruns."""
        rng = np.random.default_rng(seed)
        width, height = self.cfg.image_size
        # raw 0-255 pixel range (the TrainBatch convention)
        images = rng.uniform(0, 255, (batch_size, height, width, 3)).astype(np.float32)
        x1 = rng.uniform(0, width * 0.6, (batch_size, max_faces))
        y1 = rng.uniform(0, height * 0.6, (batch_size, max_faces))
        bw = rng.uniform(8, width * 0.3, (batch_size, max_faces))
        bh = rng.uniform(8, height * 0.3, (batch_size, max_faces))
        boxes = np.stack([x1, y1, x1 + bw, y1 + bh], axis=-1).astype(np.float32)
        lms = np.stack(
            [
                x1[..., None] + bw[..., None] * rng.uniform(0.2, 0.8, (batch_size, max_faces, 5)),
                y1[..., None] + bh[..., None] * rng.uniform(0.2, 0.8, (batch_size, max_faces, 5)),
            ],
            axis=-1,
        ).astype(np.float32)
        valid = (np.arange(max_faces)[None, :] < rng.integers(1, max_faces + 1, batch_size)[:, None])
        shard = data_sharding(self.mesh)
        return TrainBatch(
            jax.device_put(images, shard),
            jax.device_put(boxes, shard),
            jax.device_put(lms, shard),
            jax.device_put(valid, shard),
        )
