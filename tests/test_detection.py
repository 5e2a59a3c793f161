"""Decode-chain parity vs a numpy oracle + end-to-end detector behavior.

The oracle below independently replays the reference's order of operations
(face_detection.rs:319-493): per-stride decode, confidence filter >= thr,
cross-stride vstack, stable descending score sort, greedy NMS (ovr <= thr
keep rule), descale.  The fused jit path must match it row for row.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rs_face_detection_tpu.configs import RPN_ANCHOR_CFG, FaceDetectionConfig
from rs_face_detection_tpu.ops.anchors import full_anchor_table
from rs_face_detection_tpu.ops.nms import nms_numpy
from rs_face_detection_tpu.pipeline.detection import (
    decode_level_outputs,
    select_and_nms,
)

# Generous static limits so neither the top-k prefilter nor the output cap
# binds: parity with the (uncapped) oracle must be exact.
CFG = FaceDetectionConfig(
    image_size=(64, 64),
    confidence_threshold=0.35,
    max_candidates=256,
    max_detections=200,
)


def _np_decode_oracle(level_maps, anchors, level_info, cfg):
    """Reference-order decode in plain numpy."""
    height, width = cfg.image_size[1], cfg.image_size[0]
    all_scores, all_boxes, all_lms = [], [], []
    offset = 0
    for stride, fh, fw, a in level_info:
        score = level_maps[stride]["score"].reshape(-1)
        deltas = level_maps[stride]["bbox"].reshape(-1, 4) * np.asarray(cfg.bbox_stds)
        anchor = anchors[offset : offset + fh * fw * a]
        # bbox_pred (+1 convention)
        w = anchor[:, 2] - anchor[:, 0] + 1.0
        h = anchor[:, 3] - anchor[:, 1] + 1.0
        cx = anchor[:, 0] + 0.5 * (w - 1.0)
        cy = anchor[:, 1] + 0.5 * (h - 1.0)
        pcx = deltas[:, 0] * w + cx
        pcy = deltas[:, 1] * h + cy
        pw = np.exp(deltas[:, 2]) * w
        ph = np.exp(deltas[:, 3]) * h
        boxes = np.stack(
            [
                pcx - 0.5 * (pw - 1.0),
                pcy - 0.5 * (ph - 1.0),
                pcx + 0.5 * (pw - 1.0),
                pcy + 0.5 * (ph - 1.0),
            ],
            axis=1,
        )
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, width - 1)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, height - 1)
        lm = level_maps[stride]["landmark"].reshape(-1, 5, 2) * cfg.landmark_std
        lms = np.stack(
            [lm[:, :, 0] * w[:, None] + cx[:, None], lm[:, :, 1] * h[:, None] + cy[:, None]],
            axis=-1,
        )
        keep = score >= cfg.confidence_threshold
        all_scores.append(score[keep])
        all_boxes.append(boxes[keep])
        all_lms.append(lms[keep])
        offset += fh * fw * a
    scores = np.concatenate(all_scores)
    boxes = np.concatenate(all_boxes)
    lms = np.concatenate(all_lms)
    order = np.argsort(-scores, kind="stable")
    scores, boxes, lms = scores[order], boxes[order], lms[order]
    dets = np.concatenate([boxes, scores[:, None]], axis=1).astype(np.float32)
    keep_idx = nms_numpy(dets, cfg.iou_threshold)
    return dets[keep_idx], lms[keep_idx]


def _random_level_maps(seed):
    rng = np.random.default_rng(seed)
    maps = {}
    width, height = CFG.image_size
    for stride in CFG.feat_strides:
        fh, fw = height // stride, width // stride
        maps[stride] = {
            "score": rng.uniform(0, 1, (fh, fw, 2)).astype(np.float32),
            "bbox": rng.normal(0, 0.3, (fh, fw, 8)).astype(np.float32),
            "landmark": rng.normal(0, 0.3, (fh, fw, 20)).astype(np.float32),
        }
    return maps


@pytest.mark.parametrize("seed", range(4))
def test_decode_chain_matches_oracle(seed):
    anchors_np, level_info = full_anchor_table(
        CFG.image_size, RPN_ANCHOR_CFG, CFG.feat_strides
    )
    maps = _random_level_maps(seed)
    expected_det, expected_lms = _np_decode_oracle(maps, anchors_np, level_info, CFG)

    jmaps = {
        s: {k: jnp.asarray(v) for k, v in m.items()} for s, m in maps.items()
    }
    scores, boxes, lms = decode_level_outputs(
        jmaps, jnp.asarray(anchors_np), level_info, CFG
    )
    out = select_and_nms(scores, boxes, lms, CFG, nms_mode="fixpoint")
    n = int(out.count)

    assert n == len(expected_det)
    np.testing.assert_allclose(np.asarray(out.det[:n]), expected_det, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.kps[:n]), expected_lms, rtol=1e-4, atol=1e-3)


def test_decode_chain_no_candidates():
    anchors_np, level_info = full_anchor_table(
        CFG.image_size, RPN_ANCHOR_CFG, CFG.feat_strides
    )
    maps = _random_level_maps(0)
    for m in maps.values():
        m["score"] = np.zeros_like(m["score"])  # all below threshold
    jmaps = {s: {k: jnp.asarray(v) for k, v in m.items()} for s, m in maps.items()}
    scores, boxes, lms = decode_level_outputs(
        jmaps, jnp.asarray(anchors_np), level_info, CFG
    )
    out = select_and_nms(scores, boxes, lms, CFG, nms_mode="fixpoint")
    assert int(out.count) == 0


def test_detector_end_to_end_shapes():
    """Random-weight detector: contract shapes, in-frame coords, determinism."""
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(
        image_size=(128, 128),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=16,
    )
    model, variables = init_retinaface("mobilenet025", cfg.image_size, seed=0)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(200, 160, 3), dtype=np.uint8)
    boxes, kps = det(img)
    boxes2, kps2 = det(img)

    assert boxes.ndim == 2 and boxes.shape[1] == 5
    assert kps.shape == (boxes.shape[0], 5, 2)
    np.testing.assert_array_equal(boxes, boxes2)
    np.testing.assert_array_equal(kps, kps2)
    if len(boxes):
        # Clip happened in the 128-frame, then descale by det_scale=128/200.
        assert (boxes[:, 0] >= 0).all() and (boxes[:, 1] >= 0).all()
        assert (boxes[:, 2] <= 200 / (128 / 200)).all()
        assert (boxes[:, 4] >= cfg.confidence_threshold).all()
        # Scores strictly descending-ish (sorted by construction).
        assert (np.diff(boxes[:, 4]) <= 1e-6).all()


def test_s2d_stem_input_matches_reference_order():
    """Fused uint8-domain preprocess == flip -> normalize -> cast -> s2d."""
    from rs_face_detection_tpu.models.layers import space_to_depth
    from rs_face_detection_tpu.ops.image import (
        bgr_to_rgb,
        normalize,
        s2d_stem_input,
    )

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(2, 8, 6, 3), dtype=np.uint8))
    mean = (123.675, 116.28, 103.53)
    scale = (58.4, 57.1, 57.4)
    post_div = 255.0

    fused = s2d_stem_input(imgs, mean, scale, post_div, jnp.bfloat16)
    ref = normalize(bgr_to_rgb(imgs.astype(jnp.float32)), mean, scale)
    ref = space_to_depth((ref / jnp.float32(post_div)).astype(jnp.bfloat16), 2)
    assert fused.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(fused, np.float32), np.asarray(ref, np.float32)
    )


def test_detector_batched_s2d_preprocess_matches_single():
    """R50 (s2d stem): fused-preprocess batched path == single-image path."""
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(
        backbone="resnet50",
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=16,
    )
    model, variables = init_retinaface("resnet50", cfg.image_size, seed=0)
    assert model.uses_s2d_stem()
    det = RetinaFaceDetection(cfg, model=model, variables=variables)

    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, size=(2, 64, 64, 3), dtype=np.uint8)
    batched = det.make_batched_fn()
    out = batched(det.variables, jnp.asarray(imgs), jnp.ones(2, jnp.float32))
    for i in range(2):
        single_boxes, _ = det(imgs[i])
        n = int(out.count[i])
        assert n == len(single_boxes)
        # rtol 1e-3: the fused uint8->bf16 preprocess and the f32 staged
        # path round the stem input differently (same math, one extra cast).
        np.testing.assert_allclose(
            np.asarray(out.det[i, :n]), single_boxes, rtol=1e-3, atol=1e-3
        )


def test_approx_candidate_selection_small_grid_exact():
    """With k >= candidate count, approx selection degrades to exact."""
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    kwargs = dict(
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=256,  # > 168 anchors at 64x64
        max_detections=16,
    )
    model, variables = init_retinaface("mobilenet025", (64, 64), seed=0)
    exact = RetinaFaceDetection(
        FaceDetectionConfig(**kwargs), model=model, variables=variables
    )
    approx = RetinaFaceDetection(
        FaceDetectionConfig(candidate_selection="approx", **kwargs),
        model=model,
        variables=variables,
    )
    img = np.random.default_rng(5).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    b1, k1 = exact(img)
    b2, k2 = approx(img)
    np.testing.assert_allclose(b1, b2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(k1, k2, rtol=1e-5, atol=1e-5)


def test_detector_pre_s2d_input_matches_device_path():
    """Host-reshuffled (pre_s2d) input gives identical detections."""
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.ops.image import s2d_layout_host
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(
        backbone="resnet50",
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=16,
    )
    model, variables = init_retinaface("resnet50", cfg.image_size, seed=0)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, size=(2, 64, 64, 3), dtype=np.uint8)
    scales = jnp.ones(2, jnp.float32)
    out = det.make_batched_fn()(det.variables, jnp.asarray(imgs), scales)
    out_pre = det.make_batched_fn(pre_s2d=True)(
        det.variables, jnp.asarray(s2d_layout_host(imgs)), scales
    )
    np.testing.assert_array_equal(np.asarray(out.count), np.asarray(out_pre.count))
    np.testing.assert_array_equal(np.asarray(out.det), np.asarray(out_pre.det))
    np.testing.assert_array_equal(np.asarray(out.kps), np.asarray(out_pre.kps))


def test_detector_batched_path_matches_single():
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(
        image_size=(128, 128),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=16,
    )
    model, variables = init_retinaface("mobilenet025", cfg.image_size, seed=0)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)

    rng = np.random.default_rng(1)
    # Pre-letterboxed square batch: det_scale = 1.
    imgs = rng.integers(0, 255, size=(2, 128, 128, 3), dtype=np.uint8)
    batched = det.make_batched_fn()
    out = batched(det.variables, jnp.asarray(imgs), jnp.ones(2, jnp.float32))
    for i in range(2):
        single_boxes, single_kps = det(imgs[i])
        n = int(out.count[i])
        assert n == len(single_boxes)
        np.testing.assert_allclose(
            np.asarray(out.det[i, :n]), single_boxes, rtol=1e-4, atol=1e-3
        )
