"""SCRFD distance-decode chain vs an independent numpy oracle.

VERDICT r1 #6: mirror what test_detection.py does for RetinaFace — a plain-
numpy replay of the SCRFD decode order (per-stride distance2bbox/kps in
stride units, clip, confidence filter, stable descending sort, greedy
+1-area NMS keep ovr <= thr) that the fused jit path must match row for row.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.ops.nms import nms_numpy
from rs_face_detection_tpu.pipeline.detection import select_and_nms
from rs_face_detection_tpu.pipeline.ekyc_pipeline import (
    SCRFDDetection,
    scrfd_anchor_centers,
)

IMAGE_SIZE = (64, 64)
SEL_CFG = FaceDetectionConfig(
    image_size=IMAGE_SIZE,
    confidence_threshold=0.35,
    max_candidates=256,  # > total anchors at 64x64: the top-k never binds
    max_detections=200,
)


def _np_scrfd_oracle(level_maps, centers, levels, cfg):
    """Independent numpy replay of SCRFDDetection._decode + select/NMS."""
    width, height = cfg.image_size
    scores_l, boxes_l, kps_l = [], [], []
    offset = 0
    for stride, fh, fw, a in levels:
        maps = level_maps[stride]
        k = fh * fw * a
        c = centers[offset : offset + k]
        scores_l.append(maps["score"].reshape(k))
        dist = maps["bbox"].reshape(k, 4) * float(stride)
        boxes = np.stack(
            [
                c[:, 0] - dist[:, 0],
                c[:, 1] - dist[:, 1],
                c[:, 0] + dist[:, 2],
                c[:, 1] + dist[:, 3],
            ],
            axis=1,
        )
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, width - 1)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, height - 1)
        boxes_l.append(boxes)
        kd = maps["kps"].reshape(k, 5, 2) * float(stride)
        kps_l.append(c[:, None, :] + kd)
        offset += k
    scores = np.concatenate(scores_l)
    boxes = np.concatenate(boxes_l)
    kps = np.concatenate(kps_l)

    keep = scores >= cfg.confidence_threshold
    scores, boxes, kps = scores[keep], boxes[keep], kps[keep]
    order = np.argsort(-scores, kind="stable")
    scores, boxes, kps = scores[order], boxes[order], kps[order]
    dets = np.concatenate([boxes, scores[:, None]], axis=1).astype(np.float32)
    keep_idx = nms_numpy(dets, cfg.iou_threshold)
    return dets[keep_idx], kps[keep_idx]


def _random_scrfd_maps(levels, seed):
    rng = np.random.default_rng(seed)
    maps = {}
    for stride, fh, fw, a in levels:
        maps[stride] = {
            "score": rng.uniform(0, 1, (fh, fw, a)).astype(np.float32),
            "bbox": rng.uniform(0, 4, (fh, fw, a * 4)).astype(np.float32),
            "kps": rng.normal(0, 2, (fh, fw, a * 10)).astype(np.float32),
        }
    return maps


@pytest.mark.parametrize("seed", range(4))
def test_scrfd_decode_chain_matches_oracle(seed):
    centers_np, levels = scrfd_anchor_centers(IMAGE_SIZE)
    maps = _random_scrfd_maps(levels, seed)
    expected_det, expected_kps = _np_scrfd_oracle(maps, centers_np, levels, SEL_CFG)

    # Drive the class's own _decode on the same maps (shim detector that
    # never touches a model).
    det = SCRFDDetection.__new__(SCRFDDetection)
    det.image_size = IMAGE_SIZE
    det.centers = jnp.asarray(centers_np)
    det.levels = levels
    det._sel_cfg = SEL_CFG
    jmaps = {
        s: {k: jnp.asarray(v) for k, v in m.items()} for s, m in maps.items()
    }
    scores, boxes, kps = det._decode(jmaps)
    out = select_and_nms(scores, boxes, kps, SEL_CFG, nms_mode="fixpoint")
    n = int(out.count)

    assert n == len(expected_det)
    np.testing.assert_allclose(
        np.asarray(out.det[:n]), expected_det, rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.kps[:n]), expected_kps, rtol=1e-4, atol=1e-3
    )


def test_scrfd_anchor_centers_layout():
    centers, levels = scrfd_anchor_centers((64, 32), strides=(8, 16, 32))
    # (stride, fh, fw, a) with fh = ceil(h/s): height=32, width=64.
    assert levels[0] == (8, 4, 8, 2)
    total = sum(fh * fw * a for _, fh, fw, a in levels)
    assert centers.shape == (total, 2)
    # First level: both anchors at a cell share the (x*s, y*s) center,
    # flattened (h, w, a).
    np.testing.assert_array_equal(centers[0], (0.0, 0.0))
    np.testing.assert_array_equal(centers[1], (0.0, 0.0))
    np.testing.assert_array_equal(centers[2], (8.0, 0.0))


def test_scrfd_batched_fn_matches_single_image():
    """make_batched_fn parity with the single-image path on a real model.

    Images are pre-letterboxed to image_size (det_scale 1), so the only
    difference between the paths is the batching itself.
    """
    from rs_face_detection_tpu.models.scrfd import init_scrfd

    model, variables = init_scrfd((64, 64), width=8, seed=0)
    det = SCRFDDetection(
        model=model,
        variables=variables,
        image_size=IMAGE_SIZE,
        confidence_threshold=0.35,
        registry=None,
    )
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, size=(2, 64, 64, 3), dtype=np.uint8)

    fn = det.make_batched_fn()
    out = fn(variables, jnp.asarray(imgs), jnp.ones((2,), jnp.float32))

    for i in range(2):
        boxes_i, kps_i = det(imgs[i])
        n = int(out.count[i])
        assert n == len(boxes_i)
        np.testing.assert_allclose(
            np.asarray(out.det[i, :n]), boxes_i, rtol=1e-5, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.kps[i, :n]), kps_i, rtol=1e-5, atol=1e-4
        )


def test_scrfd_default_max_candidates_tuned():
    """NMS cost is quadratic in the candidate cap; the SCRFD path ships the
    same tuned default as the main RetinaFace path (commit 08410a0)."""
    import inspect

    sig = inspect.signature(SCRFDDetection.__init__)
    assert sig.parameters["max_candidates"].default == 256
