"""Loaders for the committed trained-weight fixtures.

tools/make_trained_fixture.py trains the small synthetic-scene detector and
freezes weights + goldens + a labeled eval set under tests/fixtures/.  These
loaders are shared by tests/test_golden_regression.py (semantic regression)
and bench.py (the detector_ap quality gate, VERDICT r1 #8).
"""

from __future__ import annotations


import numpy as np


def load_trained_detector(ckpt_path: str, cfg=None):
    """Rebuild the fixture detector from an fp16-compressed .npz checkpoint."""
    import jax

    from ..configs import FaceDetectionConfig
    from ..models.registry import _unflatten
    from ..models.retinaface import init_retinaface
    from ..pipeline.detection import RetinaFaceDetection

    cfg = cfg or FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=8,
    )
    with np.load(ckpt_path) as data:
        flat = {
            k: (
                data[k].astype(np.float32)
                if data[k].dtype == np.float16
                else data[k]
            )
            for k in data.files
        }
    variables = jax.tree.map(np.asarray, _unflatten(flat))
    model, _ = init_retinaface(cfg.backbone, cfg.image_size, seed=0)
    return RetinaFaceDetection(cfg, model=model, variables=variables)


def load_ap_eval_set(path: str):
    """[(img_u8, gt_boxes)] + recorded metrics from ap_eval_set.npz."""
    with np.load(path) as data:
        imgs = data["images"]
        padded = data["gt_boxes"]
        counts = data["gt_counts"]
        recorded = {
            "ap": float(data["recorded_ap"]),
            "recall": float(data["recorded_recall"]),
        }
    dataset = [
        (imgs[i], padded[i, : counts[i]].copy()) for i in range(len(imgs))
    ]
    return dataset, recorded
