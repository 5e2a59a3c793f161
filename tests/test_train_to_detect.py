"""Train-to-detect integration: the full loop must actually learn.

Trains the tiny RetinaFace on synthetic "faces" (bright squares with dark
eye-dots and a fixed landmark pattern) for a few hundred steps on one CPU
device, then runs the trained weights through the fused detect() path and
the AP harness on held-out scenes.  This exercises training (OHEM loss,
anchor matching, optimizer), the detector graph, and evaluation end to end —
random weights score AP ~0 here; a working learning loop scores far above.

Runtime ~90 s on CPU (compile + 250 steps at 64x64).
"""

import jax
import numpy as np
import pytest

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.ops.eval import evaluate_detector
from rs_face_detection_tpu.parallel.mesh import data_sharding, make_mesh
from rs_face_detection_tpu.parallel.train import TrainBatch, Trainer
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

from rs_face_detection_tpu.utils.synthetic import synth_batch_arrays


def _synth_batch(rng, trainer, batch=8):
    imgs, boxes, lms, valid = synth_batch_arrays(rng, batch)
    sh = data_sharding(trainer.mesh)
    return TrainBatch(
        jax.device_put(imgs, sh),
        jax.device_put(boxes, sh),
        jax.device_put(lms, sh),
        jax.device_put(valid, sh),
    )


def test_training_learns_to_detect():
    mesh = make_mesh(1)
    train_cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.5,
        max_candidates=64,
        max_detections=8,
    )
    trainer = Trainer(mesh, train_cfg, learning_rate=2e-3)
    state = trainer.init_state(seed=0)
    step = trainer.make_train_step()
    rng = np.random.default_rng(0)

    first_loss = None
    for i in range(250):
        state, metrics = step(state, _synth_batch(rng, trainer))
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    assert final_loss < first_loss / 5, (first_loss, final_loss)

    # Held-out evaluation through the fused detect path (lower confidence
    # threshold at eval: AP ranks by score, more candidates only help).
    eval_cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=8,
    )
    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    det = RetinaFaceDetection(eval_cfg, model=trainer.model, variables=variables)

    dataset = []
    for _ in range(12):
        b = _synth_batch(rng, trainer, batch=1)
        img_u8 = np.clip(np.asarray(b.images[0]), 0, 255).astype(np.uint8)
        gt = np.asarray(b.gt_boxes[0])[np.asarray(b.gt_valid[0])]
        dataset.append((img_u8, gt))

    res = evaluate_detector(det, dataset, iou_threshold=0.5)
    assert res["ap"] > 0.2, res
    assert res["recall"] > 0.25, res

    # Random (untrained) weights must score far worse — the AP came from
    # learning, not from the harness.
    det_rand = RetinaFaceDetection(eval_cfg)
    # Use a fresh small random model of the same architecture.
    from rs_face_detection_tpu.models.retinaface import init_retinaface

    model, rand_vars = init_retinaface("mobilenet025", (64, 64), seed=3)
    det_rand = RetinaFaceDetection(eval_cfg, model=model, variables=rand_vars)
    res_rand = evaluate_detector(det_rand, dataset, iou_threshold=0.5)
    assert res_rand["ap"] < res["ap"] / 2, (res_rand, res)
