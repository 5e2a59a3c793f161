"""Real-data training pipeline (parallel/data.py) + landmark-validity loss.

Covers the RetinaFace label.txt parser (landmarked and -1 faces), the
WIDER adapter, letterbox geometry parity with serving, the static padding
contract, and that faces without landmark annotations train the
classifier/box heads while contributing nothing to the landmark term.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.parallel.data import (
    DetectionDataLoader,
    FaceExample,
    parse_retinaface_label,
    wider_examples,
)
from rs_face_detection_tpu.parallel.mesh import data_sharding, make_mesh
from rs_face_detection_tpu.parallel.train import Trainer

LABEL_TXT = """\
# scene_a/img0.jpg
10 20 40 50 15.0 30.0 0.0 35.0 30.0 0.0 25.0 45.0 0.0 18.0 58.0 0.0 33.0 58.0 0.0 0.9
# scene_b/img1.jpg
5 5 30 30 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 0.8
60 10 20 20 62.0 14.0 0.0 75.0 14.0 0.0 70.0 20.0 0.0 64.0 26.0 0.0 74.0 26.0 0.0 1.0
"""


def test_parse_retinaface_label(tmp_path):
    p = tmp_path / "label.txt"
    p.write_text(LABEL_TXT)
    ex = parse_retinaface_label(str(p))
    assert [e.rel_path for e in ex] == ["scene_a/img0.jpg", "scene_b/img1.jpg"]
    assert ex[0].boxes.shape == (1, 4)
    np.testing.assert_allclose(ex[0].boxes[0], [10, 20, 49, 69])
    assert ex[0].lm_valid.tolist() == [True]
    np.testing.assert_allclose(ex[0].lms[0, 0], [15.0, 30.0])
    # Second image: first face has -1 landmarks, second has real ones.
    assert ex[1].boxes.shape == (2, 4)
    assert ex[1].lm_valid.tolist() == [False, True]


def test_wider_adapter(tmp_path):
    gt = tmp_path / "wider_face_val_bbx_gt.txt"
    gt.write_text("a/b.jpg\n1\n10 10 20 20 0 0 0 0 0 0\n")
    ex = wider_examples(str(gt))
    assert len(ex) == 1 and ex[0].boxes.shape == (1, 4)
    assert ex[0].lm_valid.tolist() == [False]


def _write_dataset(root, n=16, size=(200, 160)):
    """n images with one known face box each; returns examples."""
    w, h = size
    examples = []
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        rel = f"ev/im{i}.jpg"
        os.makedirs(os.path.join(root, "ev"), exist_ok=True)
        cv2.imwrite(os.path.join(root, rel), img)
        box = np.asarray([[20.0 + i, 30.0, 80.0 + i, 100.0]], np.float32)
        lms = np.asarray(
            [[[30, 50], [60, 50], [45, 70], [35, 85], [60, 85]]], np.float32
        )
        examples.append(
            FaceExample(rel, box, lms, np.asarray([i % 2 == 0], bool))
        )
    return examples


def test_loader_letterbox_geometry(tmp_path):
    examples = _write_dataset(str(tmp_path))
    loader = DetectionDataLoader(
        examples, str(tmp_path), image_size=(64, 64), batch_size=2,
        max_faces=4, seed=1,
    )
    batch = next(loader.batches())
    assert batch.images.shape == (2, 64, 64, 3)
    assert batch.gt_boxes.shape == (2, 4, 4)
    assert batch.gt_lm_valid.shape == (2, 4)
    # Serving letterbox scale for a 200x160 image into 64x64 (rounded-dims
    # semantics — the exact value the fused detect path divides by).
    from rs_face_detection_tpu.ops.image import letterbox_geometry

    _, _, det_scale = letterbox_geometry(160, 200, 64, 64)
    # Each image has exactly one valid face whose box is source*scale.
    assert batch.gt_valid.sum() == 2
    for b in range(2):
        (box,) = batch.gt_boxes[b][batch.gt_valid[b]]
        assert 15 * det_scale <= box[0] <= 30 * det_scale + 2
        assert (box[2] - box[0]) == pytest.approx(60 * det_scale, abs=0.01)
    # Pixels are RGB raw range.
    assert 0.0 <= float(np.min(batch.images)) and float(np.max(batch.images)) <= 255.0


def test_lm_valid_masks_landmark_loss():
    from rs_face_detection_tpu.ops.anchors import full_anchor_table
    from rs_face_detection_tpu.configs import RPN_ANCHOR_CFG
    from rs_face_detection_tpu.parallel.train import detection_loss

    anchors, _ = full_anchor_table((64, 64), RPN_ANCHOR_CFG)
    anchors = jnp.asarray(anchors)
    n = anchors.shape[0]
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    boxes = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    lms = jnp.asarray(rng.normal(size=(n, 5, 2)).astype(np.float32))
    gt_boxes = jnp.asarray([[10.0, 10.0, 40.0, 40.0]], jnp.float32)
    gt_lms = jnp.asarray(rng.normal(size=(1, 5, 2)).astype(np.float32)) * 10
    gt_valid = jnp.asarray([True])

    _, with_lm = detection_loss(
        logits, boxes, lms, anchors, gt_boxes, gt_lms, gt_valid,
        gt_lm_valid=jnp.asarray([True]),
    )
    _, no_lm = detection_loss(
        logits, boxes, lms, anchors, gt_boxes, gt_lms, gt_valid,
        gt_lm_valid=jnp.asarray([False]),
    )
    assert float(with_lm["lm_loss"]) > 0
    assert float(no_lm["lm_loss"]) == 0.0
    # Classifier/box terms are untouched by the landmark mask.
    assert float(no_lm["cls_loss"]) == pytest.approx(
        float(with_lm["cls_loss"])
    )
    assert float(no_lm["box_loss"]) == pytest.approx(
        float(with_lm["box_loss"])
    )


def test_train_step_on_loader_batches(tmp_path):
    examples = _write_dataset(str(tmp_path))
    mesh = make_mesh(8)
    cfg = FaceDetectionConfig(image_size=(64, 64))
    trainer = Trainer(mesh, cfg, learning_rate=1e-3)
    loader = DetectionDataLoader(
        examples, str(tmp_path), image_size=(64, 64),
        batch_size=mesh.shape["data"], max_faces=4, seed=3,
    )
    state = trainer.init_state(seed=0)
    step = trainer.make_train_step()
    for i, batch in enumerate(loader.batches(epochs=None, sharding=data_sharding(mesh))):
        state, metrics = step(state, batch)
        if i >= 1:
            break
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2


def test_process_shard_partitions_examples(tmp_path):
    examples = _write_dataset(str(tmp_path), n=16)
    shards = [
        DetectionDataLoader(
            examples, str(tmp_path), image_size=(64, 64), batch_size=2,
            max_faces=4, seed=0, process_shard=(i, 4),
        )
        for i in range(4)
    ]
    seen = [e.rel_path for s in shards for e in s.examples]
    assert sorted(seen) == sorted(e.rel_path for e in examples)
    assert len(set(seen)) == len(examples)  # disjoint cover
    with pytest.raises(ValueError):
        DetectionDataLoader(
            examples, str(tmp_path), batch_size=2, process_shard=(4, 4)
        )


def test_ignore_regions_excluded_from_negatives():
    """Anchors overlapping an ignore region leave the negative pool: the
    same synthetic setup trains strictly fewer negatives with the region
    marked ignore than without."""
    from rs_face_detection_tpu.ops.anchors import full_anchor_table
    from rs_face_detection_tpu.configs import RPN_ANCHOR_CFG
    from rs_face_detection_tpu.parallel.train import detection_loss

    anchors, _ = full_anchor_table((64, 64), RPN_ANCHOR_CFG)
    anchors = jnp.asarray(anchors)
    n = anchors.shape[0]
    rng = np.random.default_rng(7)
    gt_boxes = jnp.asarray([[4.0, 4.0, 20.0, 20.0]], jnp.float32)
    gt_lms = jnp.zeros((1, 5, 2), jnp.float32)
    gt_valid = jnp.asarray([True])
    ignore = jnp.asarray([[40.0, 40.0, 60.0, 60.0]], jnp.float32)
    padding = jnp.zeros((1, 4), jnp.float32)

    # Make the anchors over the ignore region the HARDEST negatives
    # (high face logit), so OHEM would certainly train them as background
    # unless the ignore mask removes them from the pool.
    from rs_face_detection_tpu.ops.box_decode import bbox_overlaps

    over_ignore = (
        np.asarray(bbox_overlaps(anchors, ignore)).max(axis=1) >= 0.3
    )
    logits_np = rng.normal(size=(n, 2)).astype(np.float32)
    logits_np[over_ignore, 1] += 20.0  # confidently "face" -> huge neg CE
    logits = jnp.asarray(logits_np)
    boxes = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    lms = jnp.asarray(rng.normal(size=(n, 5, 2)).astype(np.float32))
    assert over_ignore.sum() > 0

    _, base = detection_loss(
        logits, boxes, lms, anchors, gt_boxes, gt_lms, gt_valid,
        ignore_boxes=padding,
    )
    _, masked = detection_loss(
        logits, boxes, lms, anchors, gt_boxes, gt_lms, gt_valid,
        ignore_boxes=ignore,
    )
    # Padding rows are inert; the ignore region removes the (deliberately
    # hardest) negatives over it, so the mined classification loss drops.
    assert float(masked["cls_loss"]) < float(base["cls_loss"]) - 1.0
    # Positive matching is untouched.
    assert float(base["num_pos"]) == float(masked["num_pos"])
    assert float(base["box_loss"]) == pytest.approx(float(masked["box_loss"]))


def test_loader_carries_ignore_boxes(tmp_path):
    examples = _write_dataset(str(tmp_path), n=2)
    examples[0].ignore_boxes = np.asarray([[5.0, 5.0, 15.0, 15.0]], np.float32)
    loader = DetectionDataLoader(
        examples, str(tmp_path), image_size=(64, 64), batch_size=2,
        max_faces=4, seed=1,
    )
    batch = next(loader.batches())
    assert batch.gt_ignore.shape == (2, 4, 4)
    from rs_face_detection_tpu.ops.image import letterbox_geometry

    _, _, s = letterbox_geometry(160, 200, 64, 64)
    row = np.asarray(batch.gt_ignore).reshape(2, 4, 4)
    # One of the two images carries the scaled ignore box; the other is all
    # zero padding (shuffle order is seed-dependent).
    flat = row.reshape(-1, 4)
    nonzero = flat[(flat != 0).any(axis=1)]
    assert nonzero.shape == (1, 4)
    np.testing.assert_allclose(nonzero[0], np.asarray([5, 5, 15, 15]) * s,
                               rtol=1e-5)


def test_uneven_process_shards_truncate_equal(tmp_path):
    examples = _write_dataset(str(tmp_path), n=14)
    shards = [
        DetectionDataLoader(
            examples, str(tmp_path), image_size=(64, 64), batch_size=2,
            max_faces=4, seed=0, process_shard=(i, 4),
        )
        for i in range(4)
    ]
    sizes = [len(s.examples) for s in shards]
    assert sizes == [3, 3, 3, 3]  # equal: hosts yield identical batch counts


def test_lr_schedule_and_decay_mask():
    """Warmup-cosine schedule plumbs through, and weight decay exempts
    1-D leaves (biases/BN affines)."""
    from rs_face_detection_tpu.parallel.train import _weight_decay_mask

    mask = _weight_decay_mask(
        {"conv": {"kernel": np.zeros((3, 3, 4, 8)), "bias": np.zeros((8,))},
         "bn": {"scale": np.zeros((8,)), "bias": np.zeros((8,))}}
    )
    assert mask["conv"]["kernel"] is True
    assert mask["conv"]["bias"] is False
    assert mask["bn"]["scale"] is False

    mesh = make_mesh(8)
    cfg = FaceDetectionConfig(image_size=(64, 64))
    trainer = Trainer(
        mesh, cfg, learning_rate=1e-3, warmup_steps=2, total_steps=10
    )
    state = trainer.init_state(seed=0)
    batch = trainer.make_batch(mesh.shape["data"], max_faces=4, seed=0)
    step = trainer.make_train_step()
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_train_cli_val_best_and_resume(tmp_path):
    """tools/train_detector.py: validation AP gating the exported weights,
    orbax periodic save, and auto-resume from the latest step."""
    import runpy
    import sys

    root = tmp_path / "data"
    root.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(8):
        img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
        rel = f"s/im{i}.jpg"
        os.makedirs(root / "s", exist_ok=True)
        cv2.imwrite(str(root / rel), img)
        lines.append(f"# {rel}")
        lines.append(
            "20 20 40 40 30.0 30.0 0.0 50.0 30.0 0.0 40.0 45.0 0.0 "
            "32.0 52.0 0.0 48.0 52.0 0.0 1.0"
        )
    labels = tmp_path / "label.txt"
    labels.write_text("\n".join(lines) + "\n")

    out = tmp_path / "trained.npz"
    ckpt_dir = tmp_path / "ckpts"
    batch = jax.device_count()
    argv = [
        "train_detector.py",
        "--labels", str(labels), "--images", str(root),
        "--out", str(out), "--size", "64x64",
        "--batch", str(batch), "--steps", "2", "--log-every", "1",
        "--val-labels", str(labels), "--val-max-images", "2",
        "--eval-every", "1",
        "--checkpoint-dir", str(ckpt_dir), "--save-every", "1",
    ]
    tool = os.path.join(
        os.path.dirname(__file__), "..", "tools", "train_detector.py"
    )
    old_argv = sys.argv
    try:
        sys.argv = argv
        with pytest.raises(SystemExit) as e:
            runpy.run_path(tool, run_name="__main__")
        assert e.value.code in (0, None)
    finally:
        sys.argv = old_argv

    assert out.exists()
    from rs_face_detection_tpu.parallel.checkpoint import latest_step

    assert latest_step(str(ckpt_dir)) == 2

    # Resume: target step already reached -> restores, runs 0 steps, still
    # exports weights.
    try:
        sys.argv = argv
        with pytest.raises(SystemExit) as e:
            runpy.run_path(tool, run_name="__main__")
        assert e.value.code in (0, None)
    finally:
        sys.argv = old_argv


def test_trainer_cli_rejects_undersized_dataset(tmp_path):
    """Fewer examples than --batch must SystemExit, not busy-spin forever
    through empty epochs (review finding)."""
    import runpy
    import sys

    import cv2

    root = tmp_path / "imgs"
    root.mkdir()
    cv2.imwrite(str(root / "one.jpg"), np.zeros((32, 32, 3), np.uint8))
    labels = tmp_path / "label.txt"
    labels.write_text("# one.jpg\n10 10 12 12 "
                      + " ".join(["-1.0"] * 15) + " 1.0\n")
    tool = os.path.join(
        os.path.dirname(__file__), "..", "tools", "train_detector.py"
    )
    old_argv = sys.argv
    try:
        sys.argv = [
            "train_detector.py", "--labels", str(labels), "--images",
            str(root), "--out", str(tmp_path / "o.npz"), "--size", "64x64",
            "--batch", "8", "--steps", "1",
        ]
        with pytest.raises(SystemExit, match="--batch"):
            runpy.run_path(tool, run_name="__main__")
    finally:
        sys.argv = old_argv


def test_negative_edge_landmark_is_still_annotated(tmp_path):
    """A face partially off the left border can have a legitimately
    NEGATIVE first landmark x in the public label.txt; only an ALL -1 row
    is the un-annotated sentinel (round-5 review: vals[4] >= 0 silently
    dropped edge faces from the landmark loss)."""
    p = tmp_path / "label.txt"
    p.write_text(
        "# scene_c/img2.jpg\n"
        "0 20 40 50 -3.0 30.0 0.0 20.0 30.0 0.0 8.0 45.0 0.0 "
        "2.0 58.0 0.0 18.0 58.0 0.0 0.9\n"
        "50 50 20 20 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 0.8\n"
    )
    (ex,) = parse_retinaface_label(str(p))
    assert ex.lm_valid.tolist() == [True, False]
    np.testing.assert_allclose(ex.lms[0, 0], [-3.0, 30.0])
