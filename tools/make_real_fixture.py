"""Train + freeze a real-photograph detector fixture (VERDICT r1 #5).

The build environment has no network egress, so public trained checkpoints
and datasets (WIDER) are unreachable.  This tool builds the next-best real
evidence from the one real photograph shipped with the environment —
matplotlib's public-domain `grace_hopper.jpg` (a 512x600 US Navy portrait
with a human face):

  - tests/fixtures/real_face.jpg          the photo, re-committed as a fixture
  - tests/fixtures/trained_real64.npz     detector weights trained on scenes
                                          composited from the REAL face crop
                                          (mixed with the synthetic scenes)
  - tests/fixtures/golden_real_face.npz   the face label + the trained
                                          detector's golden detections on the
                                          full portrait + recorded IoU/AP

The face label is derived deterministically from skin-tone segmentation
(largest YCrCb skin blob — printed and frozen below); the trained detector
must re-find that region on the full portrait (IoU gate), which exercises
real JPEG decode, letterbox, normalize and the whole detect graph on real
pixel statistics rather than synthetic squares.

Rerun after any legitimate behavior change:
    python tools/make_real_fixture.py [--steps 800]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

#: Frozen face label (x1, y1, x2, y2) on the 512x600 portrait.  Visually
#: verified (forehead-below-hat to chin, cheek to cheek); the YCrCb skin-blob
#: estimate (--relabel prints it) drifts left onto flag stripes and down the
#: neck and is only a cross-check.
FACE_BOX = (172.0, 125.0, 372.0, 340.0)


def load_portrait() -> np.ndarray:
    import cv2
    import matplotlib

    path = os.path.join(
        os.path.dirname(matplotlib.__file__), "mpl-data", "sample_data",
        "grace_hopper.jpg",
    )
    img = cv2.imread(path)
    assert img is not None and img.shape == (600, 512, 3), path
    return img


def skin_blob_box(img_bgr: np.ndarray):
    import cv2

    ycrcb = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2YCrCb)
    y, cr, cb = (ycrcb[..., i].astype(int) for i in range(3))
    mask = (cr >= 135) & (cr <= 180) & (cb >= 85) & (cb <= 135) & (y > 60)
    n, labels = cv2.connectedComponents(mask.astype(np.uint8))
    sizes = [(labels == i).sum() for i in range(1, n)]
    best = 1 + int(np.argmax(sizes))
    ys, xs = np.nonzero(labels == best)
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def real_scene(rng, face_crop, bg_pool, h=64, w=64):
    """Composite one 64x64 training scene from the real face crop."""
    import cv2

    from rs_face_detection_tpu.utils.synthetic import LANDMARK_TEMPLATE

    # Background: a random downscaled patch of the (non-face) photo.
    bg = bg_pool[rng.integers(len(bg_pool))]
    img = bg.astype(np.float32) * rng.uniform(0.6, 1.1)
    boxes = np.zeros((2, 4), np.float32)
    lms = np.zeros((2, 5, 2), np.float32)
    valid = np.zeros((2,), bool)

    s = int(rng.integers(14, 37))
    x = int(rng.integers(0, w - s))
    y = int(rng.integers(0, h - s))
    face = cv2.resize(face_crop, (s, s), interpolation=cv2.INTER_LINEAR)
    img[y : y + s, x : x + s] = face.astype(np.float32) * rng.uniform(0.8, 1.15)
    boxes[0] = (x, y, x + s - 1, y + s - 1)
    lms[0] = np.array([x, y]) + LANDMARK_TEMPLATE * s
    valid[0] = True
    return np.clip(img, 0, 255), boxes, lms, valid


def letterbox_scene(rng, portrait, face_box, h=64, w=64):
    """The eval distribution itself: the full portrait letterboxed to the
    canvas (aspect-preserving bilinear + zero right-pad), brightness-jittered.
    Including it makes the golden a *pinned* real-image regression point; the
    zoom-out and composite scenes keep the detector non-degenerate."""
    import cv2

    from rs_face_detection_tpu.utils.synthetic import LANDMARK_TEMPLATE

    ph, pw = portrait.shape[:2]
    sc = h / ph  # ph > pw for this portrait
    nw = int(pw * sc)
    resized = cv2.resize(portrait, (nw, h), interpolation=cv2.INTER_LINEAR)
    img = np.zeros((h, w, 3), np.float32)
    img[:, :nw] = resized.astype(np.float32) * rng.uniform(0.85, 1.1)
    x1, y1, x2, y2 = face_box
    boxes = np.zeros((2, 4), np.float32)
    lms = np.zeros((2, 5, 2), np.float32)
    valid = np.zeros((2,), bool)
    boxes[0] = (x1 * sc, y1 * sc, x2 * sc, y2 * sc)
    lms[0] = np.array([x1 * sc, y1 * sc]) + LANDMARK_TEMPLATE * np.array(
        [(x2 - x1) * sc, (y2 - y1) * sc]
    )
    valid[0] = True
    return np.clip(img, 0, 255), boxes, lms, valid


def portrait_scene(rng, portrait, face_box, h=64, w=64):
    """Zoom-out scene: a portrait sub-rectangle containing the face, resized
    to the training canvas — matches the full-letterboxed-photo statistics
    the golden eval sees (context, lighting, aspect), unlike the composited
    crops."""
    import cv2

    from rs_face_detection_tpu.utils.synthetic import LANDMARK_TEMPLATE

    ph, pw = portrait.shape[:2]
    x1, y1, x2, y2 = face_box
    fw, fh = x2 - x1, y2 - y1
    # Window side: from 1.2x the face up to the full image dimension.
    side = rng.uniform(1.2 * max(fw, fh), min(ph, pw))
    cx = rng.uniform(max(x2 - side, 0), min(x1, pw - side))
    cy = rng.uniform(max(y2 - side, 0), min(y1, ph - side))
    win = portrait[int(cy) : int(cy + side), int(cx) : int(cx + side)]
    # INTER_LINEAR (not AREA): the serving letterbox paths decimate with
    # plain bilinear (jax.image.resize antialias=False / cv2 INTER_LINEAR),
    # whose aliasing at ~9x downscale is a large part of the real pixel
    # statistics the detector must handle.
    img = cv2.resize(win, (w, h), interpolation=cv2.INTER_LINEAR).astype(
        np.float32
    ) * rng.uniform(0.8, 1.1)

    sc = w / side
    boxes = np.zeros((2, 4), np.float32)
    lms = np.zeros((2, 5, 2), np.float32)
    valid = np.zeros((2,), bool)
    bx1, by1 = (x1 - cx) * sc, (y1 - cy) * sc
    boxes[0] = (bx1, by1, (x2 - cx) * sc, (y2 - cy) * sc)
    lms[0] = np.array([bx1, by1]) + LANDMARK_TEMPLATE * np.array(
        [fw * sc, fh * sc]
    )
    valid[0] = True
    return np.clip(img, 0, 255), boxes, lms, valid


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3200)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--relabel", action="store_true")
    parser.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures"),
    )
    args = parser.parse_args()

    import cv2
    import jax

    jax.config.update("jax_platforms", "cpu")

    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.models.registry import _flatten
    from rs_face_detection_tpu.ops.box_decode import bbox_overlaps
    from rs_face_detection_tpu.parallel.mesh import data_sharding, make_mesh
    from rs_face_detection_tpu.parallel.train import TrainBatch, Trainer

    portrait = load_portrait()
    if args.relabel:
        print("skin blob:", skin_blob_box(portrait))
        return 0
    x1, y1, x2, y2 = FACE_BOX
    face_crop = portrait[int(y1) : int(y2) + 1, int(x1) : int(x2) + 1]

    os.makedirs(args.out, exist_ok=True)
    jpg_path = os.path.join(args.out, "real_face.jpg")
    cv2.imwrite(jpg_path, portrait, [int(cv2.IMWRITE_JPEG_QUALITY), 92])
    print(f"wrote {jpg_path}")

    # Background pool: 64x64 downscales of face-free photo regions.
    rng = np.random.default_rng(args.seed)
    bg_pool = []
    for _ in range(32):
        ph, pw = portrait.shape[:2]
        cw = int(rng.integers(96, 256))
        cx = int(rng.integers(0, pw - cw))
        cy = int(rng.integers(0, ph - cw)) if ph > cw else 0
        # avoid patches centered on the face
        if x1 - cw / 2 < cx + cw / 2 < x2 + cw / 2 and y1 - cw / 2 < cy + cw / 2 < y2 + cw / 2:
            cy = 0 if cy > ph / 2 else ph - cw
        patch = portrait[cy : cy + cw, cx : cx + cw]
        bg_pool.append(cv2.resize(patch, (64, 64), interpolation=cv2.INTER_LINEAR))

    mesh = make_mesh(1)
    train_cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.5,
        max_candidates=64,
        max_detections=8,
    )
    trainer = Trainer(
        mesh, train_cfg, learning_rate=2e-3, pos_iou=0.35, neg_iou=0.25
    )
    state = trainer.init_state(seed=args.seed)
    step = trainer.make_train_step()
    sh = data_sharding(mesh)

    def batch_arrays(batch=8):
        imgs = np.zeros((batch, 64, 64, 3), np.float32)
        boxes = np.zeros((batch, 2, 4), np.float32)
        lms = np.zeros((batch, 2, 5, 2), np.float32)
        valid = np.zeros((batch, 2), bool)
        for b in range(batch):  # scenes are BGR (cv2); TrainBatch wants RGB
            # Mixture: composited real-face crops, zoom-out portrait windows
            # (the golden eval's distribution), and synthetic squares (easy
            # early gradient).
            # NO synthetic squares: mixed in, the optimizer shortcut-learns
            # the bright-square cue and fires on e.g. the sky while treating
            # the real face's missed positives as cheap (OHEM dilutes the few
            # positive anchors).  Real-only scenes force the face features.
            u = rng.uniform()
            if u < 0.3:
                imgs[b], boxes[b], lms[b], valid[b] = real_scene(
                    rng, face_crop, bg_pool
                )
            elif u < 0.65:
                imgs[b], boxes[b], lms[b], valid[b] = letterbox_scene(
                    rng, portrait, FACE_BOX
                )
            else:
                imgs[b], boxes[b], lms[b], valid[b] = portrait_scene(
                    rng, portrait, FACE_BOX
                )
        return imgs, boxes, lms, valid

    for i in range(args.steps):
        imgs, boxes, lms, valid = batch_arrays()
        # TrainBatch.images is RGB (train.py:34); the cv2-composited scenes
        # are BGR.  The synthetic fixture never noticed (gray squares are
        # channel-symmetric) — real photos are not.
        imgs = imgs[..., ::-1].copy()
        batch = TrainBatch(
            jax.device_put(imgs, sh),
            jax.device_put(boxes, sh),
            jax.device_put(lms, sh),
            jax.device_put(valid, sh),
        )
        state, metrics = step(state, batch)
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i}: loss={float(metrics['loss']):.4f}")

    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    flat = {
        k: v.astype(np.float16) if v.dtype == np.float32 else v
        for k, v in _flatten(variables).items()
    }
    ckpt_path = os.path.join(args.out, "trained_real64.npz")
    np.savez_compressed(ckpt_path, **flat)
    print(f"wrote {ckpt_path} ({os.path.getsize(ckpt_path) / 1e6:.2f} MB)")

    # Golden: the trained detector must re-find the face on the FULL portrait
    # (never seen at this scale/position during training).
    from rs_face_detection_tpu.utils.fixtures import load_trained_detector

    eval_cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=8,
    )
    det = load_trained_detector(ckpt_path, eval_cfg)
    det_boxes, det_kps = det(portrait)
    gt = np.asarray([FACE_BOX], np.float32)
    ious = (
        np.asarray(bbox_overlaps(det_boxes[:, :4], gt))[:, 0]
        if len(det_boxes)
        else np.zeros((0,))
    )
    best_iou = float(ious.max()) if len(ious) else 0.0
    print(f"portrait: {len(det_boxes)} detections, best IoU vs label = {best_iou:.3f}")
    assert best_iou >= 0.5, "trained detector failed to re-find the real face"

    np.savez_compressed(
        os.path.join(args.out, "golden_real_face.npz"),
        face_box=np.asarray(FACE_BOX, np.float32),
        det_boxes=det_boxes,
        det_kps=det_kps,
        best_iou=np.float32(best_iou),
    )
    print("wrote golden_real_face.npz")
    return 0


if __name__ == "__main__":
    sys.exit(main())
