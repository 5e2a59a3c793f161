"""Train + freeze the PRODUCTION-shape (640x640) real-pixel detector fixture.

VERDICT r4 #8: every accuracy gate so far ran the 64px toy detector config,
so the production anchor pyramid (80/40/20 grids, anchor sides 16-512 px —
face_detection.rs:56-80) was never exercised by a trained-weights AP gate.
The 64-trained fixture does NOT transfer to the 640 graph (measured: AP ~ 0,
saturated false positives — BatchNorm statistics and anchor-level routing
both shift), so this tool trains a fixture AT the production shape from the
one real photograph in the egress-less environment (grace_hopper, face
label frozen in tools/make_real_fixture.py) and freezes:

  - tests/fixtures/trained_real640.npz   fp16-compressed detector variables
    (mnet025 @ 640x640, production RPN_ANCHOR_CFG / feat_strides)

then validates it by generating the 640-canvas real-pixel collage tree
(tools/make_collage_set.py canvas=640) and running the official WIDER
scorer on the production-shape graph, printing per-split APs — the values
tests/test_real_collage.py gates.

Scenes span the anchor ladder: collages paste 1-4 real faces at 24-320 px,
the letterboxed portrait puts the face at ~230 px, and zoom-out windows
reach ~530 px, so stride-8 through stride-32 anchors all receive positives.

Run on TPU when available (CPU works but is ~20x slower per step):
    python tools/make_fixture_640.py [--steps 1500] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# the sibling-tool import below must resolve when this module is loaded
# via importlib (tests/test_real_collage._load_tool), not just as a script
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from make_real_fixture import (  # noqa: E402  (same tools/ dir)
    FACE_BOX,
    letterbox_scene,
    load_portrait,
    portrait_scene,
)

SIZE = 640
MAX_FACES = 4
#: Pasted-face side range on the 640 canvas (collage scenes).  Log-uniform
#: so the small anchor levels see as many positives as the large ones.
FACE_MIN_PX, FACE_MAX_PX = 24, 320

#: The production-shape collage EVAL tree geometry (shared with
#: tests/test_real_collage.py's 640 gate): faces inside the trained range,
#: split thresholds scaled from the 96-canvas set's proportions.
COLLAGE_FACE_PX = (48, 300)
COLLAGE_EASY_MIN = 160
COLLAGE_MEDIUM_MIN = 90


def _save(state, out_dir, suffix=""):
    """fp16-compressed snapshot of the trainer variables, atomic rename."""
    import jax

    from rs_face_detection_tpu.models.registry import _flatten

    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    os.makedirs(out_dir, exist_ok=True)
    flat = {
        k: v.astype(np.float16) if v.dtype == np.float32 else v
        for k, v in _flatten(variables).items()
    }
    path = os.path.join(out_dir, "trained_real640.npz" + suffix)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **flat)
    os.replace(tmp, path)
    return path


def collage_scene(rng, face_crop, bg_pool):
    """1-4 real faces in distinct half-canvas cells on a real background."""
    import cv2

    from rs_face_detection_tpu.utils.synthetic import LANDMARK_TEMPLATE

    img = bg_pool[int(rng.integers(len(bg_pool)))].astype(np.float32)
    img = img * rng.uniform(0.7, 1.1)
    half = SIZE // 2
    cells = [(0, 0), (half, 0), (0, half), (half, half)]
    rng.shuffle(cells)
    boxes = np.zeros((MAX_FACES, 4), np.float32)
    lms = np.zeros((MAX_FACES, 5, 2), np.float32)
    valid = np.zeros((MAX_FACES,), bool)
    n_faces = int(rng.integers(1, MAX_FACES + 1))
    for i in range(n_faces):
        cx, cy = cells[i]
        s = int(
            np.exp(rng.uniform(np.log(FACE_MIN_PX), np.log(FACE_MAX_PX)))
        )
        s = min(s, half)
        x = int(cx + rng.integers(0, half - s + 1))
        y = int(cy + rng.integers(0, half - s + 1))
        face = cv2.resize(face_crop, (s, s), interpolation=cv2.INTER_LINEAR)
        img[y : y + s, x : x + s] = (
            face.astype(np.float32) * rng.uniform(0.8, 1.15)
        )
        boxes[i] = (x, y, x + s - 1, y + s - 1)
        lms[i] = np.array([x, y]) + LANDMARK_TEMPLATE * s
        valid[i] = True
    return np.clip(img, 0, 255), boxes, lms, valid


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--skip-eval", action="store_true")
    parser.add_argument(
        "--snapshot-every", type=int, default=250,
        help="write trained_real640.npz.partial every N steps (0 = off)",
    )
    parser.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "tests", "fixtures"
        ),
    )
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices(), flush=True)

    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.parallel.mesh import data_sharding, make_mesh
    from rs_face_detection_tpu.parallel.train import TrainBatch, Trainer

    portrait = load_portrait()
    x1, y1, x2, y2 = FACE_BOX
    face_crop = portrait[int(y1) : int(y2) + 1, int(x1) : int(x2) + 1]

    # Background pool: face-free portrait patches upscaled to the canvas —
    # the ONE implementation of the GT-purity rule (<=5% of face area;
    # make_collage_set.background_pool docstring has the round-5 story:
    # the old 20% rules put whole unlabeled faces into backgrounds, which
    # poisoned training labels here and eval ground truth there).
    from make_collage_set import background_pool

    rng = np.random.default_rng(args.seed)
    bg_pool = background_pool(rng, portrait, n=24, side=SIZE)

    mesh = make_mesh(1)
    # PRODUCTION detector geometry (image_size, strides, anchors all
    # defaults); thresholds as in the 64px real fixture: the sqrt(2)
    # anchor-ladder gaps need the looser matching (train.py:340-344).
    train_cfg = FaceDetectionConfig(image_size=(SIZE, SIZE))
    trainer = Trainer(
        mesh,
        train_cfg,
        learning_rate=2e-3,
        pos_iou=0.35,
        neg_iou=0.25,
        warmup_steps=100,
        total_steps=args.steps,
    )
    state = trainer.init_state(seed=args.seed)
    step = trainer.make_train_step()
    sh = data_sharding(mesh)

    def batch_arrays(batch):
        imgs = np.zeros((batch, SIZE, SIZE, 3), np.uint8)
        boxes = np.zeros((batch, MAX_FACES, 4), np.float32)
        lms = np.zeros((batch, MAX_FACES, 5, 2), np.float32)
        valid = np.zeros((batch, MAX_FACES), bool)
        for b in range(batch):
            u = rng.uniform()
            if u < 0.55:
                im, bx, lm, vl = collage_scene(rng, face_crop, bg_pool)
            elif u < 0.8:
                im, bx, lm, vl = letterbox_scene(
                    rng, portrait, FACE_BOX, h=SIZE, w=SIZE
                )
                boxes[b, : bx.shape[0]] = bx
                lms[b, : lm.shape[0]] = lm
                valid[b, : vl.shape[0]] = vl
                imgs[b] = np.clip(im, 0, 255).astype(np.uint8)
                continue
            else:
                im, bx, lm, vl = portrait_scene(
                    rng, portrait, FACE_BOX, h=SIZE, w=SIZE
                )
                boxes[b, : bx.shape[0]] = bx
                lms[b, : lm.shape[0]] = lm
                valid[b, : vl.shape[0]] = vl
                imgs[b] = np.clip(im, 0, 255).astype(np.uint8)
                continue
            imgs[b] = np.clip(im, 0, 255).astype(np.uint8)
            boxes[b], lms[b], valid[b] = bx, lm, vl
        # Random horizontal flip with label mirror (box x-reflect, landmark
        # x-reflect + left/right identity swap — pipeline/tta.py
        # _FLIP_LANDMARK_ORDER).  Without it the one-face fixture detector
        # is NOT mirror-invariant and TTA's flip view emits sloppy
        # duplicate boxes (round-5 measurement: 64-fixture flip-TTA easy
        # AP 0.99 -> 0.69 on the purified collage tree); production
        # RetinaFace checkpoints are flip-trained, so the fixture should
        # be too.
        for b in range(batch):
            if rng.uniform() >= 0.5:
                continue
            imgs[b] = imgs[b][:, ::-1]
            v = valid[b]
            bx = boxes[b].copy()
            boxes[b][:, 0] = np.where(v, SIZE - 1.0 - bx[:, 2], bx[:, 0])
            boxes[b][:, 2] = np.where(v, SIZE - 1.0 - bx[:, 0], bx[:, 2])
            lms[b][..., 0] = np.where(
                v[:, None], SIZE - 1.0 - lms[b][..., 0], lms[b][..., 0]
            )
            lms[b] = lms[b][:, (1, 0, 2, 4, 3), :]
        return imgs, boxes, lms, valid

    t0 = time.time()
    for i in range(args.steps):
        imgs_u8, boxes, lms, valid = batch_arrays(args.batch)
        # Scenes are BGR (cv2); TrainBatch wants RGB (train.py:34).  Upload
        # u8 (4x less tunnel traffic than f32) and cast ON DEVICE.
        staged = jax.device_put(imgs_u8[..., ::-1].copy(), sh)
        batch = TrainBatch(
            staged.astype(jnp.float32),
            jax.device_put(boxes, sh),
            jax.device_put(lms, sh),
            jax.device_put(valid, sh),
        )
        state, metrics = step(state, batch)
        if i % 100 == 0 or i == args.steps - 1:
            print(
                f"step {i}: loss={float(metrics['loss']):.4f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
        # Periodic partial snapshot (atomic rename): a CPU run takes hours
        # on this 1-core host, and a killed run must not lose everything —
        # a late-step partial can still pass the collage gates.
        if args.snapshot_every and i and i % args.snapshot_every == 0:
            _save(state, args.out, suffix=".partial")

    ckpt_path = _save(state, args.out)
    print(f"wrote {ckpt_path} ({os.path.getsize(ckpt_path) / 1e6:.2f} MB)")
    try:  # the mid-run snapshot is superseded; don't leave a stale orphan
        os.remove(ckpt_path + ".partial")
    except OSError:
        pass

    if args.skip_eval:
        return 0

    # Validate on the production-shape collage tree with the official
    # WIDER scorer via the same CLI path tests/test_real_collage.py gates.
    import tempfile

    from make_collage_set import build_collage_set
    import eval_wider

    with tempfile.TemporaryDirectory() as td:
        build_collage_set(
            td,
            args.out,
            seed=7,
            n_images=12,
            canvas=SIZE,
            face_px=COLLAGE_FACE_PX,
            easy_min=COLLAGE_EASY_MIN,
            medium_min=COLLAGE_MEDIUM_MIN,
        )
        argv_old = sys.argv
        sys.argv = [
            "eval_wider.py",
            "--root", td,
            "--backbone", "mobilenet025",
            "--checkpoint", ckpt_path,
            "--size", str(SIZE),
            "--split", "all",
            "--no-batched",
        ]
        try:
            rc = eval_wider.main()
        finally:
            sys.argv = argv_old
        return rc
    return 0


if __name__ == "__main__":
    sys.exit(main())
