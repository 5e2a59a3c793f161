"""Evaluate a detector on a local WIDER FACE validation tree.

Usage:
    python tools/eval_wider.py --root /data/WIDER [--backbone resnet50]
        [--checkpoint path.npz] [--size 640] [--max-images N]

The build environment has no copy of WIDER (zero egress), so this tool is
the *protocol* deliverable (BASELINE.md accuracy north star): with a local
`WIDER_val/images` + `wider_face_split/wider_face_val_bbx_gt.txt` tree it
reports AP through the same ops/eval machinery the committed fixture gates
use.  See tests/test_wider.py for the format-level validation against a
generated WIDER-layout directory.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default=None, help="WIDER root directory")
    parser.add_argument("--backbone", default="resnet50")
    parser.add_argument("--checkpoint", default=None, help=".npz trained weights")
    parser.add_argument("--size", type=int, default=640)
    parser.add_argument("--iou", type=float, default=0.5)
    parser.add_argument("--max-images", type=int, default=None)
    args = parser.parse_args()

    from rs_face_detection_tpu.ops.wider import evaluate_wider, find_wider_root

    root = args.root or find_wider_root()
    if root is None:
        print(
            "no WIDER tree found (set --root or WIDER_ROOT); "
            "expected <root>/WIDER_val/images + wider_face_split/..."
        )
        return 2

    import jax.numpy as jnp
    import numpy as np

    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(
        backbone=args.backbone, image_size=(args.size, args.size)
    )
    if args.checkpoint:
        from rs_face_detection_tpu.utils.fixtures import load_trained_detector

        det = load_trained_detector(args.checkpoint, cfg)
    else:
        from rs_face_detection_tpu.models.retinaface import init_retinaface

        print("WARNING: random weights (no --checkpoint) — AP will be ~0")
        model, variables = init_retinaface(
            args.backbone, cfg.image_size, dtype=jnp.bfloat16, seed=0
        )
        det = RetinaFaceDetection(cfg, model=model, variables=variables)

    def detector(img):
        boxes, kps = det(img)
        return np.asarray(boxes, np.float32).reshape(-1, 5), kps

    res = evaluate_wider(
        detector,
        os.path.join(root, "WIDER_val", "images"),
        os.path.join(root, "wider_face_split", "wider_face_val_bbx_gt.txt"),
        iou_threshold=args.iou,
        max_images=args.max_images,
        progress_every=50,
    )
    print(json.dumps({k: round(v, 4) for k, v in res.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
