"""Train a RetinaFace detector on a real dataset and emit a registry checkpoint.

    python tools/train_detector.py --labels widerface/train/label.txt \
        --images widerface/train/images --out face_detection_retina.npz \
        [--backbone mobilenet025] [--size 640x640] [--batch 8] [--steps 1000]
        [--lr 1e-3] [--max-faces 32] [--remat] [--wider-gt]  # bbx_gt format

Data flows through parallel/data.DetectionDataLoader (serving-parity
letterbox, static-padded ground truth, per-face landmark validity) into the
sharded Trainer (dp over every local device, FSDP params); the output .npz
is the registry checkpoint format — drop it in $RSFD_CHECKPOINT_DIR to
serve it (models/checkpoint_io.py), or load via models.registry.load_variables.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--labels", required=True,
                   help="label.txt (RetinaFace format) or wider bbx_gt file")
    p.add_argument("--images", required=True, help="image root directory")
    p.add_argument("--out", required=True, help="output .npz checkpoint")
    p.add_argument("--wider-gt", action="store_true",
                   help="labels are WIDER bbx_gt (boxes only) instead of "
                   "the RetinaFace label.txt format")
    p.add_argument("--backbone", default="mobilenet025",
                   choices=["mobilenet025", "resnet50"])
    p.add_argument("--size", default="640x640")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--max-faces", type=int, default=32)
    p.add_argument("--pos-iou", type=float, default=0.5)
    p.add_argument("--neg-iou", type=float, default=0.3)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone blocks (less activation HBM)")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help=">0 turns on linear-warmup + cosine decay to --steps")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help=">0 tracks an EMA of params and exports THOSE "
                   "weights (e.g. 0.999)")
    p.add_argument("--log-every", type=int, default=50)
    args = p.parse_args()

    import jax
    import numpy as np

    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.models.registry import save_variables
    from rs_face_detection_tpu.parallel.data import (
        DetectionDataLoader,
        parse_retinaface_label,
        wider_examples,
    )
    from rs_face_detection_tpu.parallel.mesh import data_sharding, make_mesh
    from rs_face_detection_tpu.parallel.train import Trainer

    examples = (
        wider_examples(args.labels)
        if args.wider_gt
        else parse_retinaface_label(args.labels)
    )
    print(f"{len(examples)} annotated images from {args.labels}")

    w, h = (int(v) for v in args.size.lower().split("x"))
    n_dev = jax.device_count()
    if args.batch % n_dev:
        raise SystemExit(f"--batch {args.batch} not divisible by {n_dev} devices")
    mesh = make_mesh(n_dev)
    cfg = FaceDetectionConfig(backbone=args.backbone, image_size=(w, h))
    trainer = Trainer(
        mesh, cfg, learning_rate=args.lr,
        pos_iou=args.pos_iou, neg_iou=args.neg_iou, remat=args.remat,
        warmup_steps=args.warmup_steps,
        total_steps=args.steps if args.warmup_steps > 0 else 0,
        ema_decay=args.ema_decay,
    )
    loader = DetectionDataLoader(
        examples, args.images, image_size=(w, h),
        batch_size=args.batch, max_faces=args.max_faces,
    )

    state = trainer.init_state(seed=0)
    step_fn = trainer.make_train_step()
    t0 = time.perf_counter()
    sharding = data_sharding(mesh)
    for i, batch in enumerate(loader.batches(epochs=None, sharding=sharding)):
        if i >= args.steps:
            break
        state, metrics = step_fn(state, batch)
        if i % args.log_every == 0 or i == args.steps - 1:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            print(
                f"step {i}: loss={m['loss']:.4f} cls={m['cls_loss']:.4f} "
                f"box={m['box_loss']:.4f} lm={m['lm_loss']:.4f} "
                f"pos={m['num_pos']:.1f} "
                f"({(time.perf_counter() - t0) / (i + 1):.2f}s/step)"
            )

    export_params = (
        state.ema_params if state.ema_params is not None else state.params
    )
    variables = {
        "params": jax.device_get(export_params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    save_variables(args.out, variables)
    which = "EMA" if state.ema_params is not None else "raw"
    print(f"wrote {args.out} ({which} weights)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
