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
    p.add_argument("--val-labels", default=None,
                   help="validation annotations (same format as --labels); "
                   "with --eval-every, the exported checkpoint is the "
                   "best-val-AP weights instead of the final step's")
    p.add_argument("--val-images", default=None,
                   help="validation image root (default: --images)")
    p.add_argument("--val-max-images", type=int, default=64,
                   help="cap on validation images per eval")
    p.add_argument("--eval-every", type=int, default=0,
                   help=">0: evaluate val AP every N steps (needs "
                   "--val-labels)")
    p.add_argument("--val-iou", type=float, default=0.5)
    p.add_argument("--checkpoint-dir", default=None,
                   help="orbax train-state directory: saves every "
                   "--save-every steps and auto-resumes from the latest")
    p.add_argument("--save-every", type=int, default=500)
    args = p.parse_args()
    if args.eval_every > 0 and not args.val_labels:
        raise SystemExit("--eval-every needs --val-labels")

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
    if len(examples) < args.batch:
        # The loader yields only full batches per epoch; fewer examples
        # than --batch would busy-spin through empty epochs forever.
        raise SystemExit(
            f"{len(examples)} examples < --batch {args.batch}; lower "
            f"--batch or check the labels file format"
        )

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

    # Validation set: (original BGR image, gt boxes in original coords) —
    # ops.eval.evaluate_detector's contract, via the single-image detector.
    val_set = None
    val_det = None
    if args.val_labels:
        import cv2

        from rs_face_detection_tpu.ops.eval import evaluate_detector
        from rs_face_detection_tpu.pipeline.detection import (
            RetinaFaceDetection,
        )

        val_examples = (
            wider_examples(args.val_labels)
            if args.wider_gt
            else parse_retinaface_label(args.val_labels)
        )[: args.val_max_images]
        val_root = args.val_images or args.images
        val_set = []
        for ex in val_examples:
            img = cv2.imread(os.path.join(val_root, ex.rel_path))
            if img is not None:
                val_set.append(
                    (img, np.asarray(ex.boxes, np.float32).reshape(-1, 4))
                )
        print(f"{len(val_set)} validation images from {args.val_labels}")
        if args.eval_every > 0 and not val_set:
            # Silently disabling every eval would train the full --steps
            # budget and export NOTHING — fail before burning the time.
            raise SystemExit(
                f"no readable validation images under {val_root!r} "
                f"(--eval-every {args.eval_every} would never run)"
            )

    def eval_ap(st) -> float:
        nonlocal val_det
        params = st.ema_params if st.ema_params is not None else st.params
        variables = {"params": params, "batch_stats": st.batch_stats}
        if val_det is None:
            # One detector instance for the whole run: its per-shape jit
            # cache persists across evals (variables are call arguments).
            val_det = RetinaFaceDetection(
                cfg, model=trainer.model, variables=variables
            )
        else:
            val_det.variables = variables
        return evaluate_detector(
            val_det, val_set, iou_threshold=args.val_iou
        )["ap"]

    state = trainer.init_state(seed=0)
    start = 0
    if args.checkpoint_dir:
        from rs_face_detection_tpu.parallel.checkpoint import (
            latest_step,
            restore_train_state,
            save_train_state,
        )

        if latest_step(args.checkpoint_dir) is not None:
            state = restore_train_state(args.checkpoint_dir, state)
            start = int(state.step)
            print(f"resumed from step {start} ({args.checkpoint_dir})")

    step_fn = trainer.make_train_step()
    t0 = time.perf_counter()
    sharding = data_sharding(mesh)
    # Best-val-AP is durable across resumes: each new best is written to
    # --out IMMEDIATELY, with the AP recorded in a sidecar so a resumed
    # process never overwrites a better earlier checkpoint.
    import json as _json

    sidecar = args.out + ".bestap.json"
    best_ap, wrote_best = -1.0, False
    if args.eval_every > 0 and os.path.exists(sidecar):
        if os.path.exists(args.out):
            try:
                best_ap = float(_json.load(open(sidecar))["ap"])
                print(f"previous best val AP {best_ap:.4f} ({sidecar})")
            except Exception:
                pass
        else:
            # A stale sidecar without its checkpoint (user deleted --out to
            # retrain) would suppress every write this run.
            print(f"ignoring stale {sidecar} (no {args.out} next to it)")
            os.remove(sidecar)
    g = start
    for i, batch in enumerate(loader.batches(epochs=None, sharding=sharding)):
        if g >= args.steps:
            break
        state, metrics = step_fn(state, batch)
        g = start + i + 1
        if (g - 1) % args.log_every == 0 or g == args.steps:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            print(
                f"step {g - 1}: loss={m['loss']:.4f} cls={m['cls_loss']:.4f} "
                f"box={m['box_loss']:.4f} lm={m['lm_loss']:.4f} "
                f"pos={m['num_pos']:.1f} "
                f"({(time.perf_counter() - t0) / (i + 1):.2f}s/step)"
            )
        if args.eval_every > 0 and val_set and (
            g % args.eval_every == 0 or g == args.steps
        ):
            ap = eval_ap(state)
            marker = ""
            if ap > best_ap:
                best_ap = ap
                params = (
                    state.ema_params
                    if state.ema_params is not None
                    else state.params
                )
                save_variables(args.out, {
                    "params": jax.device_get(params),
                    "batch_stats": jax.device_get(state.batch_stats),
                })
                _json.dump({"ap": ap, "step": g}, open(sidecar, "w"))
                wrote_best = True
                marker = f"  (new best -> {args.out})"
            print(f"step {g}: val AP {ap:.4f}{marker}")
        if args.checkpoint_dir and (
            g % args.save_every == 0 or g == args.steps
        ):
            save_train_state(args.checkpoint_dir, state, step=g)

    if args.eval_every > 0:
        # --out already holds the best-val-AP weights (written on each new
        # best, possibly by an earlier run of a resumed job).
        if wrote_best:
            print(f"{args.out} = best-val-AP {best_ap:.4f} weights")
        elif os.path.exists(args.out):
            print(
                f"no eval beat the recorded best ({best_ap:.4f}); "
                f"{args.out} left untouched"
            )
        else:
            print("WARNING: no eval ran and no prior checkpoint exists; "
                  "nothing written")
        return 0
    export_params = (
        state.ema_params if state.ema_params is not None else state.params
    )
    variables = {
        "params": jax.device_get(export_params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    which = "EMA" if state.ema_params is not None else "raw"
    save_variables(args.out, variables)
    print(f"wrote {args.out} ({which} weights)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
