"""Export an AOT serving artifact for the fused detect graph.

    python tools/export_model.py out.rsfdx [--backbone mobilenet025]
        [--size 640x640] [--batch 8] [--platform tpu] [--checkpoint ckpt.npz]

Writes the jax.export artifact produced by runtime/aot.export_detector —
the deployable compiled-program half of the Triton model-repository split
(weights stay in the registry .npz; pass --checkpoint to export against
imported public weights so shapes/architecture match the deployment).
Load side: `rs_face_detection_tpu.runtime.aot.load_detector(open(p,'rb').read())`.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("out", help="artifact path to write")
    p.add_argument("--backbone", default="mobilenet025",
                   choices=["mobilenet025", "resnet50", "scrfd"])
    p.add_argument("--size", default="640x640", help="WxH detector size")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--platform", default=None,
                   help="lowering target (e.g. tpu); default: current backend")
    p.add_argument("--checkpoint", default=None,
                   help="registry .npz to export against (tools/import_checkpoint.py output)")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    args = p.parse_args()

    import jax.numpy as jnp

    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.models.precision import cast_kernels
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection
    from rs_face_detection_tpu.runtime.aot import export_detector

    w, h = (int(v) for v in args.size.lower().split("x"))
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    if args.backbone == "scrfd":
        # The eKYC detector: duck-typed export (natural layout, no stem).
        from rs_face_detection_tpu.pipeline.ekyc_pipeline import SCRFDDetection

        if args.checkpoint:
            from rs_face_detection_tpu.models.checkpoint_io import (
                load_imported_model,
            )

            model, variables = load_imported_model(
                args.checkpoint, expect_family="scrfd"
            )
        else:
            from rs_face_detection_tpu.models.scrfd import init_scrfd

            model, variables = init_scrfd((w, h), dtype=dt, seed=0)
        if dt == jnp.bfloat16:
            variables = cast_kernels(variables)
        sdet = SCRFDDetection(
            model=model, variables=variables, image_size=(w, h), registry=None
        )
        platforms = (args.platform,) if args.platform else None
        blob = export_detector(
            sdet, batch_size=args.batch, platforms=platforms
        )
        with open(args.out, "wb") as f:
            f.write(blob)
        print(
            f"wrote {args.out}: {len(blob)} bytes "
            f"(scrfd {w}x{h} b{args.batch} "
            f"platform={args.platform or 'current'})"
        )
        return 0

    cfg = FaceDetectionConfig(backbone=args.backbone, image_size=(w, h))
    if args.checkpoint:
        # import_checkpoint output: architecture (incl. the stem layout the
        # import recorded) rebuilt from the embedded meta — NOT a raw
        # variables load, which would keep the __meta__ entry and crash
        # flax apply.  Same loader as the scrfd branch / eval_wider.
        from rs_face_detection_tpu.models.checkpoint_io import (
            load_imported_model,
        )

        model, variables = load_imported_model(
            args.checkpoint, expect_family="retinaface", image_size=(w, h)
        )
        if getattr(model, "backbone", args.backbone) != args.backbone:
            raise SystemExit(
                f"{args.checkpoint} holds backbone "
                f"{model.backbone!r}, but --backbone is {args.backbone!r}"
            )
    else:
        model, variables = init_retinaface(
            args.backbone, (w, h), dtype=dt, seed=0,
            stem_s2d=None if args.backbone == "mobilenet025" else True,
        )
    if dt == jnp.bfloat16:
        variables = cast_kernels(variables)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)

    platforms = (args.platform,) if args.platform else None
    # stem="auto": the dense s4d fast path when the model/size is eligible,
    # natural-layout fallback otherwise (an explicit "s4d" errors instead).
    blob = export_detector(
        det, batch_size=args.batch, stem="auto", platforms=platforms
    )
    with open(args.out, "wb") as f:
        f.write(blob)
    print(
        f"wrote {args.out}: {len(blob)} bytes "
        f"({args.backbone} {w}x{h} b{args.batch} "
        f"platform={args.platform or 'current'})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
