#!/usr/bin/env python
"""Convert a public PyTorch checkpoint into a registry .npz (VERDICT r2 #4).

The reference's model-repository role (Triton files +
repository_model_load, /root/reference/src/pipeline/face_pipeline/
pipeline.rs:89-116) is replaced here by self-describing .npz checkpoints the
ModelRegistry picks up from $RSFD_CHECKPOINT_DIR.  This CLI is the last
mile: a user holding any supported public .pth runs

    python tools/import_checkpoint.py Resnet50_Final.pth \
        $RSFD_CHECKPOINT_DIR/face_detection_retina.npz

and the serving registry loads the trained weights on next
`registry.load()` / pipeline construction.

Supported layouts (autodetected from state_dict keys; --kind to force):
  - biubug6/Pytorch_Retinaface  mobilenet0.25_Final.pth / Resnet50_Final.pth
  - insightface arcface_torch   backbone.pth (iresnet18/34/50/100)
  - Silent-Face-Anti-Spoofing   MiniFASNet V1/V2(/SE) .pth
  - torchvision                 resnet18 classifier state_dicts
  - mmdet/insightface SCRFD     scrfd_*.pth (shape-derived architecture)
  - OpenAI CLIP                 visual tower (ViT-B/16, ViT-L/14), with an
                                optional fine-tuned `head.*` classifier;
                                both plain state_dicts and the official
                                TorchScript .pt archives load

The heavy lifting (layout maps, architecture derivation, meta embedding)
lives in rs_face_detection_tpu.models.checkpoint_io; layout fidelity is
proven against torch mirror networks in tests/test_checkpoint_maps.py and
the CLI round trip in tests/test_import_checkpoint.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_torch_state_dict(path: str):
    """Load a .pth/.pt checkpoint to a flat {key: np.ndarray} state_dict."""
    import numpy as np
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # The official OpenAI CLIP releases are TorchScript archives, not
        # plain state_dict pickles — extract the weights from the scripted
        # module instead.
        obj = dict(torch.jit.load(path, map_location="cpu").state_dict())
    # Training checkpoints often wrap the weights: {"state_dict": ...} etc.
    # Prefer the conventional wrapper keys even when the wrapper ALSO
    # carries loose tensors (e.g. {"state_dict": ..., "step": tensor}).
    if isinstance(obj, dict):
        for key in ("state_dict", "model", "net", "weights"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    if not isinstance(obj, dict):
        raise ValueError(f"{path} does not contain a state_dict")
    # Keep tensor-valued entries only: wrappers carry loose scalars
    # ("epoch": 3) that are not weights; nested dicts here mean the
    # unwrap failed and the error should name the file, not np.asarray.
    tensors = {
        k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in obj.items()
        if hasattr(v, "numpy") or isinstance(v, np.ndarray)
    }
    if not tensors:
        raise ValueError(f"{path} does not contain a state_dict")
    return tensors


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Convert a public PyTorch checkpoint to a registry .npz"
    )
    parser.add_argument("src", help="input .pth/.pt checkpoint")
    parser.add_argument(
        "out",
        help="output .npz (name it <model_name>.npz); with --repository, "
        "the model NAME instead (the layout supplies the paths)",
    )
    parser.add_argument(
        "--repository",
        default=None,
        metavar="DIR",
        help="write a Triton-style repository entry "
        "(<DIR>/<out>/config.pbtxt + <DIR>/<out>/1/model.npz, servable "
        "via `python -m rs_face_detection_tpu.runtime "
        "--model-repository DIR`) instead of a flat .npz",
    )
    parser.add_argument(
        "--kind",
        default="auto",
        choices=("auto", "retinaface_mnet025", "retinaface_resnet50",
                 "iresnet", "minifas", "resnet18", "scrfd", "clip_visual"),
        help="checkpoint layout (default: autodetect from keys)",
    )
    parser.add_argument(
        "--image-size",
        default=None,
        metavar="WxH",
        help="serving input size override, e.g. 640x640 (family default "
        "otherwise; minifas derives it from the checkpoint)",
    )
    parser.add_argument(
        "--no-softmax",
        action="store_true",
        help="classifier heads emit logits/raw scores instead of "
        "probabilities (e.g. the FQA scalar head)",
    )
    parser.add_argument(
        "--stem-s2d",
        default="auto",
        choices=("auto", "true", "false"),
        help="RetinaFace only: space-to-depth stem layout (auto = backbone "
        "default: true for resnet50, false for mobilenet025)",
    )
    parser.add_argument(
        "--lenient",
        action="store_true",
        help="allow unconsumed torch keys (default: error on layout drift)",
    )
    args = parser.parse_args(argv)

    image_size = None
    if args.image_size:
        w, h = args.image_size.lower().split("x")
        image_size = (int(w), int(h))
    stem_s2d = {"auto": None, "true": True, "false": False}[args.stem_s2d]

    from rs_face_detection_tpu.models.checkpoint_io import (
        import_state_dict,
        save_imported,
    )

    sd = load_torch_state_dict(args.src)
    model, variables, meta = import_state_dict(
        sd,
        kind=args.kind,
        image_size=image_size,
        softmax=not args.no_softmax,
        stem_s2d=stem_s2d,
        strict=not args.lenient,
    )
    if args.repository:
        from rs_face_detection_tpu.runtime.repository import (
            write_repository_entry,
        )

        out_path = write_repository_entry(
            args.repository, args.out, variables, meta
        )
    else:
        save_imported(args.out, variables, meta)
        out_path = args.out
    desc = ", ".join(f"{k}={v}" for k, v in meta.items() if k != "spec")
    print(f"{args.src} -> {out_path} ({desc})")
    if args.repository:
        print(
            "serve it: python -m rs_face_detection_tpu.runtime "
            f"--model-repository {args.repository}"
        )
    else:
        print(
            "serve it: name the file <model_name>.npz inside "
            "RSFD_CHECKPOINT_DIR (e.g. face_detection_retina.npz) and "
            "(re)build the pipeline"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
