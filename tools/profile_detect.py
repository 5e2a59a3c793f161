"""Op-level profile of the fused detect graph on the current backend.

Captures a jax.profiler trace of one batched detect call, then attributes the
top device events back to source ops by cross-referencing fusion names with
the compiled HLO's op_name metadata.  This is how the space-to-depth stem
and max_candidates findings were made (see CLAUDE.md / memory notes).

Usage:
    python tools/profile_detect.py [--backbone mobilenet025] [--batch 32]
"""

import argparse
import glob
import gzip
import json
import os
import re
import shutil
import sys
import tempfile
from collections import defaultdict

# Runnable from a source checkout without installation.
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--backbone", default="mobilenet025")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--image-size", type=int, default=640)
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument("--pre-s2d", action="store_true")
    parser.add_argument("--approx-topk", action="store_true")
    parser.add_argument("--quant", default=None, choices=[None, "int8"])
    parser.add_argument("--stem", default="auto", choices=["auto", "xla", "pallas", "s4d"])
    parser.add_argument("--cast-bf16", action="store_true",
                        help="pre-cast conv kernels to bf16 (bench parity)")
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection
    from rs_face_detection_tpu.utils.profiling import trace

    size = (args.image_size, args.image_size)
    cfg = FaceDetectionConfig(
        backbone=args.backbone,
        image_size=size,
        candidate_selection="approx" if args.approx_topk else "exact",
    )
    model, variables = init_retinaface(
        args.backbone,
        size,
        dtype=jnp.bfloat16,
        seed=0,
        stem_s2d=True if args.pre_s2d else None,
    )
    if args.quant == "int8":
        from rs_face_detection_tpu.ops.quantize import quantize_retinaface

        model, variables = quantize_retinaface(model, variables, size)
    if args.cast_bf16:
        from rs_face_detection_tpu.models.precision import cast_kernels

        variables = cast_kernels(variables)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    fn = det.make_batched_fn(pre_s2d=args.pre_s2d, stem=args.stem)

    rng = np.random.default_rng(0)
    imgs_np = rng.integers(0, 255, (args.batch, size[1], size[0], 3), dtype=np.uint8)
    if args.stem == "s4d":
        from rs_face_detection_tpu.ops.image import s4d_layout_host

        imgs_np = s4d_layout_host(imgs_np)
    elif args.pre_s2d:
        from rs_face_detection_tpu.ops.image import s2d_layout_host

        imgs_np = s2d_layout_host(imgs_np)
    imgs = jnp.asarray(imgs_np)
    scales = jnp.ones((args.batch,), jnp.float32)
    jax.block_until_ready(fn(det.variables, imgs, scales))  # compile + warm

    trace_dir = tempfile.mkdtemp(prefix="rsfd_profile_")
    with trace(trace_dir):
        jax.block_until_ready(fn(det.variables, imgs, scales))

    # make_batched_fn's aux protocol: the profiled executable is fn.jitted
    # with the dense-front constants folded once outside the graph.
    if hasattr(fn, "jitted"):
        aux = fn.fold(det.variables)
        hlo = (
            fn.jitted.lower(det.variables, aux, imgs, scales)
            .compile()
            .as_text()
        )
    else:
        hlo = fn.lower(det.variables, imgs, scales).compile().as_text()

    def op_meta(name: str) -> str:
        m = re.search(rf"^\s*%?{re.escape(name)} = .*$", hlo, re.M)
        if not m:
            return ""
        mm = re.search(r'op_name="([^"]+)"', m.group(0))
        return (mm.group(1) if mm else "")[:100]

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace produced", file=sys.stderr)
        return 1
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    by_name = defaultdict(float)
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("dur", 0) > 0:
            by_name[e["name"]] += e["dur"]

    print(f"# top {args.top} events ({args.backbone} b{args.batch} @ {size})")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[: args.top]:
        extra = op_meta(name) if not name.startswith("$") else ""
        print(f"{dur / 1000:9.3f} ms  {name[:34]:36s} {extra}")

    # Aggregate device time by component (op_name path prefix): the long
    # tail of sub-0.1 ms fusions is where half the graph time hides.
    groups = defaultdict(float)
    total = 0.0
    for name, dur in by_name.items():
        if name.startswith("$") or name.startswith("jit_") or name.startswith(
            ("PjitFunction", "ParseArguments")
        ):
            continue
        meta = op_meta(name)
        total += dur
        m = re.search(r"RetinaFace/(body/s\d|body|fpn|ssh\d|cls\d|box\d|ldm\d)", meta)
        if m:
            groups[m.group(1)] += dur
        elif "RetinaFace" in meta:
            groups["model/other"] += dur
        elif meta:
            groups["decode/nms/pre"] += dur
        else:
            groups["(no-meta: copies, infeed)"] += dur
    print(f"\n# device time by component (sum {total / 1000:.3f} ms)")
    for g, dur in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"{dur / 1000:9.3f} ms  {g}")
    shutil.rmtree(trace_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
