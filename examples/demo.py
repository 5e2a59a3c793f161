"""End-to-end demo: every public surface of rs_face_detection_tpu in one run.

    python examples/demo.py [path/to/face.jpg]

Without an image argument, a synthetic test image is used (random weights —
outputs are structurally correct but semantically arbitrary until trained /
imported checkpoints are loaded via models.registry / models.import_weights).
"""

import os
import sys
import time

import numpy as np

# Runnable from a source checkout without installation.
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import cv2

    from rs_face_detection_tpu import FacePipeline
    from rs_face_detection_tpu.models.registry import default_registry
    from rs_face_detection_tpu.pipeline import (
        FaceAntiSpoofing,
        FaceQualityAssessment,
    )

    if len(sys.argv) > 1:
        payload = open(sys.argv[1], "rb").read()
    else:
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        payload = cv2.imencode(".jpg", img)[1].tobytes()

    registry = default_registry()
    pipeline = FacePipeline(registry=registry)

    print("== FacePipeline.extract ==")
    t0 = time.perf_counter()
    result = pipeline.extract(payload)
    print(f"  ({time.perf_counter() - t0:.1f}s incl. compile)")
    print(f"  face_count       = {result.face_count}")
    print(f"  face_quality     = {result.face_quality}")
    print(f"  quality_score    = {result.quality_score}")
    if result.facial_feature is not None:
        print(f"  facial_feature   = shape {result.facial_feature.shape}, "
              f"norm {np.linalg.norm(result.facial_feature):.3f}")
    print(f"  selected_box     = {result.selected_face_box}")

    if result.selected_face_box is not None:
        image = cv2.imdecode(np.frombuffer(payload, np.uint8), cv2.IMREAD_COLOR)
        print("== Anti-spoofing (MiniFAS ensemble) ==")
        fas = FaceAntiSpoofing(registry=registry)
        live, score = fas([image], [result.selected_face_box])
        print(f"  liveness = {live.tolist()}, score = {score.tolist()}")

        print("== Quality assessment (scalar) ==")
        fqa = FaceQualityAssessment(registry=registry)
        scores, flags = fqa([image.astype(np.float32)])
        print(f"  score = {scores}, pass = {flags}")

    print("== Registry (model repository parity) ==")
    for row in registry.index():
        if row["state"] == "READY":
            stats = registry.statistics(row["name"])
            print(f"  {row['name']}: execs={stats.execution_count} "
                  f"infers={stats.inference_count}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
