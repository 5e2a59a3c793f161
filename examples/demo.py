"""End-to-end demo: every public surface of rs_face_detection_tpu in one run.

    python examples/demo.py [path/to/face.jpg]

Without an image argument, the committed real photograph
(tests/fixtures/real_face.jpg) is used, and the real-trained fixture
detector (tests/fixtures/trained_real64.npz) demonstrates an actual face
detection first; the FacePipeline stages then run with random weights —
structurally correct, semantically arbitrary until trained / imported
checkpoints are loaded via models.registry / models.import_weights.
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

    fixtures = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    real_jpg = os.path.join(fixtures, "real_face.jpg")
    real_ckpt = os.path.join(fixtures, "trained_real64.npz")
    if len(sys.argv) > 1:
        payload = open(sys.argv[1], "rb").read()
    elif os.path.exists(real_jpg):
        payload = open(real_jpg, "rb").read()
    else:
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        payload = cv2.imencode(".jpg", img)[1].tobytes()

    if os.path.exists(real_ckpt) and len(sys.argv) <= 1 and os.path.exists(real_jpg):
        from rs_face_detection_tpu.utils.fixtures import load_trained_detector
        from rs_face_detection_tpu.utils.image_io import decode_image_bytes

        print("== Real-face detection (trained fixture weights) ==")
        det = load_trained_detector(real_ckpt)
        boxes, kps = det(decode_image_bytes(payload))
        for b in boxes:
            print(f"  face @ ({b[0]:.0f},{b[1]:.0f})-({b[2]:.0f},{b[3]:.0f}) "
                  f"score {b[4]:.3f}")

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

    if os.path.exists(real_ckpt) and len(sys.argv) <= 1:
        print("== AOT serving artifact (compiled-model repository) ==")
        from rs_face_detection_tpu.runtime.aot import (
            export_detector,
            load_detector,
        )
        from rs_face_detection_tpu.utils.fixtures import load_trained_detector

        small = load_trained_detector(real_ckpt)
        blob = export_detector(small, batch_size=2, stem="s4d")
        loaded = load_detector(blob)
        print(f"  exported {len(blob)} bytes "
              f"(layout={loaded.meta['layout']}, "
              f"jax {loaded.meta['jax_version']})")

        from rs_face_detection_tpu.parallel.serving import DetectionServer
        from rs_face_detection_tpu.runtime.batcher import DynamicBatcher

        print("== Dynamic batching (Triton-scheduler role) ==")
        srv = DetectionServer(small, batch_size=4)
        img64 = cv2.resize(
            cv2.imdecode(np.frombuffer(payload, np.uint8), cv2.IMREAD_COLOR),
            (64, 64),
        )
        with DynamicBatcher(srv, max_delay_ms=20.0) as batcher:
            futs = [batcher.submit(img64) for _ in range(6)]
            for f in futs:
                f.result(timeout=300)
            print(f"  coalescing: {batcher.stats()}")

    print("== Registry (model repository parity) ==")
    for row in registry.index():
        if row["state"] == "READY":
            stats = registry.statistics(row["name"])
            print(f"  {row['name']}: execs={stats.execution_count} "
                  f"infers={stats.inference_count}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
