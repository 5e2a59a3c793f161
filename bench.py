"""Benchmark: 640x640 images/sec/chip through the fused detect graph.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures the flagship configuration (BASELINE.json config 2): RetinaFace-R50,
batch 8 @ 640x640, bf16 compute, full fused graph (normalize -> backbone/FPN/
SSH -> anchor decode -> confidence filter -> top-k -> NMS) on one chip.
Baseline target: 2,000 img/s/chip (BASELINE.md north star).

Flags:
  --backbone {resnet50,mobilenet025}   (default resnet50)
  --batch N                            (default 8)
  --smoke                              tiny shapes, quick sanity run
  --latency                            also report p50 batch-1 latency
"""

import argparse
import json
import statistics
import sys
import time

import numpy as np


BASELINE_IMGS_PER_SEC = 2000.0


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--backbone", default="resnet50")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--latency", action="store_true")
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    image_size = (128, 128) if args.smoke else (640, 640)
    iters = 3 if args.smoke else args.iters

    cfg = FaceDetectionConfig(backbone=args.backbone, image_size=image_size)
    model, variables = init_retinaface(
        args.backbone, cfg.image_size, dtype=jnp.bfloat16, seed=0
    )
    detector = RetinaFaceDetection(cfg, model=model, variables=variables)
    batched = detector.make_batched_fn()

    width, height = cfg.image_size
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 255, size=(args.batch, height, width, 3), dtype=np.uint8)
    )
    scales = jnp.ones((args.batch,), jnp.float32)

    # Warmup / compile.
    out = batched(detector.variables, imgs, scales)
    jax.block_until_ready(out)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = batched(detector.variables, imgs, scales)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    med = statistics.median(times)
    imgs_per_sec = args.batch / med

    result = {
        "metric": f"640x640 images/sec/chip (RetinaFace-{args.backbone}, batch {args.batch}, fused detect)",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 4),
    }
    if args.smoke:
        result["metric"] = "SMOKE " + result["metric"]

    if args.latency:
        one_img = imgs[:1]
        one_scale = scales[:1]
        out = batched(detector.variables, one_img, one_scale)
        jax.block_until_ready(out)
        lat = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = batched(detector.variables, one_img, one_scale)
            jax.block_until_ready(out)
            lat.append(time.perf_counter() - t0)
        result["p50_batch1_latency_ms"] = round(
            statistics.median(lat) * 1000.0, 3
        )

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
