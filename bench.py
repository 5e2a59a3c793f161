"""Benchmark: 640x640 images/sec/chip through the fused detect graph.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Methodology: throughput mode — N batches with DISTINCT inputs are dispatched
asynchronously and blocked on once, measuring steady-state device throughput.
(Distinct inputs matter: the tunneled TPU relay serves repeated identical
executions from cache; and per-call sync would bill the ~29 ms relay
round-trip latency that a real deployment doesn't pay.)

Headline: the flagship RetinaFace-R50 batch 8 @ 640x640 fused detect
(BASELINE.json config 2) — preprocess, backbone/FPN/SSH forward, anchor
decode, confidence filter, top-k, NMS.  Extra fields report the
RetinaFace-MobileNet0.25 variant (config 1's model) at batch 8 and batch 32,
and the p50 single-batch latency.  Baseline: 2,000 img/s/chip (BASELINE.md).
"""

import argparse
import json
import statistics
import sys
import time

import numpy as np

BASELINE_IMGS_PER_SEC = 2000.0


def _throughput(fn, variables, make_batch, batch, n_batches=12):
    import jax

    batches = [make_batch(i) for i in range(n_batches)]
    warmup = make_batch(n_batches)  # never reused: relay caches identical calls
    jax.block_until_ready(fn(variables, *warmup))  # compile
    t0 = time.perf_counter()
    outs = [fn(variables, imgs, sc) for imgs, sc in batches]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n_batches
    return batch / dt, dt


def _latency(fn, variables, make_batch, iters=20):
    # Distinct inputs per iteration: the relay caches identical executions.
    import jax

    batches = [make_batch(i) for i in range(iters)]
    warmup = make_batch(iters)  # never reused: the relay caches identical calls
    jax.block_until_ready(fn(variables, *warmup))
    ts = []
    for imgs, scales in batches:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(variables, imgs, scales))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1000.0


def _build(backbone, image_size, nms_mode):
    import jax.numpy as jnp

    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(backbone=backbone, image_size=image_size)
    model, variables = init_retinaface(
        backbone, cfg.image_size, dtype=jnp.bfloat16, seed=0
    )
    det = RetinaFaceDetection(
        cfg, model=model, variables=variables, nms_mode=nms_mode
    )
    return det, det.make_batched_fn()


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--nms", default="fixpoint")
    parser.add_argument("--batches", type=int, default=12)
    args = parser.parse_args()

    import jax.numpy as jnp

    image_size = (128, 128) if args.smoke else (640, 640)
    width, height = image_size
    rng = np.random.default_rng(0)

    def batch_maker(batch):
        def make(i):
            imgs = jnp.asarray(
                rng.integers(0, 255, size=(batch, height, width, 3), dtype=np.uint8)
            )
            return imgs, jnp.ones((batch,), jnp.float32)

        return make

    n_batches = 3 if args.smoke else args.batches

    # Flagship: R50 batch 8.
    det, fn = _build("resnet50", image_size, args.nms)
    r50_b8, _ = _throughput(fn, det.variables, batch_maker(8), 8, n_batches)
    p50_ms = _latency(
        fn, det.variables, batch_maker(1), iters=5 if args.smoke else 20
    )

    r50_b32, _ = _throughput(
        fn, det.variables, batch_maker(32), 32, max(3, n_batches // 2)
    )

    # Light variant: MobileNet0.25 batch 8 and 32.
    detm, fnm = _build("mobilenet025", image_size, args.nms)
    mnet_b8, _ = _throughput(fnm, detm.variables, batch_maker(8), 8, n_batches)
    mnet_b32, _ = _throughput(fnm, detm.variables, batch_maker(32), 32, max(3, n_batches // 2))

    result = {
        "metric": "640x640 images/sec/chip (RetinaFace-R50, batch 8, fused detect incl NMS)",
        "value": round(r50_b8, 2),
        "unit": "images/sec",
        "vs_baseline": round(r50_b8 / BASELINE_IMGS_PER_SEC, 4),
        "r50_b8_img_s": round(r50_b8, 2),
        "r50_b32_img_s": round(r50_b32, 2),
        "r50_p50_batch1_latency_ms": round(p50_ms, 3),
        "mnet025_b8_img_s": round(mnet_b8, 2),
        "mnet025_b32_img_s": round(mnet_b32, 2),
        "nms_mode": args.nms,
    }
    if args.smoke:
        result["metric"] = "SMOKE " + result["metric"]
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
