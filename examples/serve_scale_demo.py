"""Production-serving demo: every scale lever in one runnable script.

    python examples/serve_scale_demo.py

Walks the deployment story end to end on small models (fast CPU jit; the
same code paths serve the full-size graphs on TPU — see DEPLOY.md):

  1. mesh-sharded DetectionServer (data-parallel batch over an 8-device
     virtual mesh) with the dense fast-path layout auto-selected
  2. dynamic request batching: concurrent single-image callers coalesce
     into device batches (Triton-scheduler role), with the queue/compute
     duration split in stats()
  3. zero-copy shared-memory ModelInfer over live gRPC (system shm verbs)
  4. AOT artifacts: the detect graph exported to portable StableHLO and
     re-hydrated without the model Python
  5. tensor-parallel ViT forward (Megatron shardings) on the same mesh

Run from a source checkout; forces the CPU backend in-process (the
sitecustomize overrides JAX_PLATFORMS — CLAUDE.md).
"""

import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

if not os.environ.get("RSFD_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> int:
    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.parallel import DetectionServer, make_mesh
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    rng = np.random.default_rng(0)

    # 1. Mesh-sharded serving --------------------------------------------
    cfg = FaceDetectionConfig(
        image_size=(64, 64), confidence_threshold=0.3,
        max_candidates=64, max_detections=16,
    )
    model, variables = init_retinaface("mobilenet025", cfg.image_size, seed=0)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    mesh = make_mesh(8, model_parallel=1)
    server = DetectionServer(det, mesh=mesh, batch_size=8)
    imgs = [rng.integers(0, 255, (96, 80, 3), np.uint8) for _ in range(8)]
    results = server.detect_batch(imgs)
    print(f"1. sharded serving: mesh={dict(mesh.shape)} "
          f"layout={server._layout} detections/img="
          f"{[int((b[:, 4] > 0).sum()) for b, _ in results]}")

    # 2. Dynamic batching -------------------------------------------------
    from rs_face_detection_tpu.runtime.batcher import DynamicBatcher

    with DynamicBatcher(server, max_delay_ms=20.0) as batcher:
        futs = []

        def client_burst(lo):
            for i in range(lo, 24, 4):
                futs.append(batcher.submit(imgs[i % len(imgs)]))

        threads = [threading.Thread(target=client_burst, args=(i,)) for i in range(4)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        [f.result(timeout=600) for f in list(futs)]
        s = batcher.stats()
    print(f"2. dynamic batching: {s['requests']} requests -> {s['batches']} "
          f"batches; compute p50 {s['compute_ms']['p50']} ms, "
          f"queue p50 {s['queue_ms']['p50']} ms")

    # 3. Zero-copy shm ModelInfer over gRPC -------------------------------
    try:
        from rs_face_detection_tpu.models.registry import (
            ModelRegistry,
            ModelSpec,
        )
        from rs_face_detection_tpu.runtime import SharedRegion
        from rs_face_detection_tpu.runtime.server import (
            FacePipelineClient,
            serve,
        )

        reg = ModelRegistry()
        reg.register(ModelSpec("face_detection_retina", (64, 64, 3), "maps"),
                     model, variables)
        grpc_server = serve(None, reg, port=0)
    except RuntimeError:
        print("3. (grpcio not available; shm demo skipped)")
    else:
        try:
            client = FacePipelineClient("localhost", grpc_server._rsfd_port,
                                        timeout_s=600)
            with SharedRegion.create("rsfd_demo_region", 1 << 22) as region:
                client.register_region("demo", region)
                batch = rng.integers(0, 255, (1, 64, 64, 3), np.uint8)
                outs = client.model_infer_shm(
                    "face_detection_retina", batch.astype(np.float32), region,
                    train=False,
                )
                stats = client.model_statistics("face_detection_retina")
                print(f"3. shm ModelInfer: {len(outs)} output tensors via "
                      f"/dev/shm; server stats batch_size_counts="
                      f"{stats['batch_size_counts']} "
                      f"mem={stats['memory_usage_bytes']/1e6:.1f} MB")
                client.system_shared_memory_unregister()
            client.close()
        finally:
            grpc_server.stop(0)

    # 4. AOT artifact ------------------------------------------------------
    from rs_face_detection_tpu.runtime.aot import export_detector, load_detector

    blob = export_detector(det, batch_size=2)
    loaded = load_detector(blob)
    print(f"4. AOT: {len(blob) / 1e6:.2f} MB artifact "
          f"({loaded.meta['layout']} layout) re-hydrated without model Python")

    # 5. Tensor-parallel ViT ----------------------------------------------
    from rs_face_detection_tpu.models.vit import init_vit
    from rs_face_detection_tpu.parallel import make_tp_vit_fn

    tp_mesh = make_mesh(8, model_parallel=2)
    vit, vvars = init_vit("clip_tiny_test", 2, (32, 32))
    fwd, svars = make_tp_vit_fn(vit, vvars, tp_mesh)
    x = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    probs = np.asarray(fwd(svars, x))
    print(f"5. TP ViT: mesh={dict(tp_mesh.shape)} out={probs.shape} "
          f"rows sum to {probs.sum(1).round(3)[:2]}...")
    return 0


if __name__ == "__main__":
    sys.exit(main())
