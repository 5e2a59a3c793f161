"""`python -m rs_face_detection_tpu.runtime` — run the serving facade.

Production entrypoint for the gRPC facade (runtime/server.py), the external
surface that mirrors the reference's Triton client verb families
(/root/reference/src/triton_client/client.rs:26-200).  Where the reference
CONNECTS to a Triton server, this process IS the server: models execute
in-process on the local TPU through the fused jit graphs.

    python -m rs_face_detection_tpu.runtime --port 8001
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="rs_face_detection_tpu.runtime",
        description="gRPC serving facade for the TPU face pipeline",
    )
    parser.add_argument("--port", type=int, default=8001)
    parser.add_argument("--max-workers", type=int, default=8)
    parser.add_argument(
        "--warmup",
        action="store_true",
        help="run one synthetic extract before accepting traffic "
        "(compiles the detect/extract graphs up front)",
    )
    parser.add_argument(
        "--dynamic-batching",
        action="store_true",
        help="coalesce concurrent Detect calls into device batches "
        "(the Triton-scheduler role; runtime/batcher.py)",
    )
    parser.add_argument(
        "--batch-delay-ms",
        type=float,
        default=2.0,
        help="max wait for batch-mates after the first queued request",
    )
    parser.add_argument(
        "--checkpoint-dir",
        default=None,
        help="directory of imported .npz checkpoints "
        "(tools/import_checkpoint.py output); sets RSFD_CHECKPOINT_DIR "
        "before the model registry is built",
    )
    parser.add_argument(
        "--no-triton-wire",
        action="store_true",
        help="serve only the JSON facade (skip the genuine Triton "
        "protobuf contract on the same port)",
    )
    parser.add_argument(
        "--http-port",
        type=int,
        default=None,
        metavar="PORT",
        help="also serve the KServe-v2 HTTP/REST endpoint "
        "(runtime/http.py — Triton's second client surface) on PORT, "
        "sharing state with the gRPC protocols",
    )
    parser.add_argument(
        "--model-repository",
        default=None,
        metavar="DIR",
        help="serve a Triton-style model repository "
        "(<DIR>/<model>/config.pbtxt + <version>/model.npz, "
        "runtime/repository.py) instead of the built-in builders — "
        "the reference's Triton repository workflow",
    )
    args = parser.parse_args(argv)

    if args.checkpoint_dir:
        import os

        os.environ["RSFD_CHECKPOINT_DIR"] = args.checkpoint_dir

    from .server import serve

    registry = None
    if args.model_repository:
        from ..models.registry import ModelRegistry
        from .repository import attach_repository_builders

        registry = ModelRegistry()
        names = attach_repository_builders(registry, args.model_repository)
        print(
            f"model repository {args.model_repository}: "
            f"{len(names)} models ({', '.join(names) or 'none'})"
        )

    server = serve(
        registry=registry,
        port=args.port,
        max_workers=args.max_workers,
        dynamic_batching=args.dynamic_batching,
        batch_delay_ms=args.batch_delay_ms,
        triton_wire=not args.no_triton_wire,
        http_port=args.http_port,
    )
    port = getattr(server, "_rsfd_port", args.port)
    if args.http_port is not None:
        print(f"KServe-v2 HTTP endpoint on :{server._rsfd_http_port}")
    if args.warmup:
        import cv2
        import numpy as np

        from .server import FacePipelineClient

        img = np.zeros((480, 640, 3), np.uint8)
        img[120:260, 200:330] = 180
        ok, enc = cv2.imencode(".jpg", img)
        assert ok
        client = FacePipelineClient(port=port)
        t0 = time.perf_counter()
        client.extract(enc.tobytes())
        client.close()
        print(f"warmup extract done in {time.perf_counter() - t0:.1f}s")
    print(f"rs_face_detection_tpu serving on :{port}")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop(grace=2.0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
