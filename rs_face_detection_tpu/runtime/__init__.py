"""Serving runtime: native host loaders, the gRPC facade, request batching,
and AOT compiled-model artifacts.

- `native`: C++ NMS + threaded JPEG decode/letterbox loader (ctypes).
- `server` (optional, needs grpcio): the proto-free gRPC facade mirroring
  the reference's Triton client verb families.
- `batcher.DynamicBatcher`: Triton-scheduler-style dynamic request batching.
- `aot`: jax.export serving artifacts (compiled-model repository analog).
- `shm`: POSIX shared-memory regions for zero-copy localhost ModelInfer
  (Triton's system shared-memory verb family).
- `repository`: Triton-style on-disk model repository (config.pbtxt +
  versioned .npz weights) -> ModelRegistry builders.
- `wire` (optional, needs grpcio): the genuine Triton protobuf contract
  (inference.GRPCInferenceService) on the same port as the facade.
- `http`: the KServe-v2 HTTP/REST endpoint (Triton's second client
  surface) over the same wire servicer — `serve(http_port=...)`.
"""

from . import aot, batcher, native, repository, shm
from .batcher import DynamicBatcher
from .repository import attach_repository_builders, write_repository_entry
from .shm import SharedMemoryRegistry, SharedRegion

__all__ = [
    "native",
    "DynamicBatcher",
    "aot",
    "batcher",
    "repository",
    "shm",
    "SharedMemoryRegistry",
    "SharedRegion",
    "attach_repository_builders",
    "write_repository_entry",
]
