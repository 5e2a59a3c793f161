"""Data-parallel batch serving with host-decode / device-compute overlap.

Replaces the reference's per-request Triton dispatch (one gRPC ModelInfer per
image, face_detection.rs:254-284) with sharded in-process serving:

  - a jit detect over a ("data", "model") mesh with the batch sharded on
    "data" — each chip runs the full model on its shard (BASELINE.json
    config 5);
  - a host-side pipeline that decodes + letterboxes incoming JPEG bytes on a
    thread pool and double-buffers device transfers so the next batch's
    host work overlaps the current batch's device compute (config 4);
    JAX's async dispatch provides the device side of the overlap for free.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.image import letterbox_geometry
from ..pipeline.detection import (
    PaddedDetections,
    RetinaFaceDetection,
    build_batched_fn,
    detector_image_size,
    resolve_fold,
)
from ..utils.image_io import decode_image_bytes

try:  # pragma: no cover - environment probe
    import cv2  # type: ignore
except Exception:  # pragma: no cover
    cv2 = None


def letterbox_host(
    img: np.ndarray, dst_w: int, dst_h: int
) -> Tuple[np.ndarray, float]:
    """Host-side letterbox (cv2 when present) for the serving path."""
    src_h, src_w = img.shape[:2]
    new_w, new_h, det_scale = letterbox_geometry(src_h, src_w, dst_w, dst_h)
    if cv2 is not None:
        resized = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    else:
        from PIL import Image

        # Explicit BILINEAR: PIL's default resample is BICUBIC, which would
        # break parity with the cv2 INTER_LINEAR path and the in-graph
        # letterbox (still approximate — PIL antialiases on downscale).
        resized = np.asarray(
            Image.fromarray(img[:, :, ::-1]).resize(
                (new_w, new_h), resample=Image.BILINEAR
            )
        )[:, :, ::-1]
    out = np.zeros((dst_h, dst_w, 3), np.uint8)
    out[:new_h, :new_w] = resized
    return out, det_scale


class DetectionServer:
    """Batched, mesh-sharded detection serving.

    Serves any detector with the batched-fn duck type — `model`,
    `variables`, `make_batched_fn`, `record_traffic`, and an image size
    (`cfg.image_size` or an `image_size` attribute): RetinaFaceDetection
    (the default) and the eKYC pipeline's SCRFDDetection both qualify.
    """

    def __init__(
        self,
        detector: Optional[RetinaFaceDetection] = None,
        mesh: Optional[Mesh] = None,
        batch_size: int = 8,
        decode_workers: int = 8,
        use_native_loader: bool = True,
    ) -> None:
        self.detector = detector or RetinaFaceDetection()
        self.cfg = getattr(self.detector, "cfg", None)
        self.image_size: Tuple[int, int] = detector_image_size(self.detector)
        self.batch_size = batch_size
        self.mesh = mesh
        self._pool = ThreadPoolExecutor(max_workers=decode_workers)
        self._decode_workers = decode_workers
        self._native = None
        if use_native_loader:
            from ..runtime import native as _native

            if _native.available():
                self._native = _native

        # Host layout: probe the detector's own make_batched_fn validation
        # (s4d -> s2d -> natural) instead of re-deriving eligibility here —
        # an inline copy of those rules drifted once already.  Each
        # detector rejects layouts it can't serve with ValueError (quant
        # models, mmdet-layout SCRFD, odd sizes, missing stem options);
        # the first accepted build wins.  See detection.make_batched_fn
        # for what each layout means on the host side.
        width, height = self.image_size
        base_fn = None
        self._layout = "none"
        if width % 4 == 0 and height % 4 == 0:
            try:
                base_fn = build_batched_fn(self.detector, stem="s4d")
                self._layout = "s4d"
            except ValueError:
                base_fn = None
        if base_fn is None:
            try:
                base_fn = build_batched_fn(self.detector, pre_s2d=True)
                self._layout = "s2d"
            except ValueError:
                base_fn = build_batched_fn(self.detector)
        if mesh is not None:
            if batch_size % mesh.shape["data"]:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by data axis "
                    f"{mesh.shape['data']}"
                )
            data = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            # Fold the dense-front constants ONCE (see make_batched_fn's
            # aux protocol) and replicate them; folding inside the sharded
            # graph would re-run it on every batch.  Plain batched fns get
            # the trivial empty fold (pipeline.detection.resolve_fold).
            fold, inner = resolve_fold(base_fn)
            self._fold = fold
            self._repl_sharding = repl
            self._aux = jax.device_put(fold(self.detector.variables), repl)
            # Place the weights under the replicated sharding ONCE too:
            # registry variables are committed to the default device, and
            # passing them raw would make every dispatch re-broadcast the
            # full tree (jit reshards mismatched inputs per call — ~100 MB
            # for R50, tunnel-dominated in this env); same one-time
            # placement tp.py does for the sharded ViT.
            self._vars_repl = jax.device_put(self.detector.variables, repl)
            self._aux_src = self.detector.variables
            self._fn = jax.jit(
                lambda variables, aux, imgs, scales: inner(
                    variables, aux, imgs, scales
                ),
                in_shardings=(repl, repl, data, data),
            )
            self._in_sharding = data
        else:
            self._fn = base_fn
            self._aux = None
            self._in_sharding = None

    # -- host preprocessing ------------------------------------------------

    def _prepare(self, payload) -> Tuple[np.ndarray, float]:
        img = (
            decode_image_bytes(payload)
            if isinstance(payload, (bytes, bytearray))
            else payload
        )
        width, height = self.image_size
        return letterbox_host(img, width, height)

    def _prepare_batch(self, payloads: Sequence) -> Tuple[np.ndarray, np.ndarray, int]:
        n = len(payloads)
        width, height = self.image_size

        # Fast path: the native C++ loader (threaded libjpeg decode+letterbox)
        # handles all-bytes JPEG batches in one call.
        if self._native is not None and n and all(
            isinstance(p, (bytes, bytearray)) for p in payloads
        ):
            imgs_n, scales_n, ok = self._native.decode_letterbox_batch(
                payloads, width, height, num_threads=self._decode_workers
            )
            if ok.all():  # non-JPEG bytes (e.g. PNG) fall through to cv2/PIL
                imgs = np.zeros((self.batch_size, height, width, 3), np.uint8)
                scales = np.ones((self.batch_size,), np.float32)
                imgs[:n] = imgs_n
                scales[:n] = scales_n
                return self._maybe_s2d(imgs), scales, n

        results = list(self._pool.map(self._prepare, payloads))
        imgs = np.zeros((self.batch_size, height, width, 3), np.uint8)
        scales = np.ones((self.batch_size,), np.float32)
        for i, (img, scale) in enumerate(results):
            imgs[i] = img
            scales[i] = scale
        return self._maybe_s2d(imgs), scales, n

    def _maybe_s2d(self, imgs: np.ndarray) -> np.ndarray:
        if self._layout == "none":
            return imgs
        if self._layout == "s4d":
            if self._native is not None:
                return self._native.s4d_batch(
                    imgs, num_threads=self._decode_workers
                )
            from ..ops.image import s4d_layout_host

            return s4d_layout_host(imgs)
        if self._native is not None:
            return self._native.s2d_batch(imgs, num_threads=self._decode_workers)
        from ..ops.image import s2d_layout_host

        return s2d_layout_host(imgs)

    # -- lifecycle ---------------------------------------------------------

    def close(self) -> None:
        """Release the decode thread pool (idempotent).

        Same contract as DetectionDataLoader.close: the server stays
        constructed but can no longer serve (submitting to a shut-down
        pool raises).  Long-lived services never need this; tests and
        tools that build many servers do."""
        self._pool.shutdown(wait=False)

    def __enter__(self) -> "DetectionServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- serving -----------------------------------------------------------

    def detect_batch(self, payloads: Sequence) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Detect faces in up to batch_size images (bytes or BGR arrays)."""
        if len(payloads) > self.batch_size:
            raise ValueError(f"batch larger than configured size {self.batch_size}")
        if not payloads:  # don't burn a full device batch (or stats) on zero
            return []
        start = time.perf_counter()
        imgs, scales, n = self._prepare_batch(payloads)
        out = self._run(imgs, scales)
        results = self._unpack(out, n)
        # Statistics parity with the single-image path: every inference verb
        # feeds the registry counters (models/registry.ModelStats).
        self.detector.record_traffic(n, time.perf_counter() - start)
        return results

    def detect_stream(
        self, payload_iter: Iterable, prefetch: int = 2
    ) -> Iterator[List[Tuple[np.ndarray, np.ndarray]]]:
        """Pipelined streaming: host prep of batch k+1 overlaps device compute
        of batch k (double buffering via a bounded queue + worker thread)."""
        # maxsize=0 would mean UNBOUNDED in queue.Queue — clamp so the
        # double-buffering bound survives a prefetch=0 caller.
        batches: "queue.Queue" = queue.Queue(maxsize=max(1, int(prefetch)))
        sentinel = object()
        abandoned = threading.Event()

        def put(item) -> bool:
            # Bounded put that gives up when the consumer is gone (a gRPC
            # client cancelling DetectStream closes this generator mid-queue;
            # a plain blocking put would leak the producer thread forever).
            while not abandoned.is_set():
                try:
                    batches.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # The sentinel/error MUST reach the queue even when a payload
            # fails to decode, or the consumer would block forever.
            try:
                chunk: List = []
                for payload in payload_iter:
                    if abandoned.is_set():
                        return
                    chunk.append(payload)
                    if len(chunk) == self.batch_size:
                        if not put(self._stage(self._prepare_batch(chunk))):
                            return
                        chunk = []
                if chunk:
                    put(self._stage(self._prepare_batch(chunk)))
            except BaseException as e:  # re-raised on the consumer side
                put(e)
            finally:
                put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        def emit(out, n_prev, t_disp):
            results = self._unpack(out, n_prev)
            # Statistics parity with detect_batch: streamed batches feed
            # the registry counters too (DetectStream / eval / video would
            # otherwise be invisible to ModelStatistics).  Duration is
            # dispatch->fetch wall for THIS batch; overlapped batches each
            # record their own.
            self.detector.record_traffic(
                n_prev, time.perf_counter() - t_disp
            )
            return results

        try:
            pending: List[Tuple[PaddedDetections, int, float]] = []
            while True:
                item = batches.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    # Drain pending device work, then surface the producer error.
                    for out, n_prev, t_disp in pending:
                        yield emit(out, n_prev, t_disp)
                    thread.join()
                    raise item
                imgs, scales, n = item
                # Async dispatch: _run returns device futures immediately, so
                # the producer thread prepares the next batch while this one
                # computes.
                pending.append((self._run(imgs, scales), n, time.perf_counter()))
                if len(pending) > 1:
                    out, n_prev, t_disp = pending.pop(0)
                    yield emit(out, n_prev, t_disp)
            for out, n_prev, t_disp in pending:
                yield emit(out, n_prev, t_disp)
            thread.join()
        finally:
            # Runs on normal exhaustion AND on generator close (client
            # cancel/abandon): release the producer.
            abandoned.set()

    def _stage(self, prep):
        """Start the host->device transfer on the producer thread, so
        uploads overlap the consumer's device compute (the missing half of
        the double buffer: through a network-attached device the transfer
        is the dominant per-batch cost).  device_put is async and
        idempotent, so _run's own device_put/asarray become no-ops on the
        staged arrays, and the synchronous detect_batch path (which calls
        _run with raw numpy) is unaffected."""
        imgs, scales, n = prep
        if self._in_sharding is not None:
            return (
                jax.device_put(imgs, self._in_sharding),
                jax.device_put(scales, self._in_sharding),
                n,
            )
        return jax.device_put(imgs), jax.device_put(scales), n

    def _run(self, imgs: np.ndarray, scales: np.ndarray) -> PaddedDetections:
        if self._in_sharding is not None:
            # One-hop host->shards transfer: device_put on the numpy arrays
            # shards directly (jnp.asarray first would commit the full
            # unsharded batch to device 0, then reshard device-to-device).
            imgs_d = jax.device_put(imgs, self._in_sharding)
            scales_d = jax.device_put(scales, self._in_sharding)
            if self.detector.variables is not self._aux_src:
                # Weights were swapped (e.g. a checkpoint reload): re-fold
                # the dense-front constants, like the unsharded path's
                # identity-keyed fold cache does — and re-place the new
                # weights under the replicated sharding.
                self._aux = jax.device_put(
                    self._fold(self.detector.variables), self._repl_sharding
                )
                self._vars_repl = jax.device_put(
                    self.detector.variables, self._repl_sharding
                )
                self._aux_src = self.detector.variables
            return self._fn(self._vars_repl, self._aux, imgs_d, scales_d)
        return self._fn(
            self.detector.variables, jnp.asarray(imgs), jnp.asarray(scales)
        )

    def _unpack(
        self, out: PaddedDetections, n: int
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        # One device_get for all three leaves: the async copies overlap, so
        # a relay/network-attached device pays ~one round trip instead of
        # three sequential np.asarray fetches per batch.
        det, kps, counts = jax.device_get((out.det, out.kps, out.count))
        return [
            (det[i, : counts[i]], kps[i, : counts[i]]) for i in range(n)
        ]
