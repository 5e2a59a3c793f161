"""Real-data training input pipeline: annotations -> letterboxed TrainBatch.

The reference crate has no training at all; this closes the last gap
between the trainer (parallel/train.py) and real face datasets.  Two
annotation formats are supported:

- The public RetinaFace training labels ("label.txt": `# rel/path.jpg`
  header lines, then one row per face of `x y w h` plus five landmarks as
  (x, y, vis) triplets — landmarks of -1 mean un-annotated; faces without
  landmarks still train the classifier/box heads via TrainBatch.gt_lm_valid).
- WIDER FACE `wider_face_*_bbx_gt.txt` (ops/wider.py's parser; boxes only).

Host-side geometry matches the SERVING path exactly: top-left-anchored
letterbox at min-scale with cv2.INTER_LINEAR (the same bilinear decimation
the fused detect graph sees — tools/make_real_fixture.py documents why
aliasing parity matters), boxes/landmarks scaled by the same det_scale.
Images are raw 0-255 float32 RGB, the trainer's convention
(parallel/train.TrainBatch; preprocessing is identity per the reference's
config — configs.py pixel_means/stds).

Decode rides a thread pool (this is the host half of the pipeline; the
device half is the jitted train step), and batches are padded to a static
max_faces so the train step never recompiles.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..parallel.train import TrainBatch

try:  # pragma: no cover - exercised wherever cv2 exists (everywhere in CI)
    import cv2
except Exception:  # noqa: BLE001
    cv2 = None


@dataclass
class FaceExample:
    """One annotated image: corner boxes, optional 5-point landmarks."""

    rel_path: str
    boxes: np.ndarray  # (N, 4) x1 y1 x2 y2
    lms: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 5, 2), np.float32)
    )
    lm_valid: np.ndarray = field(
        default_factory=lambda: np.zeros((0,), bool)
    )

    #: regions to EXCLUDE from training (neither positive nor negative) —
    #: WIDER's invalid faces: real but tiny/occluded, scored as ignore by
    #: the official protocol, and poison as hard negatives.
    ignore_boxes: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 4), np.float32)
    )

    def __post_init__(self) -> None:
        n = self.boxes.shape[0]
        if self.lms.shape[0] != n or self.lm_valid.shape[0] != n:
            # Mismatched landmark annotations: drop BOTH together — zeroed
            # landmarks with lm_valid=True would train the head toward the
            # image origin.
            self.lms = np.zeros((n, 5, 2), np.float32)
            self.lm_valid = np.zeros((n,), bool)


def parse_retinaface_label(path: str) -> List[FaceExample]:
    """Parse the public RetinaFace `label.txt` training annotations.

    Format per image: a `# rel/path.jpg` line, then one row per face:
    `x y w h  x1 y1 v1  x2 y2 v2  x3 y3 v3  x4 y4 v4  x5 y5 v5  [conf]`
    (landmark coords of -1 mean the face has no landmark annotation).
    Boxes convert to inclusive corners like ops/wider.py.
    """
    examples: List[FaceExample] = []
    rel: Optional[str] = None
    boxes: List[Tuple[float, float, float, float]] = []
    lms: List[np.ndarray] = []
    lmv: List[bool] = []

    def flush() -> None:
        if rel is None:
            return
        examples.append(
            FaceExample(
                rel,
                np.asarray(boxes, np.float32).reshape(-1, 4),
                np.asarray(lms, np.float32).reshape(-1, 5, 2),
                np.asarray(lmv, bool).reshape(-1),
            )
        )

    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                flush()
                rel, boxes, lms, lmv = line[1:].strip(), [], [], []
                continue
            vals = [float(v) for v in line.split()]
            if len(vals) < 4 or rel is None:
                continue
            x, y, w, h = vals[:4]
            if w <= 0 or h <= 0:
                continue
            boxes.append((x, y, x + w - 1.0, y + h - 1.0))
            if len(vals) >= 19:
                tri = np.asarray(vals[4:19], np.float32)
                pts = tri.reshape(5, 3)[:, :2]
                # The public label.txt marks un-annotated landmarks with an
                # ALL -1 row; a legitimately negative first coordinate
                # (edge face partially off the left border) is still
                # annotated, so test the whole row, not vals[4] alone.
                ok = not bool(np.all(tri == -1.0))
            else:
                pts, ok = np.zeros((5, 2), np.float32), False
            lms.append(pts)
            lmv.append(ok)
    flush()
    return examples


def wider_examples(gt_file: str) -> List[FaceExample]:
    """WIDER FACE bbx_gt annotations as training examples (no landmarks).

    Invalid-marked faces become ignore regions: the loss excludes anchors
    overlapping them from the negative pool (detection_loss ignore_boxes) —
    training them as background would teach the classifier that small or
    occluded faces are negatives.
    """
    from ..ops.wider import parse_gt_file

    return [
        FaceExample(im.rel_path, im.boxes, ignore_boxes=im.invalid_boxes)
        for im in parse_gt_file(gt_file)
    ]


class DetectionDataLoader:
    """Streams letterboxed TrainBatches from annotated images on disk.

    Args:
      examples: FaceExample list (parse_retinaface_label / wider_examples).
      image_root: directory rel_paths resolve against.
      image_size: (width, height) static training canvas.
      batch_size: images per TrainBatch.
      max_faces: static ground-truth padding (faces beyond it are dropped,
        largest-first, so crowd images keep their dominant faces).
      seed: shuffle seed; reshuffled every epoch.
      decode_workers: host decode thread pool size.
    """

    def __init__(
        self,
        examples: Sequence[FaceExample],
        image_root: str,
        image_size: Tuple[int, int] = (640, 640),
        batch_size: int = 8,
        max_faces: int = 32,
        seed: int = 0,
        decode_workers: int = 8,
        process_shard: Optional[Tuple[int, int]] = None,
    ) -> None:
        """process_shard=(index, count): multi-host data parallelism — this
        process keeps every count-th example starting at index (same seed on
        every host keeps the epochs aligned; pair with
        parallel.initialize_distributed and per-process device batches)."""
        if cv2 is None:
            raise RuntimeError("DetectionDataLoader needs cv2 for decode")
        if process_shard is not None:
            idx, cnt = process_shard
            if not 0 <= idx < cnt:
                raise ValueError(f"bad process_shard {process_shard}")
            # Equal shard sizes, or hosts would yield different batch counts
            # per epoch and the collective-bearing train step would
            # desynchronize (truncate the ragged tail).
            per = len(examples) // cnt
            examples = list(examples)[idx::cnt][:per]
        if not examples:
            raise ValueError("no examples")
        if len(examples) < batch_size:
            raise ValueError(
                f"{len(examples)} examples < batch_size {batch_size}: an "
                "epoch would yield no batches"
            )
        self.examples = list(examples)
        self.image_root = image_root
        self.image_size = image_size
        self.batch_size = batch_size
        self.max_faces = max_faces
        self._rng = np.random.default_rng(seed)
        self._pool = ThreadPoolExecutor(max_workers=decode_workers)

    def close(self) -> None:
        """Release the decode thread pool."""
        self._pool.shutdown(wait=False)

    def __enter__(self) -> "DetectionDataLoader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- per-image host work -------------------------------------------------

    def _load_one(self, ex: FaceExample) -> Tuple[
        np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray
    ]:
        """(image, boxes, lms, valid, lm_valid, ignore) for one example."""
        from ..parallel.serving import letterbox_host

        w, h = self.image_size
        img = cv2.imread(os.path.join(self.image_root, ex.rel_path))
        if img is None:
            raise FileNotFoundError(
                os.path.join(self.image_root, ex.rel_path)
            )
        canvas, det_scale = letterbox_host(img, w, h)
        # TrainBatch.images are RGB raw-pixel floats; cv2 decodes BGR.
        image = canvas[:, :, ::-1].astype(np.float32)

        m = self.max_faces
        boxes = np.zeros((m, 4), np.float32)
        lms = np.zeros((m, 5, 2), np.float32)
        valid = np.zeros((m,), bool)
        lm_valid = np.zeros((m,), bool)
        dropped = np.zeros((0, 4), np.float32)
        if ex.boxes.shape[0]:
            order = np.argsort(
                -(ex.boxes[:, 2] - ex.boxes[:, 0])
                * (ex.boxes[:, 3] - ex.boxes[:, 1])
            )
            kept = order[:m]
            n = kept.shape[0]
            boxes[:n] = ex.boxes[kept] * det_scale
            lms[:n] = ex.lms[kept] * det_scale
            valid[:n] = True
            lm_valid[:n] = ex.lm_valid[kept]
            # Faces beyond max_faces must NOT vanish: as plain negatives,
            # OHEM would mine exactly those anchors (they look like faces).
            # They join the ignore rows instead.
            dropped = ex.boxes[order[m:]] * det_scale
        # Ignore regions ride as near-zero padding rows; the loss masks
        # degenerate (zero-extent) rows out explicitly (detection_loss).
        ignore = np.zeros((m, 4), np.float32)
        ign_src = np.concatenate(
            [dropped, ex.ignore_boxes.reshape(-1, 4) * det_scale]
        )
        if ign_src.shape[0] > m:
            # keep the largest when truncating (most anchor overlap)
            areas = (ign_src[:, 2] - ign_src[:, 0]) * (
                ign_src[:, 3] - ign_src[:, 1]
            )
            ign_src = ign_src[np.argsort(-areas)[:m]]
        k = ign_src.shape[0]
        if k:
            ignore[:k] = ign_src
        return image, boxes, lms, valid, lm_valid, ignore

    # -- batching --------------------------------------------------------------

    def batches(
        self, epochs: Optional[int] = 1, sharding=None
    ) -> Iterator[TrainBatch]:
        """Yield TrainBatches; epochs=None streams forever (reshuffling)."""
        import jax

        epoch = 0
        while epochs is None or epoch < epochs:
            order = self._rng.permutation(len(self.examples))
            for lo in range(0, len(order) - self.batch_size + 1, self.batch_size):
                idx = order[lo : lo + self.batch_size]
                rows = list(
                    self._pool.map(
                        self._load_one, [self.examples[i] for i in idx]
                    )
                )
                arrs = [np.stack(col) for col in zip(*rows)]
                if sharding is not None:
                    arrs = [jax.device_put(a, sharding) for a in arrs]
                yield TrainBatch(*arrs)
            epoch += 1
