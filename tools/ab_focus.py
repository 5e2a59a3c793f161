"""Focused 2-point packed A/B for short TPU windows (mnet b8 @640).

    python tools/ab_focus.py

Measures only the two configs that decide the serving default: the plain
s4d path ("none") and the bench's presumed-best packed set — taken from
bench.MNET_PACKED_CANDIDATES[0], the same winner-first list the end-of-
round A/B uses, so this script cannot measure a stale pair if the default
changes (advisor r3).  Use when the full tools/ab_packed.py grid
(~6 graphs x ~7 min compile each through the relay) does not fit the
session; same harness, same discipline (run ALONE — see CLAUDE.md).
"""

from _ab_common import SIZE, build_mnet, measure, require_healthy_relay
from bench import MNET_PACKED_CANDIDATES
from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

require_healthy_relay()
model, variables = build_mnet()
cfg = FaceDetectionConfig(backbone="mobilenet025", image_size=SIZE)
det = RetinaFaceDetection(cfg, model=model, variables=variables)

CONFIGS = [
    ("none", dict(packed_heads=False)),
    MNET_PACKED_CANDIDATES[0],
]
for name, kw in CONFIGS:
    measure(name, det.make_batched_fn(stem="s4d", **kw), variables)
