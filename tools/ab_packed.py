"""A/B the packed SSH-head / FPN level sets on the real TPU (mnet b8 @640).

    python tools/ab_packed.py

Run ALONE (no concurrent host load — see CLAUDE.md measurement
discipline; harness details in tools/_ab_common.py).  Each row is one
make_batched_fn config; flip the packed_heads/packed_fpn defaults in
pipeline/detection.py to whatever wins here.  bench.py runs the 4-point
subset of this grid automatically and self-tunes its headline
(MNET_PACKED_CANDIDATES).
"""

from _ab_common import SIZE, build_mnet, measure, require_healthy_relay
from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

require_healthy_relay()
model, variables = build_mnet()
cfg = FaceDetectionConfig(backbone="mobilenet025", image_size=SIZE)
det = RetinaFaceDetection(cfg, model=model, variables=variables)

# The bench's self-tuning subset is authoritative (its winner becomes the
# serving default); this grid extends it with the partial level sets so the
# two candidate spaces cannot drift.
from bench import MNET_PACKED_CANDIDATES  # noqa: E402

CONFIGS = [
    *MNET_PACKED_CANDIDATES,
    ("L0", dict(packed_heads=(0,), packed_fpn=False)),
    ("L01", dict(packed_heads=(0, 1), packed_fpn=False)),
]
for name, kw in CONFIGS:
    measure(name, det.make_batched_fn(stem="s4d", **kw), variables)
