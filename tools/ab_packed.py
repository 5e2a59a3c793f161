"""A/B the packed SSH-head / FPN level sets on the real TPU (mnet b8 @640).

    python tools/ab_packed.py

Run ALONE (no concurrent host load — see CLAUDE.md measurement
discipline).  Uses bench.py's relay-amortized device-saturated harness:
jitted scan mega-graphs over pre-staged distinct batches, entropy-seeded
inputs (the relay caches identical executions across processes).  Each row
is one make_batched_fn config; flip the packed_heads/packed_fpn defaults
in pipeline/detection.py to whatever wins here.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _throughput_device
from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.models.precision import cast_kernels
from rs_face_detection_tpu.models.retinaface import init_retinaface
from rs_face_detection_tpu.ops.image import s4d_layout_host
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

SIZE = (640, 640)
model, variables = init_retinaface(
    "mobilenet025", SIZE, dtype=jnp.bfloat16, seed=0, stem_s2d=None
)
variables = cast_kernels(variables)
cfg = FaceDetectionConfig(backbone="mobilenet025", image_size=SIZE)
det = RetinaFaceDetection(cfg, model=model, variables=variables)

rng = np.random.default_rng()


def make_batch(batch):
    def make(i):
        imgs = rng.integers(0, 255, (batch, 640, 640, 3), dtype=np.uint8)
        return (
            jnp.asarray(s4d_layout_host(imgs)),
            jnp.ones((batch,), jnp.float32),
        )

    return make


CONFIGS = [
    ("none", dict(packed_heads=False)),
    ("L0", dict(packed_heads=(0,), packed_fpn=False)),
    ("L01", dict(packed_heads=(0, 1), packed_fpn=False)),
    ("L012", dict(packed_heads=(0, 1, 2), packed_fpn=False)),
    ("L012+fpn0", dict(packed_heads=(0, 1, 2), packed_fpn=(0,))),
    ("L012+fpn01", dict(packed_heads=(0, 1, 2), packed_fpn=(0, 1))),
]
for name, kw in CONFIGS:
    fn = det.make_batched_fn(stem="s4d", **kw)
    t0 = time.time()
    img_s, dt = _throughput_device(fn, variables, make_batch(8), 8)
    print(
        f"{name:12} {img_s:8.1f} img/s  graph {dt*1e3:6.3f} ms "
        f"(wall {time.time()-t0:.0f}s)",
        flush=True,
    )
