import sys

sys.path.insert(0, "/root/repo")
import collections
import glob
import gzip
import json
import re
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.models.retinaface import init_retinaface
from rs_face_detection_tpu.ops.image import s2d_layout_host
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

stem = sys.argv[1] if len(sys.argv) > 1 else "pallas"
cfg = FaceDetectionConfig(backbone="resnet50", image_size=(640, 640))
model, variables = init_retinaface("resnet50", (640, 640), dtype=jnp.bfloat16, seed=0, stem_s2d=True)
det = RetinaFaceDetection(cfg, model=model, variables=variables)
fn = det.make_batched_fn(pre_s2d=True, stem=stem)

rng = np.random.default_rng(0)
B = 8
batches = [
    (jnp.asarray(s2d_layout_host(rng.integers(0, 255, size=(B, 640, 640, 3), dtype=np.uint8))), jnp.ones((B,), jnp.float32))
    for _ in range(6)
]
jax.block_until_ready(fn(variables, *batches[0]))
jax.block_until_ready(batches)

trace_dir = "/tmp/stem_trace_" + stem
shutil.rmtree(trace_dir, ignore_errors=True)
with jax.profiler.trace(trace_dir):
    outs = [fn(variables, *b) for b in batches[1:]]
    jax.block_until_ready(outs)

# parse trace proto via the xplane -> trace-events json tool path
paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
ev_by_name = collections.defaultdict(float)
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid_name = ev.get("pid")
        name = ev.get("name", "")
        dur = ev.get("dur", 0)
        args = ev.get("args") or {}
        ev_by_name[(name, args.get("long_name", "")[:120])] += dur

rows = sorted(ev_by_name.items(), key=lambda kv: -kv[1])[:45]
for (name, long_name), dur in rows:
    print(f"{dur/1000/5:9.3f} ms  {name[:40]:42s} {long_name[:90]}")
