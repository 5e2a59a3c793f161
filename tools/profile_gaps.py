"""Device-idle gap analysis for the chained detect graph.

Traces a scan-chained run of batched detect (the bench's device-saturated
shape) and reports TPU busy/idle from the merged timeline intervals — the
tool that established there are NO device bubbles between chained batches
(the residual wall-clock gap is the dev harness's ~29 ms relay round trip;
see bench.py and the axon-relay notes in CLAUDE.md).  Companion to
tools/profile_detect.py, which attributes per-op time; this one measures
what per-op sums cannot show.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import collections
import glob
import gzip
import json
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.models.precision import cast_kernels
from rs_face_detection_tpu.models.retinaface import init_retinaface
from rs_face_detection_tpu.ops.image import s4d_layout_host
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

cfg = FaceDetectionConfig(backbone="resnet50", image_size=(640, 640))
model, variables = init_retinaface("resnet50", (640, 640), dtype=jnp.bfloat16, seed=0, stem_s2d=True)
variables = cast_kernels(variables)
det = RetinaFaceDetection(cfg, model=model, variables=variables)
fn = det.make_batched_fn(stem="s4d")

rng = np.random.default_rng(0)
B, N = 8, 6
batches = [
    (jnp.asarray(s4d_layout_host(rng.integers(0, 255, size=(B, 640, 640, 3), dtype=np.uint8))), jnp.ones((B,), jnp.float32))
    for _ in range(N)
]
imgs = jnp.stack([b[0] for b in batches])
ss = jnp.stack([b[1] for b in batches])

aux = fn.fold(variables)

def mega(v, a, xs, ss):
    def body(c, t):
        return c, fn.jitted(v, a, t[0], t[1])
    _, out = jax.lax.scan(body, 0, (xs, ss), unroll=2)
    return out

mega = jax.jit(mega)
jax.block_until_ready(mega(variables, aux, imgs, ss))

trace_dir = "/tmp/gap_trace"
shutil.rmtree(trace_dir, ignore_errors=True)
with jax.profiler.trace(trace_dir):
    jax.block_until_ready(mega(variables, aux, imgs, ss))

paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
with gzip.open(paths[-1], "rt") as f:
    data = json.load(f)

# Identify device-side pids (TPU core tracks), gather X events with ts/dur.
pid_names = {}
for ev in data.get("traceEvents", []):
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        pid_names[ev["pid"]] = ev["args"].get("name", "")

events = []
for ev in data.get("traceEvents", []):
    if ev.get("ph") != "X" or ev.get("dur", 0) <= 0:
        continue
    pname = pid_names.get(ev.get("pid"), "")
    if "TPU" not in pname and "tpu" not in pname:
        continue
    events.append((ev["ts"], ev["dur"], ev.get("name", ""), ev.get("tid")))

print("device pids:", {p: n for p, n in pid_names.items() if "PU" in n.upper()})
if not events:
    print("no device events; pid names:", set(pid_names.values()))
    sys.exit(0)

# Union of busy intervals across every TPU track (events nest/overlap).
evs = sorted(events)
t0, t1 = evs[0][0], max(ts + dur for ts, dur, _, _ in evs)
merged = []
for ts, dur, name, _ in evs:
    if merged and ts <= merged[-1][1] + 1:
        if ts + dur > merged[-1][1]:
            merged[-1][1] = ts + dur
            merged[-1][2] = name
    else:
        merged.append([ts, ts + dur, name])
busy = sum(e - s for s, e, _ in merged)
print(f"window {t1-t0:.0f} us, busy {busy:.0f} us, idle {t1-t0-busy:.0f} us, segments {len(merged)}")

gaps = []
for (s0_, e0_, n0), (s1_, e1_, n1) in zip(merged, merged[1:]):
    if s1_ - e0_ > 5:
        gaps.append((s1_ - e0_, n0, n1))
gaps.sort(reverse=True)
print("top 20 gaps (us, after op -> before op):")
for g, a, b in gaps[:20]:
    print(f"  {g:8.1f}  {a[:40]:42s} -> {b[:40]}")
agg = collections.defaultdict(float)
for g, a, b in gaps:
    agg[(a[:30], b[:30])] += g
print("top aggregated gap pairs:")
for (a, b), g in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
    print(f"  {g:8.1f}  {a:32s} -> {b}")
