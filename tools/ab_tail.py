"""A/B the decode/NMS tail knobs on the real TPU (mnet b8 @640).

    python tools/ab_tail.py

Run ALONE (measurement discipline: CLAUDE.md; harness details in
tools/_ab_common.py).  The tail — score concat, confidence mask, top-k,
gather-decode, NMS, scatter-compact — was ~0.9 ms of the 3.3 ms mnet
batch graph before the packed heads landed; this grid measures the
exact-default configuration against the opt-in variants:

  - candidate_selection: exact lax.top_k vs approx_max_k (recall 0.95;
    changes results only when >recall-tail candidates tie near the cutoff)
  - max_candidates: 256 (tuned default) vs 192/128 (NMS cost is quadratic,
    top-k cost ~linear in k; smaller caps only affect scenes with more
    passing candidates than the cap)
  - nms_mode: fixpoint (throughput default) vs greedy (sequential scan)

Timing is content-independent (static shapes), so uniform-random frames
measure real scenes' cost.  Each row is the full fused batch graph.  Flip
FaceDetectionConfig defaults only for knobs that keep exact semantics;
approx/cap-reduction wins belong in the config docstring as opt-ins.
"""

from _ab_common import SIZE, build_mnet, measure
from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

model, variables = build_mnet()

CONFIGS = [
    ("exact-256-fixpoint", dict(), "fixpoint"),  # shipping default
    ("exact-256-greedy", dict(), "greedy"),
    ("exact-192-fixpoint", dict(max_candidates=192), "fixpoint"),
    ("exact-128-fixpoint", dict(max_candidates=128), "fixpoint"),
    ("approx-256-fixpoint", dict(candidate_selection="approx"), "fixpoint"),
    (
        "approx-128-fixpoint",
        dict(candidate_selection="approx", max_candidates=128),
        "fixpoint",
    ),
]
for name, cfg_kw, nms_mode in CONFIGS:
    cfg = FaceDetectionConfig(
        backbone="mobilenet025", image_size=SIZE, **cfg_kw
    )
    det = RetinaFaceDetection(
        cfg, model=model, variables=variables, nms_mode=nms_mode
    )
    measure(name, det.make_batched_fn(stem="s4d"), variables)
