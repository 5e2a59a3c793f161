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
approx wins belong in the config docstring as opt-ins.

Measured 2026-08-19 (v5e, packed-default front, relay-amortized):

    exact-256-fixpoint       2662.0 img/s  graph  3.005 ms   (old default)
    exact-256-greedy         2484.2 img/s  graph  3.220 ms
    exact-256-pallas         2631.4 img/s  graph  3.040 ms
    exact-192-fixpoint       2711.5 img/s  graph  2.950 ms
    exact-128-fixpoint       2816.6 img/s  graph  2.840 ms   (NEW default)
    exact-128-pallas         2741.1 img/s  graph  2.919 ms
    approx-256-fixpoint      2776.2 img/s  graph  2.882 ms
    approx-128-fixpoint      2892.1 img/s  graph  2.766 ms   (opt-in)

Outcome: max_candidates default 256 -> 128 (configs.py; eval_wider pins
256 for dense scenes); fixpoint stays the NMS default (beats greedy and
the Pallas kernel at every cap); approx top-k (+2.7% more) stays opt-in
because it is not exact.
"""

from _ab_common import SIZE, build_mnet, measure, require_healthy_relay
from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

require_healthy_relay()
model, variables = build_mnet()

# Every row pins max_candidates EXPLICITLY: the shipping default flipped
# 256 -> 128 after this grid's 2026-08-19 run, and a row that relied on
# the default would silently re-measure the 128 graph under a 256 label.
CONFIGS = [
    ("exact-256-fixpoint", dict(max_candidates=256), "fixpoint"),
    ("exact-256-greedy", dict(max_candidates=256), "greedy"),
    ("exact-256-pallas", dict(max_candidates=256), "pallas"),
    ("exact-192-fixpoint", dict(max_candidates=192), "fixpoint"),
    ("exact-128-fixpoint", dict(max_candidates=128), "fixpoint"),  # default
    ("exact-128-pallas", dict(max_candidates=128), "pallas"),
    (
        "approx-256-fixpoint",
        dict(candidate_selection="approx", max_candidates=256),
        "fixpoint",
    ),
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
