"""Shared setup for the hardware A/B harnesses (ab_packed.py, ab_tail.py).

One place for the measurement discipline both grids share (CLAUDE.md):
bench.py's relay-amortized device-saturated harness (jitted scan
mega-graphs over pre-staged distinct batches) and entropy-seeded inputs
(the relay caches identical executions ACROSS processes, so a fixed seed
replays from cache and reports impossible numbers).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from bench import MIN_GRAPH_MS_PER_BATCH, _relay_sanity, _throughput_device, _with_timeout
from rs_face_detection_tpu.models.precision import cast_kernels
from rs_face_detection_tpu.models.retinaface import init_retinaface
from rs_face_detection_tpu.ops.image import s4d_layout_host

SIZE = (640, 640)

_rng = np.random.default_rng()  # entropy-seeded, never fixed


def require_healthy_relay():
    """Abort the grid unless the relay is EXECUTING (not replaying).

    Degraded-replay mode (CLAUDE.md 2026-08-19) returns instant stale
    responses for cached executables — an A/B run in that state prints
    physically impossible rates for every row.  Call this before the first
    measurement; it costs one fresh remote compile (~30-60 s healthy,
    timeout-bounded when wedged).
    """
    status, payload = _with_timeout(_relay_sanity, 600, "relay sanity")
    detail = payload
    if status != "ok" or payload is not None:
        sys.exit(f"relay sanity failed — aborting grid: {detail}")


def build_mnet():
    """The production mnet serving weights: bf16 compute, pre-cast kernels."""
    model, variables = init_retinaface(
        "mobilenet025", SIZE, dtype=jnp.bfloat16, seed=0, stem_s2d=None
    )
    return model, cast_kernels(variables)


def make_batch(batch):
    """Distinct s4d-layout uint8 batches (the host contract of stem='s4d')."""
    def make(i):
        imgs = _rng.integers(
            0, 255, (batch, SIZE[1], SIZE[0], 3), dtype=np.uint8
        )
        return (
            jnp.asarray(s4d_layout_host(imgs)),
            jnp.ones((batch,), jnp.float32),
        )

    return make


def measure(name, fn, variables, batch=8):
    """One grid row: device-saturated throughput of the full fused graph."""
    t0 = time.time()
    img_s, dt = _throughput_device(fn, variables, make_batch(batch), batch)
    flag = (
        "  !! IMPLAUSIBLE (relay replaying?)"
        if dt * 1e3 < MIN_GRAPH_MS_PER_BATCH
        else ""
    )
    print(
        f"{name:22} {img_s:8.1f} img/s  graph {dt*1e3:6.3f} ms "
        f"(wall {time.time()-t0:.0f}s){flag}",
        flush=True,
    )
    return img_s


def build_scrfd():
    """The bench's SCRFD serving weights: bf16 compute, pre-cast kernels."""
    from rs_face_detection_tpu.models.scrfd import init_scrfd
    from rs_face_detection_tpu.pipeline.ekyc_pipeline import SCRFDDetection

    model, variables = init_scrfd(SIZE, dtype=jnp.bfloat16, seed=0)
    variables = cast_kernels(variables)
    det = SCRFDDetection(
        model=model, variables=variables, image_size=SIZE, registry=None
    )
    return det, variables
