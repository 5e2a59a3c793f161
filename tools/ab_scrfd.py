"""A/B the SCRFD serving configs on the real TPU (b8 @640).

    python tools/ab_scrfd.py

Run ALONE (measurement discipline: CLAUDE.md; harness in
tools/_ab_common.py).  Rows: the natural-layout path, the dense s4d front
(ops/scrfd_s4d.py), and the s4d front + packed shared head
(ops/scrfd_packed.py — the 64-ch tower at half lanes re-expressed at 4x
channels on the half grid).  Flip SCRFD serving defaults (DetectionServer
auto-select / bench) to whatever wins here.
"""

from _ab_common import build_scrfd, measure, make_batch, require_healthy_relay, SIZE  # noqa: F401
import jax.numpy as jnp
import numpy as np

from bench import _throughput_device

require_healthy_relay()
det, variables = build_scrfd()

# Natural layout needs its own batch maker (not the s4d layout).
_rng = np.random.default_rng()


def make_batch_natural(batch):
    def make(i):
        imgs = _rng.integers(0, 255, (batch, SIZE[1], SIZE[0], 3), dtype=np.uint8)
        return jnp.asarray(imgs), jnp.ones((batch,), jnp.float32)

    return make


import time

fn = det.make_batched_fn()  # natural
t0 = time.time()
img_s, dt = _throughput_device(fn, variables, make_batch_natural(8), 8)
print(f"{'xla':22} {img_s:8.1f} img/s  graph {dt*1e3:6.3f} ms "
      f"(wall {time.time()-t0:.0f}s)", flush=True)

for name, kw in (
    ("s4d", {}),
    ("s4d+packed-heads", dict(packed_heads=True)),
):
    measure(name, det.make_batched_fn(stem="s4d", **kw), variables)
