import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.models.precision import cast_kernels
from rs_face_detection_tpu.models.retinaface import init_retinaface
from rs_face_detection_tpu.ops.image import s4d_layout_host
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

print("backend:", jax.default_backend())
cfg = FaceDetectionConfig(backbone="resnet50", image_size=(640, 640))
model, variables = init_retinaface("resnet50", (640, 640), dtype=jnp.bfloat16, seed=0, stem_s2d=True)
variables = cast_kernels(variables)
det = RetinaFaceDetection(cfg, model=model, variables=variables)
fn = det.make_batched_fn(stem="s4d")

rng = np.random.default_rng(0)
B, N = 8, 12
batches = [
    (jnp.asarray(s4d_layout_host(rng.integers(0, 255, size=(B, 640, 640, 3), dtype=np.uint8))), jnp.ones((B,), jnp.float32))
    for _ in range(3 * N)
]


def stack(lo, hi):
    imgs, scales = zip(*batches[lo:hi])
    return jnp.stack(imgs), jnp.stack(scales)


def measure(mega, label):
    warm = stack(2 * N, 3 * N)
    jax.block_until_ready(mega(variables, *warm))
    reps = [stack(0, N), stack(N, 2 * N)]
    jax.block_until_ready(reps)
    t0 = time.perf_counter()
    outs = [mega(variables, xs, ss) for xs, ss in reps]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (N * len(reps))
    print(f"{label:18s}: {B/dt:8.1f} img/s ({dt*1000:.3f} ms/batch)")


mega_map = jax.jit(lambda v, xs, ss: jax.lax.map(lambda t: fn(v, t[0], t[1]), (xs, ss)))
measure(mega_map, "lax.map")

for unroll in (2, 4):
    def mk(unroll):
        def mega(v, xs, ss):
            def body(carry, t):
                return carry, fn(v, t[0], t[1])
            _, out = jax.lax.scan(body, 0, (xs, ss), unroll=unroll)
            return out
        return jax.jit(mega)
    measure(mk(unroll), f"scan unroll={unroll}")
