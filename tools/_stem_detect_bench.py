import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.models.retinaface import init_retinaface
from rs_face_detection_tpu.ops.image import s2d_layout_host, s4d_layout_host
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

modes = sys.argv[1:] or ["xla", "s4d"]
print("backend:", jax.default_backend(), "modes:", modes)
cfg = FaceDetectionConfig(backbone="resnet50", image_size=(640, 640))
model, variables = init_retinaface("resnet50", (640, 640), dtype=jnp.bfloat16, seed=0, stem_s2d=True)
det = RetinaFaceDetection(cfg, model=model, variables=variables, nms_mode="fixpoint")

rng = np.random.default_rng(0)
B = 8
N = 12
raw = [rng.integers(0, 255, size=(B, 640, 640, 3), dtype=np.uint8) for _ in range(3 * N)]
by_mode = {}
for m in modes:
    layout = s4d_layout_host if m == "s4d" else s2d_layout_host
    by_mode[m] = [(jnp.asarray(layout(r)), jnp.ones((B,), jnp.float32)) for r in raw]

fns = {m: det.make_batched_fn(pre_s2d=(m != "s4d"), stem=m) for m in modes}

outs = {m: fns[m](variables, *by_mode[m][0]) for m in modes}
base = modes[0]
for m in modes[1:]:
    c0, c1 = np.asarray(outs[base].count), np.asarray(outs[m].count)
    print(f"counts {base} vs {m}: equal={bool((c0 == c1).all())} {c0.tolist()} {c1.tolist()}")


def device_saturated(fn, batches):
    def stack(lo, hi):
        imgs, scales = zip(*batches[lo:hi])
        return jnp.stack(imgs), jnp.stack(scales)

    mega = jax.jit(lambda v, xs, ss: jax.lax.map(lambda t: fn(v, t[0], t[1]), (xs, ss)))
    warm = stack(2 * N, 3 * N)
    jax.block_until_ready(mega(variables, *warm))
    reps = [stack(0, N), stack(N, 2 * N)]
    jax.block_until_ready(reps)
    t0 = time.perf_counter()
    outs = [mega(variables, xs, ss) for xs, ss in reps]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (N * len(reps))
    return B / dt, dt


for m in modes:
    r, dt = device_saturated(fns[m], by_mode[m])
    print(f"{m:7s} stem: {r:8.1f} img/s  ({dt*1000:.3f} ms/batch)")
