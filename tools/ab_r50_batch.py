"""Localize the R50 batch-scaling inversion with exec-only stage cuts.

VERDICT r4 #7: R50 throughput REGRESSES with batch (b8 1,064 -> b16 975 ->
b32 912 img/s on the 2026-08-19 session; 1,075/981/916 on 2026-08-20) and
the r1 stage-0-HBM hypothesis was never profiled to closure.  The round-5
attempt to capture a b16 jax.profiler trace is what WEDGED the relay
(CLAUDE.md relay timeline), so this tool diagnoses by TIMING ONLY — no
trace capture, nothing but the same jitted-exec path bench itself uses.

Method: build truncated serving graphs that run the R50 detect front up to
a cut point — stem (ops/stem_s4d.py), then after backbone stage 0..3
(models/resnet.py s{i}b{j} Bottlenecks, eval BN, bf16 pre-cast kernels,
identical module names so the production variables resolve) — plus the
FULL fused detect graph (pipeline/detection.py make_batched_fn stem='s4d').
Each cut is measured with bench's device-saturated harness
(_throughput_device: pre-staged distinct inputs, scan mega-graphs) at each
requested batch size.  Consecutive-cut deltas attribute per-image time to
each stage; a stage whose per-image ms GROWS from b8 to b16 is the
inversion's home.

Caveat (why deltas, not absolutes): a truncated graph must materialize its
final activation to HBM as a scan output, and XLA may fuse differently
than inside the full graph — absolute cut times run a little hot vs the
full graph's profile attribution (R50 b8 split in CLAUDE.md).  The
b16/b8 *scaling ratio per cut* is the signal; per-image ratio 1.0 means
linear scaling, > 1.0 means the segment got slower per image.

Usage (TPU, healthy relay):
    python tools/ab_r50_batch.py                  # batches 8,16; all cuts
    python tools/ab_r50_batch.py --batches 8,16,32
CPU smoke (correctness of the harness, not perf):
    python tools/ab_r50_batch.py --cpu --image-size 128 --batches 1,2 \
        --n-batches 2

CLOSED (2026-08-21): the jax.profiler trace capture succeeded on the
healthy window before this grid could run, and answers the question
directly.  HLO-attributed device-time component split, R50 @640
(profile_detect, b8 2026-08-20 vs b16 2026-08-21; ideal scale 2.00):

    component      b8 ms   b16 ms   scale
    body/s0        1.375    3.418    2.49   <- HBM-bound stage-0
    decode/nms     1.101    2.974    2.70   <- vmapped top-k/decode tail
    body/s1        1.043    2.152    2.06
    body/s2        1.017    2.136    2.10
    fpn            0.592    1.380    2.33
    body/s3        0.525    1.038    1.98
    ssh0           0.499    0.985    1.97

The b8->b16 throughput inversion (1,072 -> 942 img/s) is concentrated in
(a) stage-0, whose 100-200 MB bf16 activations move at reduced HBM
bandwidth as the working set grows (the round-1 b32 observation, now
profile-confirmed at b16), and (b) the decode/NMS tail, whose batched
top-k/sort lowers disproportionately worse at larger batch.  Both are
per-image-independent, so serving R50 at b8 (DEPLOY.md) sidesteps them
entirely — a b16 request IS two b8 graphs back-to-back at b8's rate.
No code change beats that; experiment closed.

METHOD LIMITATION (hardware run 2026-08-21 03:0xZ): this grid at the
memory-safe --n-batches 4 measured SUB-linear per-image ratios at every
cut (full 0.98, stem 0.79) — it cannot resolve the inversion, because
the relay's fixed per-mega-call cost amortizes to ~1-2 ms/batch at 4
scan iterations (vs ~0.6 at bench's 12) and shrinks per-image twice as
fast at b16 as at b8, swamping the ~10% effect under study (full-graph
b8 8.60 ms here vs bench's 7.46 with the same code).  Stage DELTAS
cancel only the per-batch constant, not the per-image dilution, so they
are noisy too (s3-s2 delta 0.012 ms).  For this question, trust the
trace's pure device events; exec-only cuts would need n_batches >= 12,
which the stage-0 cut's stacked activations (2.5 GB/mega at b16 x 4
in-flight megas) cannot afford on one v5e.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

STAGE_SIZES = (3, 4, 6, 3)
WIDTHS = (64, 128, 256, 512)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="8,16")
    parser.add_argument("--image-size", type=int, default=640)
    parser.add_argument(
        "--n-batches", type=int, default=4,
        help="scan-chained batches per mega-call (4 keeps the stage-0 "
        "cut's stacked activations ~3 GB at b16; bench uses 12 on the "
        "small-output full graph)",
    )
    parser.add_argument("--repeats", type=int, default=1)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument(
        "--skip-sanity", action="store_true",
        help="skip the relay execute-vs-replay bracket (CPU smoke)",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn

    from bench import MIN_GRAPH_MS_PER_BATCH, _throughput_device
    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.models.precision import cast_kernels
    from rs_face_detection_tpu.models.resnet import Bottleneck
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.ops.image import s4d_layout_host
    from rs_face_detection_tpu.ops.stem_s4d import fold_s4d_params, stem_s4d
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    if not args.cpu and not args.skip_sanity:
        from _ab_common import require_healthy_relay

        require_healthy_relay()

    size = (args.image_size, args.image_size)
    batches = [int(b) for b in args.batches.split(",")]
    cfg = FaceDetectionConfig(backbone="resnet50", image_size=size)
    model, variables = init_retinaface(
        "resnet50", size, dtype=jnp.bfloat16, seed=0, stem_s2d=True
    )
    variables = cast_kernels(variables)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    full_fn = det.make_batched_fn(stem="s4d")

    # Same fold the serving path runs once per weights object
    # (pipeline/detection.py fold_aux, R50 branch).
    stem_p = variables["params"]["body"]["stem"]
    stem_s = variables["batch_stats"]["body"]["stem"]["BatchNorm_0"]
    stem_aux = fold_s4d_params(
        stem_p["Conv_0"]["kernel"].astype(jnp.float32),
        stem_p["BatchNorm_0"]["scale"],
        stem_p["BatchNorm_0"]["bias"],
        stem_s["mean"],
        stem_s["var"],
        cfg.pixel_means,
        cfg.pixel_stds,
        cfg.pixel_scale,
    )

    class TruncatedBody(nn.Module):
        """ResNet50 stages 0..n_stages-1 with the production module names,
        so the full serving `variables['*']['body']` subtree resolves
        (extra entries — deeper stages, the stem — are simply unused)."""

        n_stages: int

        @nn.compact
        def __call__(self, pooled):
            x = pooled
            for stage in range(self.n_stages):
                for block in range(STAGE_SIZES[stage]):
                    strides = (2, 2) if block == 0 and stage > 0 else (1, 1)
                    x = Bottleneck(
                        WIDTHS[stage],
                        strides,
                        dtype=jnp.bfloat16,
                        name=f"s{stage}b{block}",
                    )(x, False)
            return x

    def cut_fn(n_stages):
        body = TruncatedBody(n_stages=n_stages)

        def fn(v, imgs_u8, _scales):
            pooled = stem_s4d(imgs_u8, *stem_aux)
            if n_stages == 0:
                return pooled
            sub = {
                "params": v["params"]["body"],
                "batch_stats": v["batch_stats"]["body"],
            }
            return body.apply(sub, pooled)

        return fn

    cuts = [("stem", cut_fn(0))] + [
        (f"s{i}", cut_fn(i + 1)) for i in range(len(STAGE_SIZES))
    ] + [("full", full_fn)]

    rng = np.random.default_rng()  # entropy-seeded (relay caching)

    def make_batch(batch):
        def make(i):
            imgs = rng.integers(
                0, 255, (batch, size[1], size[0], 3), dtype=np.uint8
            )
            return (
                jnp.asarray(s4d_layout_host(imgs)),
                jnp.ones((batch,), jnp.float32),
            )

        return make

    # ms per IMAGE, per cut, per batch size.
    ms_img = {}
    for name, fn in cuts:
        for b in batches:
            t0 = time.time()
            _, dt = _throughput_device(
                fn, variables, make_batch(b), b,
                n_batches=args.n_batches, repeats=args.repeats,
            )[:2]
            flag = (
                "  !! IMPLAUSIBLE (relay replaying?)"
                if name == "full" and dt * 1e3 < MIN_GRAPH_MS_PER_BATCH
                else ""
            )
            ms_img[(name, b)] = dt * 1e3 / b
            print(
                f"{name:5} b{b:<3} {dt * 1e3:8.3f} ms/batch "
                f"{dt * 1e3 / b:7.3f} ms/img (wall {time.time() - t0:.0f}s)"
                f"{flag}",
                flush=True,
            )

    b0 = batches[0]
    hdr = "cut    " + "".join(f"  b{b}:ms/img" for b in batches) + "".join(
        f"  b{b}/b{b0}" for b in batches[1:]
    )
    print("\nper-cut per-image scaling (1.00 = linear):\n" + hdr)
    for name, _fn in cuts:
        row = f"{name:7}" + "".join(
            f"  {ms_img[(name, b)]:9.3f}" for b in batches
        )
        row += "".join(
            f"  {ms_img[(name, b)] / ms_img[(name, b0)]:7.2f}"
            for b in batches[1:]
        )
        print(row)

    print("\nper-STAGE deltas (consecutive cuts; the inversion lives where")
    print("the ratio is largest):")
    prev = "stem"
    for name, _fn in cuts[1:-1]:
        row = f"{name}-{prev:5}"
        d0 = None
        for b in batches:
            d = ms_img[(name, b)] - ms_img[(prev, b)]
            d0 = d if d0 is None else d0
            row += f"  {d:9.3f}"
        for b in batches[1:]:
            d = ms_img[(name, b)] - ms_img[(prev, b)]
            row += f"  {d / d0:7.2f}" if d0 else "      n/a"
        print(row)
        prev = name
    return 0


if __name__ == "__main__":
    sys.exit(main())
