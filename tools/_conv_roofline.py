import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TF = 197e12
PEAK_BW = 819e9

B = 8
N = 8
shapes = [
    ("s0.c1 160x64->64 1x1", 160, 64, 64, 1, False),
    ("s0.c2 160x64->64 3x3", 160, 64, 64, 3, False),
    ("s0.c3 160x64->256 1x1+res", 160, 64, 256, 1, True),
    ("s0.c1' 160x256->64 1x1", 160, 256, 64, 1, False),
    ("s1.c2 80x128->128 3x3", 80, 128, 128, 3, False),
    ("s1.c3 80x128->512 1x1+res", 80, 128, 512, 1, True),
    ("s1.c1 80x512->128 1x1", 80, 512, 128, 1, False),
    ("s2.c2 40x256->256 3x3", 40, 256, 256, 3, False),
    ("s2.c3 40x256->1024 1x1+res", 40, 256, 1024, 1, True),
    ("s2.c1 40x1024->256 1x1", 40, 1024, 256, 1, False),
]

rng = np.random.default_rng(0)


def bench_conv(H, Cin, Cout, k, res):
    xs = jnp.asarray(
        rng.standard_normal((N, B, H, H, Cin)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(
        rng.standard_normal((k, k, Cin, Cout)).astype(np.float32)
    ).astype(jnp.bfloat16)
    rs = (
        jnp.asarray(
            rng.standard_normal((N, B, H, H, Cout)).astype(np.float32)
        ).astype(jnp.bfloat16)
        if res
        else None
    )

    @jax.jit
    def chain(xs, w, rs):
        def body(c, t):
            x = t[0]
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            y = jnp.maximum(y + t[1], 0) if rs is not None else jnp.maximum(y, 0)
            return c, y

        operand = (xs, rs) if rs is not None else (xs, xs)
        _, outs = jax.lax.scan(body, 0, operand, unroll=2)
        return outs

    # Distinct inputs per rep: the tunneled relay serves repeated identical
    # executions from a cache.
    reps = 3
    xs_reps = [xs + jnp.bfloat16(i * 0.25) for i in range(reps)]
    jax.block_until_ready(xs_reps)
    jax.block_until_ready(chain(xs, w, rs))
    t0 = time.perf_counter()
    outs = [chain(x, w, rs) for x in xs_reps]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (N * reps)

    flops = 2 * B * H * H * k * k * Cin * Cout
    bytes_ = 2 * (B * H * H * (Cin + Cout)) + (2 * B * H * H * Cout if res else 0)
    t_f = flops / PEAK_TF
    t_b = bytes_ / PEAK_BW
    bound = max(t_f, t_b)
    return dt, flops, bytes_, t_f, t_b, dt / bound


print(f"{'shape':32s} {'ms':>8s} {'MFU%':>6s} {'GB/s':>7s} {'vs-roofline':>11s}")
tot, tot_bound = 0.0, 0.0
for name, H, Cin, Cout, k, res in shapes:
    dt, fl, by, tf_, tb_, ratio = bench_conv(H, Cin, Cout, k, res)
    tot += dt
    tot_bound += max(tf_, tb_)
    print(
        f"{name:32s} {dt*1000:8.3f} {fl/dt/PEAK_TF*100:6.1f} {by/dt/1e9:7.0f} {ratio:10.2f}x"
        + ("  [BW-bound]" if tb_ > tf_ else "  [FLOP-bound]")
    )
print(f"{'TOTAL (one of each)':32s} {tot*1000:8.3f} ms vs roofline {tot_bound*1000:.3f} ms")
