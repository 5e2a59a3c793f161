"""Int8 weight quantization: per-channel symmetric, dequant-on-the-fly.

Weight-only quantization for serving: parameters are stored as int8 with
per-output-channel float32 scales (4x smaller checkpoints, 4x less HBM
weight traffic) and dequantized inside the jit graph right before use — XLA
fuses the dequant multiply into the consumer, so weights stream from HBM as
int8.  Compute stays bf16/f32 on the MXU (weight-only mode; full int8
activations need calibration and are future work).

A Pallas kernel (`int8_matmul`) implements the fused dequant-matmul for
large dense layers explicitly: int8 weight tile -> VMEM -> dequant -> MXU,
one kernel, no f32 weight copy ever materialized in HBM.

The reference has no quantization story (fp32 over the wire throughout —
SURVEY.md §2); this is a TPU-native addition.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_array(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel int8 quantization.

    The last axis is treated as the output-channel axis (flax kernels are
    (..., in, out) / (in, out)).  Returns (int8 values, float32 scales with
    shape (..., 1) broadcastable) such that w ~= q * scale.
    """
    w = np.asarray(w, dtype=np.float32)
    absmax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = (absmax / 127.0).astype(np.float32)
    scale = np.where(scale == 0.0, 1.0, scale)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale


def dequantize_array(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """q * scale, in the requested compute dtype."""
    return q.astype(dtype) * scale.astype(dtype)


_QUANT_SUFFIX = "::q"
_SCALE_SUFFIX = "::s"


def quantize_tree(
    params: Mapping[str, Any], min_size: int = 4096
) -> Dict[str, Any]:
    """Quantize every float kernel leaf with >= min_size elements.

    Quantized leaves become {"::q": int8, "::s": scales} sub-dicts; small
    tensors (biases, BN affine, PReLU slopes) stay float — they are noise in
    both bytes and accuracy.
    """
    def walk(node):
        if isinstance(node, Mapping):
            return {k: walk(v) for k, v in node.items()}
        arr = np.asarray(node)
        if (
            arr.dtype in (np.float32, np.float16)
            and arr.ndim >= 2
            and arr.size >= min_size
        ):
            q, s = quantize_array(arr)
            return {_QUANT_SUFFIX: q, _SCALE_SUFFIX: s}
        return arr

    return walk(params)


def dequantize_tree(qparams: Mapping[str, Any], dtype=jnp.float32):
    """Rebuild a float params pytree inside a jit graph (fusable dequant)."""
    def walk(node):
        if isinstance(node, Mapping):
            if _QUANT_SUFFIX in node:
                return dequantize_array(
                    jnp.asarray(node[_QUANT_SUFFIX]),
                    jnp.asarray(node[_SCALE_SUFFIX]),
                    dtype,
                )
            return {k: walk(v) for k, v in node.items()}
        return jnp.asarray(node)

    return walk(qparams)


def quantized_bytes(qparams: Mapping[str, Any]) -> int:
    """Total parameter bytes of a (possibly quantized) tree."""
    total = 0
    for leaf in jax.tree.leaves(qparams):
        total += np.asarray(leaf).nbytes
    return total


# ---------------------------------------------------------------------------
# Full int8 inference: convert a float RetinaFace to the quantized variant.
# ---------------------------------------------------------------------------


def quantize_model_variables(qmodel, float_variables, example_input):
    """Build variables for a quant=True model from a float model's variables.

    The quantized module tree differs from the float one only where ConvBN
    swapped nn.Conv for Int8Conv: `.../Conv_0/kernel` becomes
    `.../Conv_0/{kernel_q, kernel_scale}` (per-output-channel symmetric, see
    quantize_array).  Everything else (BN, biases, heads, batch_stats) copies
    through by identical path.  Returns variables including a zeroed
    "quant_stats" collection — run `calibrate` next.
    """
    from flax import traverse_util

    target = jax.eval_shape(
        lambda: qmodel.init(jax.random.PRNGKey(0), example_input, train=False)
    )
    fparams = traverse_util.flatten_dict(float_variables["params"])
    out = {}
    for path, leaf in traverse_util.flatten_dict(target["params"]).items():
        if path[-1] == "kernel_q":
            w = np.asarray(fparams[path[:-1] + ("kernel",)], np.float32)
            q, s = quantize_array(w)
            assert q.shape == leaf.shape, (path, q.shape, leaf.shape)
            out[path] = jnp.asarray(q)
            out[path[:-1] + ("kernel_scale",)] = jnp.asarray(s.reshape(-1))
        elif path[-1] == "kernel_scale":
            continue  # written alongside kernel_q
        else:
            out[path] = jnp.asarray(fparams[path])
    variables = dict(float_variables)
    variables["params"] = traverse_util.unflatten_dict(out)
    variables["quant_stats"] = jax.tree.map(
        lambda l: jnp.zeros(l.shape, l.dtype), target["quant_stats"]
    )
    return variables


def calibrate(qmodel, variables, batches):
    """Record per-layer activation amax over calibration batches.

    Runs the float-math calibration forward (Int8Conv calibrate path) with
    the "quant_stats" collection mutable; amax accumulates monotonically
    across batches.  Returns variables with the calibrated ranges.
    """
    apply = jax.jit(
        functools.partial(qmodel.apply, train=False, mutable=["quant_stats"])
    )
    variables = dict(variables)
    for batch in batches:
        _, upd = apply(variables, batch)
        variables["quant_stats"] = upd["quant_stats"]
    return variables


def quantize_retinaface(
    model,
    float_variables,
    image_size,
    calib_batches=None,
    n_calib: int = 2,
    calib_batch_size: int = 2,
    seed: int = 0,
):
    """float RetinaFace -> (quant model, calibrated int8 variables).

    calib_batches: iterable of model-input arrays (normalized images, any of
    the stem layouts the model accepts).  When None, random uint8-range
    pixels are used — fine for throughput work; pass representative images
    for accuracy-sensitive serving.
    """
    qmodel = model.clone(quant=True)
    width, height = image_size
    dummy = jnp.zeros((1, height, width, 3), jnp.float32)
    variables = quantize_model_variables(qmodel, float_variables, dummy)
    if calib_batches is None:
        rng = np.random.default_rng(seed)
        calib_batches = [
            jnp.asarray(
                rng.integers(
                    0, 256, (calib_batch_size, height, width, 3)
                ).astype(np.float32)
            )
            for _ in range(n_calib)
        ]
    variables = calibrate(qmodel, variables, calib_batches)
    return qmodel, variables


# ---------------------------------------------------------------------------
# Pallas fused dequant-matmul: (M, K) bf16/f32 x (K, N) int8 -> (M, N) f32.
# ---------------------------------------------------------------------------


def _int8_matmul_kernel(x_ref, q_ref, s_ref, o_ref):
    x = x_ref[:]
    w = q_ref[:].astype(jnp.bfloat16) * s_ref[:].astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(
        x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def int8_matmul(
    x: jnp.ndarray,
    q: jnp.ndarray,
    scale: jnp.ndarray,
    block_n: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused dequant-matmul kernel: x @ (q * scale).

    x: (M, K) float; q: (K, N) int8; scale: (1, N) or (N,) float32.
    The weight enters VMEM as int8 and is dequantized on-chip — no float
    weight array ever exists in HBM.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, k = x.shape
    kq, n = q.shape
    assert k == kq, (x.shape, q.shape)
    scale2d = scale.reshape(1, n)

    block_n = min(block_n, n)
    while n % block_n:
        block_n -= 1  # largest divisor of n <= requested block

    return pl.pallas_call(
        _int8_matmul_kernel,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
    )(x, q, scale2d)
