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
