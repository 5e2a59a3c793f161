"""Fused (Pallas flash) ViT attention vs the materialized-scores path.

The fused path must reproduce the standard flax attention to serving-dtype
rounding on the same variables — same qkv/out params, same math, with the
257-token sequence padded to the 128 grid and pad keys segment-masked
(models/vit._flash_attention_fn).

Two tiers: CPU tests run the SAME Pallas kernel under
pltpu.force_tpu_interpret_mode (exact semantics, Python-speed), so the
padding/transpose/segment-mask wiring is regression-covered every suite
run; the TPU-gated tests validate the compiled Mosaic kernel and the
full-size clip_l14 graph on a chip (RSFD_TEST_TPU=1).
"""

import jax
import jax.experimental.pallas.tpu as pltpu
import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.models.vit import ViT, init_vit, _flash_attention_fn

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled Pallas flash-attention kernel needs a TPU backend",
)


def test_flash_attention_fn_matches_flax_interpret():
    """Wrapper parity at the attention_fn level, pad-and-mask included."""
    import flax.linen as nn

    rng = np.random.default_rng(0)
    b, n, h, d = 2, 17, 2, 32  # n far off the 128 grid: exercises padding
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
        for _ in range(3)
    )
    ref = nn.dot_product_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = _flash_attention_fn(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_fused_attention_matches_standard_interpret():
    """Model-level parity (clip_tiny_test) with the kernel interpreted."""
    model, variables = init_vit(
        "clip_tiny_test", 2, (64, 64), dtype=jnp.float32, seed=0
    )
    fused = ViT(
        config="clip_tiny_test", num_classes=2, dtype=jnp.float32,
        fused_attention=True,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    ref = model.apply(variables, x, train=False)
    with pltpu.force_tpu_interpret_mode():
        got = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=2e-6
    )


@requires_tpu
@pytest.mark.parametrize("config", ["clip_tiny_test"])
def test_fused_attention_matches_standard(config):
    model, variables = init_vit(config, 2, (64, 64), dtype=jnp.float32, seed=0)
    fused = ViT(
        config=config, num_classes=2, dtype=jnp.float32, fused_attention=True
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))

    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    got = jax.jit(lambda v, x: fused.apply(v, x, train=False))(variables, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=2e-5
    )


@requires_tpu
def test_fused_attention_full_size_runs():
    """The production clip_l14 graph compiles and runs with the kernel."""
    model, variables = init_vit(
        "clip_l14", 2, (224, 224), dtype=jnp.bfloat16, seed=0,
        fused_attention=True,
    )
    x = jnp.zeros((2, 224, 224, 3), jnp.float32)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    out = np.asarray(out)
    assert out.shape == (2, 2) and np.isfinite(out).all()
    np.testing.assert_allclose(out.sum(axis=-1), 1.0, atol=1e-2)
