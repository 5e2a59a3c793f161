"""Dense stage-boundary stride-2 re-expression (models.layers.S2DStride2Conv).

VERDICT r2 #10: R50's three stage-boundary 3x3/s2 convs profile ~3.4x off
peak on TPU; the s4d-stem algebra re-expresses them as dense 2x2/s1 convs on
a 2x2 space-to-depth layout (and the 1x1/s2 proj as subsample + 1x1/s1).
These tests pin the math: single-layer equivalence vs the strided conv,
param-layout identity (checkpoints load unchanged), and full-R50 forward
parity.  Tolerances are float reduction-order noise (the zero-embedded taps
change the contraction's summation order), not approximation error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_s2d_stride2_conv_matches_strided_conv():
    from rs_face_detection_tpu.models.layers import S2DStride2Conv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 20, 32)).astype(np.float32))
    mod = S2DStride2Conv(features=48)
    v = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(v, x)
    ref = jax.lax.conv_general_dilated(
        x,
        v["params"]["kernel"],
        (2, 2),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert y.shape == ref.shape == (2, 8, 10, 48)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_s2d_stride2_conv_rejects_odd_dims():
    from rs_face_detection_tpu.models.layers import S2DStride2Conv

    x = jnp.zeros((1, 7, 8, 4), jnp.float32)
    with pytest.raises(AssertionError):
        S2DStride2Conv(features=8).init(jax.random.PRNGKey(0), x)


def test_r50_s2d_boundary_param_layout_and_parity():
    """Same param tree/shapes as the plain R50; forward agrees at f32."""
    from rs_face_detection_tpu.models.retinaface import (
        RetinaFace,
        init_retinaface,
    )

    size = (64, 64)
    model, variables = init_retinaface("resnet50", size, seed=0)
    model2 = RetinaFace(backbone="resnet50", s2d_boundary=True)
    v2 = jax.jit(lambda k, x: model2.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
    assert jax.tree.map(lambda a: a.shape, variables) == jax.tree.map(
        lambda a: a.shape, v2
    )

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (2, 64, 64, 3)).astype(np.float32)
    )
    o1 = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    o2 = jax.jit(lambda v, x: model2.apply(v, x, train=False))(variables, x)
    for s in (8, 16, 32):
        np.testing.assert_allclose(
            np.asarray(o1[s]["score"]), np.asarray(o2[s]["score"]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(o1[s]["bbox"]), np.asarray(o2[s]["bbox"]), atol=1e-3
        )
