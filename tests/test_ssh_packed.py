"""Exactness of the packed SSH + heads levels (ops/ssh_packed.py).

The packed re-expression must be f32-exact vs the natural ssh{i}/head chain
(models/retinaface.py, models/layers.SSH): same nonzero products contracted
in the same relative order.  Covers the kernel packer in isolation, the
folded head maps against the model's own per-level outputs (all three
pyramid levels), the permuted anchor table, and the end-to-end batched
detect graph.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.models.retinaface import init_retinaface
from rs_face_detection_tpu.ops.image import s4d_layout_host
from rs_face_detection_tpu.ops.ssh_packed import (
    dense_kernel_packed,
    depth_to_space2,
    fold_fpn_packed,
    fold_ssh_heads_packed,
    fpn_packed,
    packed_anchor_perm,
    space_to_depth2,
    ssh_heads_packed,
)
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

SIZE = (64, 64)  # grids 8/4/2: even at every level; s4d/mid all eligible


def _depth_from_packed(y_packed, c):
    """(B, H/2, W/2, 4C) phase-major -> (B, H, W, C) natural grid."""
    b, h2, w2, c4 = y_packed.shape
    assert c4 == 4 * c
    y = y_packed.reshape(b, h2, w2, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h2, 2 * w2, c)


def test_dense_kernel_packed_exact():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 3, 6, 10)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))

    nat = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    kp = dense_kernel_packed(w)
    assert kp.shape == (3, 3, 24, 40)
    packed = jax.lax.conv_general_dilated(
        space_to_depth2(x), kp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # Not bitwise: XLA blocks the (3,3,24,40) contraction differently from
    # the (3,3,6,10) one, reassociating the f32 sums.  Same products, tiny
    # rounding spread.
    np.testing.assert_allclose(
        np.asarray(_depth_from_packed(packed, 10)),
        np.asarray(nat),
        rtol=1e-4,
        atol=1e-5,
    )


@pytest.fixture(scope="module")
def mnet():
    model, variables = init_retinaface(
        "mobilenet025", SIZE, dtype=jnp.float32, seed=3, stem_s2d=False
    )
    return model, variables


@pytest.mark.parametrize("level", [0, 1, 2])
def test_packed_head_maps_match_model(mnet, level):
    model, variables = mnet
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, SIZE[1], SIZE[0], 3)).astype(np.float32))
    stride = 8 * 2**level

    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    feat = jax.jit(
        lambda v, x: model.apply(
            v, x, train=False, skip_head_levels=(level,)
        )
    )(variables, x)[stride]["feat"]

    sp = fold_ssh_heads_packed(variables, level=level)
    out = jax.jit(
        lambda feat: ssh_heads_packed(
            feat, sp, model.num_anchors,
            negative_slope=model.negative_slope(),
            compute_dtype=jnp.float32,
        )
    )(feat)

    fh, fw, a = SIZE[1] // stride, SIZE[0] // stride, model.num_anchors
    perm = packed_anchor_perm(fh, fw, a)
    for key, per_anchor in (("score", 1), ("bbox", 4), ("landmark", 10)):
        nat = np.asarray(ref[stride][key]).reshape(2, fh * fw * a, per_anchor)
        got = np.asarray(out[key]).reshape(2, fh * fw * a, per_anchor)
        np.testing.assert_allclose(
            got, nat[:, perm], rtol=0, atol=1e-6, err_msg=key
        )


def test_packed_fpn_chain_matches_model(mnet):
    """fpn_packed + ssh_heads_packed(pre_packed) from raw C3/C4 + the
    coarser pyramid level reproduce the model's own level-0/1 head maps
    (permuted rows) — including the packed-P4 -> depth_to_space2 -> P3 path."""
    model, variables = mnet
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, SIZE[1], SIZE[0], 3)).astype(np.float32))

    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    skipped = jax.jit(
        lambda v, x: model.apply(
            v, x, train=False,
            skip_head_levels=(0, 1, 2), skip_fpn_levels=(0, 1),
        )
    )(variables, x)
    c3, c4, p5 = skipped[8]["c"], skipped[16]["c"], skipped[32]["feat"]

    slope = model.negative_slope()
    fp0 = fold_fpn_packed(variables, level=0)
    fp1 = fold_fpn_packed(variables, level=1)

    def chain(c3, c4, p5):
        p4p = fpn_packed(c4, p5, fp1, negative_slope=slope,
                         compute_dtype=jnp.float32)
        p3p = fpn_packed(c3, depth_to_space2(p4p), fp0,
                         negative_slope=slope, compute_dtype=jnp.float32)
        outs = {}
        for level, feat in ((0, p3p), (1, p4p)):
            sp = fold_ssh_heads_packed(variables, level=level)
            outs[level] = ssh_heads_packed(
                feat, sp, model.num_anchors, negative_slope=slope,
                compute_dtype=jnp.float32, pre_packed=True,
            )
        return outs

    outs = jax.jit(chain)(c3, c4, p5)
    for level in (0, 1):
        stride = 8 * 2**level
        fh, fw, a = SIZE[1] // stride, SIZE[0] // stride, model.num_anchors
        perm = packed_anchor_perm(fh, fw, a)
        for key, per_anchor in (("score", 1), ("bbox", 4), ("landmark", 10)):
            nat = np.asarray(ref[stride][key]).reshape(
                2, fh * fw * a, per_anchor
            )
            got = np.asarray(outs[level][key]).reshape(
                2, fh * fw * a, per_anchor
            )
            np.testing.assert_allclose(
                got, nat[:, perm], rtol=0, atol=2e-5,
                err_msg=f"L{level}:{key}",
            )


def test_batched_graph_fpn_parity(mnet):
    model, variables = mnet
    cfg = FaceDetectionConfig(
        backbone="mobilenet025", image_size=SIZE, confidence_threshold=0.02
    )
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    base = det.make_batched_fn(stem="s4d", packed_heads=True, packed_fpn=False)

    rng = np.random.default_rng(6)
    imgs = rng.integers(0, 255, size=(2, SIZE[1], SIZE[0], 3), dtype=np.uint8)
    x = jnp.asarray(s4d_layout_host(imgs))
    scales = jnp.ones((2,), jnp.float32)
    a = base(variables, x, scales)

    for fpn in [(0,), (0, 1), True]:
        fn = det.make_batched_fn(
            stem="s4d", packed_heads=True, packed_fpn=fpn
        )
        b = fn(variables, x, scales)
        np.testing.assert_array_equal(
            np.asarray(a.count), np.asarray(b.count), err_msg=str(fpn)
        )
        np.testing.assert_allclose(
            np.asarray(a.det), np.asarray(b.det), rtol=0, atol=1e-3,
            err_msg=str(fpn),
        )

    with pytest.raises(ValueError):
        det.make_batched_fn(
            stem="s4d", packed_heads=(0,), packed_fpn=(0,)
        )  # needs level 1 packed too
    with pytest.raises(ValueError):
        det.make_batched_fn(
            stem="s4d", packed_heads=True, packed_fpn=(1,)
        )  # not downward-closed


def test_batched_graph_parity(mnet):
    model, variables = mnet
    cfg = FaceDetectionConfig(
        backbone="mobilenet025", image_size=SIZE, confidence_threshold=0.02
    )
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    base = det.make_batched_fn(stem="s4d", packed_heads=False)
    packed = det.make_batched_fn(stem="s4d", packed_heads=True)  # all levels

    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, size=(2, SIZE[1], SIZE[0], 3), dtype=np.uint8)
    x = jnp.asarray(s4d_layout_host(imgs))
    scales = jnp.ones((2,), jnp.float32)

    a = base(variables, x, scales)
    b = packed(variables, x, scales)
    # Pixel-coordinate rounding spread: the packed convs reassociate f32
    # sums, and decode's exp() amplifies ~1e-6 deltas to ~1e-4 px.
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
    np.testing.assert_allclose(
        np.asarray(a.det), np.asarray(b.det), rtol=0, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(a.kps), np.asarray(b.kps), rtol=0, atol=1e-3
    )


def test_packed_level_subset_parity(mnet):
    model, variables = mnet
    cfg = FaceDetectionConfig(
        backbone="mobilenet025", image_size=SIZE, confidence_threshold=0.02
    )
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    base = det.make_batched_fn(stem="s4d", packed_heads=False)
    sub = det.make_batched_fn(stem="s4d", packed_heads=(0, 2))

    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 255, size=(2, SIZE[1], SIZE[0], 3), dtype=np.uint8)
    x = jnp.asarray(s4d_layout_host(imgs))
    scales = jnp.ones((2,), jnp.float32)

    a = base(variables, x, scales)
    b = sub(variables, x, scales)
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
    np.testing.assert_allclose(
        np.asarray(a.det), np.asarray(b.det), rtol=0, atol=1e-3
    )


def test_packed_heads_validation(mnet):
    model, variables = mnet
    cfg = FaceDetectionConfig(backbone="mobilenet025", image_size=SIZE)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    with pytest.raises(ValueError):
        det.make_batched_fn(stem="xla", packed_heads=True)
    with pytest.raises(ValueError):
        det.make_batched_fn(stem="xla", packed_heads=(0,))
