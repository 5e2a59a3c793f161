"""Packed SCRFD shared head (ops/scrfd_packed.py).

f32-exactness against the natural-layout head (same taps, GN statistics,
and biases; different summation layout), and end-to-end batched parity of
make_batched_fn(stem='s4d', packed_heads=...) against the unpacked path.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.models.scrfd import init_scrfd
from rs_face_detection_tpu.ops.image import (
    bgr_to_rgb,
    normalize,
    s4d_layout_host,
)
from rs_face_detection_tpu.ops.scrfd_packed import (
    fold_scrfd_head_packed,
    gn_packed,
    scrfd_head_packed,
)
from rs_face_detection_tpu.ops.ssh_packed import (
    packed_anchor_perm,
    space_to_depth2,
)
from rs_face_detection_tpu.pipeline.ekyc_pipeline import SCRFDDetection

MEAN, SCALE = 127.5, 0.00784313725490196


def test_gn_packed_matches_group_norm():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
    gn = nn.GroupNorm(num_groups=16)
    v = gn.init(jax.random.PRNGKey(0), x)
    # Non-trivial affine.
    v = {"params": {
        "scale": jnp.asarray(rng.normal(size=(32,)).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(size=(32,)).astype(np.float32)),
    }}
    ref = gn.apply(v, x)
    got = gn_packed(
        space_to_depth2(x), v["params"]["scale"], v["params"]["bias"],
        num_groups=16,
    )
    # Compare in the packed layout.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(space_to_depth2(ref)), atol=2e-5
    )


def test_head_packed_exact_vs_natural():
    model, variables = init_scrfd((64, 64), width=8, seed=2)
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    x = bgr_to_rgb(jnp.asarray(imgs).astype(jnp.float32))
    x = normalize(x, (MEAN,) * 3, (SCALE,) * 3)

    nat = model.apply(variables, x, train=False)
    skip = model.apply(variables, x, train=False, skip_head_strides=(8,))
    feat8 = skip[8]["feat"]
    assert feat8.shape[1:3] == (8, 8)  # stride-8 grid at 64x64

    hp = fold_scrfd_head_packed(variables)
    packed = scrfd_head_packed(feat8, hp, compute_dtype=jnp.float32)

    fh, fw, a = 8, 8, model.num_anchors
    perm = packed_anchor_perm(fh, fw, a)
    k = fh * fw * a
    for key, width_ in (("score", 1), ("bbox", 4), ("kps", 10)):
        nat_rows = np.asarray(nat[8][key]).reshape(2, k, width_)
        packed_rows = np.asarray(packed[key]).reshape(2, k, width_)
        np.testing.assert_allclose(
            packed_rows, nat_rows[:, perm], atol=1e-5,
            err_msg=key,
        )


def test_batched_packed_heads_matches_unpacked():
    model, variables = init_scrfd((64, 64), width=8, seed=0)
    det = SCRFDDetection(
        model=model, variables=variables, image_size=(64, 64),
        confidence_threshold=0.4, registry=None,
    )
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    x = jnp.asarray(s4d_layout_host(imgs))
    scales = jnp.ones((2,), jnp.float32)

    ref = det.make_batched_fn(stem="s4d")(variables, x, scales)
    out = det.make_batched_fn(stem="s4d", packed_heads=True)(
        variables, x, scales
    )
    np.testing.assert_array_equal(np.asarray(out.count), np.asarray(ref.count))
    for i in range(2):
        n = int(ref.count[i])
        np.testing.assert_allclose(
            np.asarray(out.det[i, :n]), np.asarray(ref.det[i, :n]),
            rtol=1e-4, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out.kps[i, :n]), np.asarray(ref.kps[i, :n]),
            rtol=1e-4, atol=1e-3,
        )


def test_packed_heads_eligibility():
    model, variables = init_scrfd((64, 64), width=8, seed=0)
    det = SCRFDDetection(
        model=model, variables=variables, image_size=(64, 64), registry=None
    )
    with pytest.raises(ValueError):
        det.make_batched_fn(packed_heads=True)  # needs stem='s4d'
    with pytest.raises(ValueError):
        det.make_batched_fn(stem="s4d", packed_heads=(5,))
