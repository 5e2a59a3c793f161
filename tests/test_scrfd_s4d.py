"""Dense SCRFD front on the s4d grid (ops/scrfd_s4d.py).

The re-expression must be f32-EXACT against the natural stem chain (same
taps, same BN affine, different summation layout), and the stem='s4d'
batched serving path must reproduce the natural batched path end to end.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.models.layers import ConvBN
from rs_face_detection_tpu.models.scrfd import init_scrfd
from rs_face_detection_tpu.ops.image import (
    bgr_to_rgb,
    normalize,
    s4d_layout_host,
)
from rs_face_detection_tpu.ops.scrfd_s4d import (
    fold_scrfd_s4d_params,
    scrfd_s4d_front,
)
from rs_face_detection_tpu.pipeline.ekyc_pipeline import SCRFDDetection

MEAN, SCALE = 127.5, 0.00784313725490196


class _Stems(nn.Module):
    width: int

    @nn.compact
    def __call__(self, x):
        x = ConvBN(
            self.width, (3, 3), (2, 2), act=nn.relu, dtype=jnp.float32,
            name="stem1",
        )(x, False)
        x = ConvBN(
            self.width, (3, 3), (2, 2), act=nn.relu, dtype=jnp.float32,
            name="stem2",
        )(x, False)
        return x


@pytest.mark.parametrize("size", [(64, 64), (64, 32)])
def test_front_exact_vs_natural_stems(size):
    w, h = size
    model, variables = init_scrfd(size, width=8, seed=1)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8)

    x = bgr_to_rgb(jnp.asarray(imgs).astype(jnp.float32))
    x = normalize(x, (MEAN,) * 3, (SCALE,) * 3)
    sub = {
        "params": {k: variables["params"][k] for k in ("stem1", "stem2")},
        "batch_stats": {
            k: variables["batch_stats"][k] for k in ("stem1", "stem2")
        },
    }
    ref = _Stems(width=8).apply(sub, x)

    fp = fold_scrfd_s4d_params(variables, MEAN, SCALE)
    got = scrfd_s4d_front(
        jnp.asarray(s4d_layout_host(imgs)), fp,
        compute_dtype=jnp.float32, out_dtype=jnp.float32,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_batched_s4d_matches_xla_path():
    model, variables = init_scrfd((64, 64), width=8, seed=0)
    det = SCRFDDetection(
        model=model, variables=variables, image_size=(64, 64),
        confidence_threshold=0.4, registry=None,
    )
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    scales = jnp.ones((2,), jnp.float32)

    ref = det.make_batched_fn()(variables, jnp.asarray(imgs), scales)
    fn = det.make_batched_fn(stem="s4d")
    out = fn(variables, jnp.asarray(s4d_layout_host(imgs)), scales)

    np.testing.assert_array_equal(np.asarray(out.count), np.asarray(ref.count))
    n = int(ref.count[0])
    np.testing.assert_allclose(
        np.asarray(out.det[0, :n]), np.asarray(ref.det[0, :n]),
        rtol=1e-4, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out.kps[0, :n]), np.asarray(ref.kps[0, :n]),
        rtol=1e-4, atol=1e-3,
    )

    # The aux protocol is present (weight folds hoisted out of the graph).
    assert hasattr(fn, "fold") and hasattr(fn, "jitted")
    aux = fn.fold(variables)
    out2 = fn.jitted(variables, aux, jnp.asarray(s4d_layout_host(imgs)), scales)
    np.testing.assert_array_equal(
        np.asarray(out2.count), np.asarray(out.count)
    )


def test_batched_s4d_eligibility_errors():
    model, variables = init_scrfd((64, 64), width=8, seed=0)
    det = SCRFDDetection(
        model=model, variables=variables, image_size=(64, 64), registry=None
    )
    with pytest.raises(ValueError):
        det.make_batched_fn(stem="bogus")
    with pytest.raises(ValueError):
        det.make_batched_fn(pre_s2d=True)

    odd = SCRFDDetection(
        model=model, variables=variables, image_size=(66, 66), registry=None
    )
    with pytest.raises(ValueError):
        odd.make_batched_fn(stem="s4d")
