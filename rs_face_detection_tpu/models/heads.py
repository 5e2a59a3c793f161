"""SmallCNN — a compact classifier used as a TEST DOUBLE.

The production model families are the real architectures:
  - MiniFASNetV1/V2(/SE) for the liveness ensemble (models/minifas.py),
  - ResNet18Classifier for quality / FQA (models/classifiers.py),
both able to structurally accept their public state_dicts via import maps.
SmallCNN remains only for fast pipeline-mechanics tests (its strided-conv +
GAP trunk compiles in seconds at any size) and custom registry injection.

I/O contracts it can stand in for (from the reference):
  - face_quality (face_quality.rs:40-169): 112x112 ImageNet-normalized RGB ->
    (B, 4) class probabilities [Bad, Good, WearingMask, WearingSunGlasses].
  - miniFAS_{4,2_7,2,1} (face_antispoofing.rs): raw 0-255 BGR crops at
    80/80/256/128 px -> (B, 3) probabilities, column 1 = live.
  - face_quality_assetment (face_quality_assessment.rs:40-160): 112x112
    (px-127.5)*0.00784 RGB -> (B, 1) scalar score on a 0-100 scale.
"""

from __future__ import annotations

import functools

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ConvBN


class SmallCNN(nn.Module):
    """Strided conv trunk + GAP + dense head."""

    num_outputs: int
    widths: Tuple[int, ...] = (32, 64, 128, 256)
    softmax: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        x = ConvBN(self.widths[0], (3, 3), (2, 2), dtype=dt, name="stem")(x, train)
        for i, w in enumerate(self.widths[1:]):
            x = ConvBN(w, (3, 3), (2, 2), dtype=dt, name=f"c{i}a")(x, train)
            x = ConvBN(w, (3, 3), (1, 1), dtype=dt, name=f"c{i}b")(x, train)
        x = x.mean(axis=(1, 2)).astype(jnp.float32)  # GAP
        x = nn.Dense(self.num_outputs, param_dtype=jnp.float32, name="fc")(x)
        if self.softmax:
            x = jax.nn.softmax(x, axis=-1)
        return x


def init_small_cnn(
    num_outputs: int,
    image_size: Sequence[int],
    softmax: bool = True,
    widths: Tuple[int, ...] = (32, 64, 128, 256),
    dtype: Any = jnp.float32,
    seed: int = 0,
):
    model = SmallCNN(
        num_outputs=num_outputs, widths=widths, softmax=softmax, dtype=dtype
    )
    width, height = image_size
    dummy = jnp.zeros((1, height, width, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(seed), dummy
    )
    return model, variables
