"""ResNet18 quality/FQA classifier: torchvision-layout import parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from rs_face_detection_tpu.models.classifiers import (
    init_resnet18_classifier,
    load_resnet18_classifier_state_dict,
)

from torch_mirrors import ResNet18ClassifierMirror, randomize_state_dict


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.mark.parametrize("num_outputs", [4, 1], ids=["quality4", "fqa1"])
def test_resnet18_classifier_import_forward_parity(num_outputs):
    mirror = randomize_state_dict(
        ResNet18ClassifierMirror(num_outputs), seed=num_outputs
    )
    model, variables = load_resnet18_classifier_state_dict(
        _np_sd(mirror), softmax=False
    )
    assert model.num_outputs == num_outputs

    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, (2, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        expected = mirror(torch.from_numpy(x)).numpy()
    got = np.asarray(
        model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    )
    scale = float(np.abs(expected).max()) or 1.0
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-3 * scale)


def test_resnet18_classifier_softmax_contract():
    model, variables = init_resnet18_classifier(4, (112, 112), softmax=True)
    probs = model.apply(variables, jnp.zeros((2, 112, 112, 3)), train=False)
    assert probs.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(probs).sum(axis=1), 1.0, rtol=1e-5)


def test_registry_defaults_are_real_architectures():
    """Production default builders serve the REAL model families (MiniFASNet
    for liveness, ResNet18 for quality); SmallCNN is test-only."""
    from rs_face_detection_tpu.models.minifas import MiniFASNet
    from rs_face_detection_tpu.models.registry import (
        ModelRegistry,
        _attach_standard_builders,
    )

    reg = ModelRegistry()
    _attach_standard_builders(reg)
    qmodel, qvars = reg.get("face_quality")
    assert isinstance(qmodel, (type(qmodel),)) and qmodel.__class__.__name__ == (
        "ResNet18Classifier"
    )
    probs = qmodel.apply(qvars, jnp.zeros((1, 112, 112, 3)), train=False)
    assert probs.shape == (1, 4)

    fmodel, fvars = reg.get("miniFAS_1")  # 128x128, the smallest FAS compile
    assert isinstance(fmodel, MiniFASNet)
    probs = fmodel.apply(fvars, jnp.zeros((1, 128, 128, 3)), train=False)
    assert probs.shape == (1, 3)
