"""mmdet-layout SCRFD import: torch-mirror forward parity (VERDICT r2 #5b).

The eKYC `scrfd` detector must structurally accept a public insightface
checkpoint (mmdet module naming).  With zero egress, the oracle is a torch
mirror built to the same conventions (tests/torch_mirrors.py::SCRFDMirror);
the shape-derived spec is exercised on multiple widths/configs and both
ModuleDict stride-key styles seen in the wild.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from rs_face_detection_tpu.models.scrfd_import import (
    load_scrfd_state_dict,
    scrfd_spec_from_state_dict,
)

from torch_mirrors import SCRFDMirror, randomize_state_dict


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.mark.parametrize("stride_key_style", ["plain", "tuple"])
def test_spec_derivation(stride_key_style):
    mirror = SCRFDMirror(width=8, stride_key_style=stride_key_style)
    spec = scrfd_spec_from_state_dict(_np_sd(mirror))
    assert spec.deep_stem is True
    assert spec.stem_channels == (4, 4, 8)
    assert spec.block == "basic"
    assert spec.stage_blocks == (2, 2, 2, 2)
    assert spec.stage_planes == (8, 16, 32, 64)
    assert spec.neck_in_start == 1  # C3..C5 feed the neck
    assert spec.neck_out == 16
    assert spec.stacked_convs == 2
    assert spec.num_anchors == 2
    assert spec.use_kps is True
    assert spec.head_norm == "gn"


@pytest.mark.parametrize("use_kps", [True, False])
def test_forward_parity(use_kps):
    mirror = randomize_state_dict(
        SCRFDMirror(width=8, neck_out=16, use_kps=use_kps), seed=4
    )
    model, variables, spec = load_scrfd_state_dict(
        _np_sd(mirror), image_size=(64, 64)
    )
    assert spec.use_kps is use_kps

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.asarray(x)
    )
    with torch.no_grad():
        want = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for i, stride in enumerate((8, 16, 32)):
        score_t, bbox_t, kps_t = want[i]
        np.testing.assert_allclose(
            np.asarray(out[stride]["score"]),
            score_t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3,
            atol=1e-4,
            err_msg=f"score stride {stride}",
        )
        np.testing.assert_allclose(
            np.asarray(out[stride]["bbox"]),
            bbox_t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3,
            atol=1e-4,
            err_msg=f"bbox stride {stride}",
        )
        if use_kps:
            np.testing.assert_allclose(
                np.asarray(out[stride]["kps"]),
                kps_t.numpy().transpose(0, 2, 3, 1),
                rtol=1e-3,
                atol=1e-4,
                err_msg=f"kps stride {stride}",
            )
        else:
            assert "kps" not in out[stride]


def test_tuple_stride_keys_import():
    mirror = randomize_state_dict(
        SCRFDMirror(width=8, stride_key_style="tuple"), seed=7
    )
    model, variables, spec = load_scrfd_state_dict(
        _np_sd(mirror), image_size=(32, 32)
    )
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    assert set(out) == {8, 16, 32}


def test_strict_rejects_unconsumed():
    mirror = SCRFDMirror(width=8)
    sd = _np_sd(mirror)
    sd["bbox_head.unknown.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        load_scrfd_state_dict(sd, image_size=(32, 32))
