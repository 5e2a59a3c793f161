"""Public-checkpoint import maps: torch-mirror forward parity.

VERDICT r1 #2: build the torch reference nets locally (public state_dict
layouts — see tests/torch_mirrors.py), randomize, import through
models.checkpoint_maps, and assert forward-pass equivalence — including
end-to-end through the fused detect graph against the numpy decode oracle.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from rs_face_detection_tpu.models.checkpoint_maps import (
    load_iresnet_state_dict,
    load_retinaface_state_dict,
    strip_module_prefix,
)

from torch_mirrors import IResNetMirror, RetinaFaceMirror, randomize_state_dict


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _to_jax(tree):
    return jax.tree.map(jnp.asarray, tree)


def _assert_close(got, expected, rtol=1e-3, err_msg=""):
    """allclose with atol scaled to the array magnitude.

    Deep randomized nets accumulate float error; elements near zero suffer
    catastrophic cancellation, so a fixed atol misfires.  A real layout error
    (wrong tensor/permutation) produces O(array-scale) differences, which this
    still catches."""
    scale = float(np.abs(expected).max()) or 1.0
    np.testing.assert_allclose(
        got, expected, rtol=rtol, atol=rtol * scale, err_msg=err_msg
    )


# ---------------------------------------------------------------------------
# ArcFace IResNet (insightface arcface_torch layout)
# ---------------------------------------------------------------------------


def test_iresnet50_import_forward_parity():
    from rs_face_detection_tpu.models.arcface import init_arcface

    mirror = randomize_state_dict(IResNetMirror("iresnet50"), seed=0)
    model, variables = init_arcface("iresnet50", 512, (112, 112), seed=1)
    new_vars = load_iresnet_state_dict(variables, _np_sd(mirror), "iresnet50")

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        expected = mirror(torch.from_numpy(x)).numpy()
    got = np.asarray(
        model.apply(_to_jax(new_vars), jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    )
    _assert_close(got, expected)


def test_iresnet_module_prefix_stripped():
    from rs_face_detection_tpu.models.arcface import init_arcface

    mirror = randomize_state_dict(IResNetMirror("iresnet18"), seed=3)
    sd = {f"module.{k}": v for k, v in _np_sd(mirror).items()}
    assert all(k.startswith("module.") for k in sd)
    model, variables = init_arcface("iresnet18", 512, (112, 112), seed=1)
    new_vars = load_iresnet_state_dict(variables, sd, "iresnet18")
    # spot-check one tensor really landed
    got = np.asarray(new_vars["params"]["stem_prelu"]["alpha"])
    np.testing.assert_array_equal(got, sd["module.prelu.weight"])


# ---------------------------------------------------------------------------
# RetinaFace (biubug6 Pytorch_Retinaface layout)
# ---------------------------------------------------------------------------


def _retinaface_parity(backbone, image_hw, seed):
    from rs_face_detection_tpu.models.retinaface import init_retinaface

    mirror = randomize_state_dict(RetinaFaceMirror(backbone), seed=seed)
    model, variables = init_retinaface(backbone, image_hw, seed=1)
    new_vars = load_retinaface_state_dict(
        variables, _np_sd(mirror), backbone, stem_s2d=model.uses_s2d_stem()
    )

    rng = np.random.default_rng(seed)
    h, w = image_hw[1], image_hw[0]
    x = rng.uniform(0, 255, (1, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        t_scores, t_bboxes, t_ldms = mirror(torch.from_numpy(x))
    out = model.apply(
        _to_jax(new_vars), jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
    )
    for level, stride in enumerate((8, 16, 32)):
        maps = out[stride]
        got_score = np.asarray(maps["score"]).reshape(1, -1)
        got_bbox = np.asarray(maps["bbox"]).reshape(1, -1, 4)
        got_ldm = np.asarray(maps["landmark"]).reshape(1, -1, 10)
        _assert_close(got_score, t_scores[level].numpy(), err_msg=f"score stride {stride}")
        _assert_close(got_bbox, t_bboxes[level].numpy(), err_msg=f"bbox stride {stride}")
        _assert_close(got_ldm, t_ldms[level].numpy(), err_msg=f"landmark stride {stride}")


def test_retinaface_mnet025_import_forward_parity():
    _retinaface_parity("mobilenet025", (128, 128), seed=0)


def test_retinaface_r50_import_forward_parity():
    """R50 exercises conv_s2d (7x7 stem -> s2d), torch maxpool padding, and
    the torchvision bottleneck layout."""
    _retinaface_parity("resnet50", (128, 128), seed=1)


def test_retinaface_import_end_to_end_detect():
    """Imported torch weights through the FUSED detect graph must reproduce
    the numpy oracle applied to the torch net's own outputs."""
    from test_detection import _np_decode_oracle

    from rs_face_detection_tpu.configs import RPN_ANCHOR_CFG, FaceDetectionConfig
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.ops.anchors import full_anchor_table
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.35,
        max_candidates=256,
        max_detections=200,
    )
    mirror = randomize_state_dict(RetinaFaceMirror("mobilenet025"), seed=7)
    model, variables = init_retinaface("mobilenet025", cfg.image_size, seed=1)
    new_vars = load_retinaface_state_dict(
        variables, _np_sd(mirror), "mobilenet025", stem_s2d=model.uses_s2d_stem()
    )
    det = RetinaFaceDetection(cfg, model=model, variables=_to_jax(new_vars))

    rng = np.random.default_rng(11)
    img_bgr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    boxes, kps = det(img_bgr)

    # Torch side: identical preprocess (BGR->RGB, raw pixel scale), then the
    # reference-order numpy decode oracle.
    x = img_bgr[:, :, ::-1].astype(np.float32).transpose(2, 0, 1)[None]
    with torch.no_grad():
        t_scores, t_bboxes, t_ldms = mirror(torch.from_numpy(x))
    anchors_np, level_info = full_anchor_table(
        cfg.image_size, RPN_ANCHOR_CFG, cfg.feat_strides
    )
    level_of_stride = {8: 0, 16: 1, 32: 2}
    level_maps = {}
    for stride, fh, fw, a in level_info:
        i = level_of_stride[stride]
        level_maps[stride] = {
            "score": t_scores[i].numpy().reshape(fh, fw, a),
            "bbox": t_bboxes[i].numpy().reshape(fh, fw, a * 4),
            "landmark": t_ldms[i].numpy().reshape(fh, fw, a * 10),
        }
    expected_det, expected_lms = _np_decode_oracle(
        level_maps, anchors_np, level_info, cfg
    )

    assert len(boxes) == len(expected_det)
    np.testing.assert_allclose(boxes, expected_det, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(kps, expected_lms, rtol=1e-3, atol=2e-3)


def test_strip_module_prefix_noop_without_prefix():
    sd = {"a.weight": np.zeros(1), "module.b": np.ones(1)}
    out = strip_module_prefix(sd)
    assert set(out) == {"a.weight", "b"}
