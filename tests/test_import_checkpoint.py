"""Public-checkpoint import CLI + registry pickup (VERDICT r2 #4).

The CLI (tools/import_checkpoint.py) must take any supported public .pth and
produce a self-describing registry .npz that `registry.load()` serves — the
model-repository last mile the reference delegated to Triton
(face_pipeline/pipeline.rs:89-116).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from rs_face_detection_tpu.models.checkpoint_io import (
    build_from_meta,
    detect_kind,
    import_state_dict,
    iresnet_depth_from_state_dict,
    load_imported,
    maybe_serve_checkpoint,
    save_imported,
)
from rs_face_detection_tpu.models.registry import _flatten

from torch_mirrors import (
    IResNetMirror,
    MiniFASNetMirror,
    ResNet18ClassifierMirror,
    RetinaFaceMirror,
    randomize_state_dict,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_detect_kind_fingerprints():
    assert (
        detect_kind(_np_sd(RetinaFaceMirror("mobilenet025")))
        == "retinaface_mnet025"
    )
    assert (
        detect_kind(_np_sd(RetinaFaceMirror("resnet50"))) == "retinaface_resnet50"
    )
    sd18 = _np_sd(IResNetMirror("iresnet18"))
    assert detect_kind(sd18) == "iresnet"
    assert iresnet_depth_from_state_dict(sd18) == "iresnet18"
    assert detect_kind(_np_sd(MiniFASNetMirror(width=8))) == "minifas"
    assert detect_kind(_np_sd(ResNet18ClassifierMirror(3))) == "resnet18"
    # DataParallel prefixes must not confuse detection.
    prefixed = {f"module.{k}": v for k, v in sd18.items()}
    assert detect_kind(prefixed) == "iresnet"
    with pytest.raises(ValueError, match="unrecognized"):
        detect_kind({"totally.unknown.weight": np.zeros(3)})


def test_cli_roundtrip_resnet18(tmp_path):
    """pth -> CLI -> npz -> build_from_meta reproduces the direct import."""
    from import_checkpoint import main

    mirror = randomize_state_dict(ResNet18ClassifierMirror(4), seed=3)
    src = str(tmp_path / "quality.pth")
    torch.save(mirror.state_dict(), src)
    out = str(tmp_path / "face_quality.npz")
    assert main([src, out, "--image-size", "64x64"]) == 0

    loaded, meta = load_imported(out)
    assert meta == {
        "family": "resnet18",
        "num_outputs": 4,
        "softmax": True,
        "image_size": [64, 64],
    }
    # The stored tree must match a direct in-process import bit-for-bit.
    _, direct, _ = import_state_dict(
        _np_sd(mirror), kind="resnet18", image_size=(64, 64)
    )
    direct_flat = _flatten(jax.tree.map(np.asarray, direct))
    loaded_flat = _flatten(loaded)
    assert set(direct_flat) == set(loaded_flat)
    for k in direct_flat:
        np.testing.assert_array_equal(direct_flat[k], loaded_flat[k], err_msg=k)
    # Architecture reconstructs from meta alone.
    model, template = build_from_meta(meta)
    assert _flatten(jax.tree.map(np.asarray, template)).keys() == loaded_flat.keys()


def test_cli_repository_mode(tmp_path):
    """pth -> CLI --repository -> Triton-layout tree a registry can serve."""
    from import_checkpoint import main

    mirror = randomize_state_dict(ResNet18ClassifierMirror(4), seed=5)
    src = str(tmp_path / "quality.pth")
    torch.save(mirror.state_dict(), src)
    repo = str(tmp_path / "models")
    assert main(
        [src, "face_quality", "--image-size", "64x64", "--repository", repo]
    ) == 0
    assert os.path.exists(os.path.join(repo, "face_quality", "config.pbtxt"))
    assert os.path.exists(
        os.path.join(repo, "face_quality", "1", "model.npz")
    )

    from rs_face_detection_tpu.models.registry import ModelRegistry
    from rs_face_detection_tpu.runtime.repository import (
        attach_repository_builders,
    )

    reg = ModelRegistry()
    assert attach_repository_builders(reg, repo) == ["face_quality"]
    reg.load("face_quality")
    assert reg.spec("face_quality").input_shape == (64, 64, 3)


def test_minifas_roundtrip_spec_reconstruction(tmp_path):
    """MiniFAS spec (derived from shapes) survives the npz meta round trip."""
    mirror = randomize_state_dict(MiniFASNetMirror(width=8, se=True), seed=1)
    _, variables, meta = import_state_dict(_np_sd(mirror), kind="minifas")
    assert meta["input_hw"] == [80, 80]
    path = str(tmp_path / "miniFAS_4.npz")
    save_imported(path, variables, meta)
    loaded, meta2 = load_imported(path)
    model, template = build_from_meta(meta2)
    t_flat = _flatten(jax.tree.map(np.asarray, template))
    l_flat = _flatten(loaded)
    assert set(t_flat) == set(l_flat)
    for k in t_flat:
        assert np.shape(t_flat[k]) == np.shape(l_flat[k]), k


def test_registry_serves_imported_checkpoint(tmp_path, monkeypatch):
    """RSFD_CHECKPOINT_DIR/<model_name>.npz wins over seeded random init."""
    from rs_face_detection_tpu.models.registry import (
        ModelRegistry,
        _attach_standard_builders,
    )

    mirror = randomize_state_dict(ResNet18ClassifierMirror(4), seed=9)
    _, variables, meta = import_state_dict(
        _np_sd(mirror), kind="resnet18", image_size=(112, 112)
    )
    save_imported(str(tmp_path / "face_quality.npz"), variables, meta)
    monkeypatch.setenv("RSFD_CHECKPOINT_DIR", str(tmp_path))

    registry = ModelRegistry()
    _attach_standard_builders(registry)
    model, served_vars = registry.get("face_quality")
    got = np.asarray(served_vars["params"]["fc"]["kernel"])
    want = _np_sd(mirror)["fc.weight"].T
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # The serving role forces probabilities regardless of import-time flag.
    assert model.softmax is True


def test_registry_rejects_wrong_family(tmp_path, monkeypatch):
    mirror = randomize_state_dict(ResNet18ClassifierMirror(2), seed=2)
    _, variables, meta = import_state_dict(_np_sd(mirror), kind="resnet18")
    save_imported(str(tmp_path / "face_identification.npz"), variables, meta)
    monkeypatch.setenv("RSFD_CHECKPOINT_DIR", str(tmp_path))
    with pytest.raises(ValueError, match="expects 'iresnet'"):
        maybe_serve_checkpoint("face_identification", expect_family="iresnet")


def test_plain_npz_without_meta_rejected(tmp_path, monkeypatch):
    """save_variables files (no __meta__) can't rebuild an architecture."""
    from rs_face_detection_tpu.models.registry import save_variables

    save_variables(
        str(tmp_path / "face_quality.npz"), {"params": {"w": np.zeros(3)}}
    )
    monkeypatch.setenv("RSFD_CHECKPOINT_DIR", str(tmp_path))
    with pytest.raises(ValueError, match="__meta__"):
        maybe_serve_checkpoint("face_quality")


def test_loader_wrapped_and_torchscript(tmp_path):
    """Wrapper dicts with loose tensors unwrap; TorchScript archives load."""
    from import_checkpoint import load_torch_state_dict

    mirror = randomize_state_dict(ResNet18ClassifierMirror(2), seed=5)
    # {"state_dict": ..., "step": tensor} — the wrapper's loose tensor must
    # not defeat the unwrap (review finding).
    src = str(tmp_path / "wrapped.pth")
    torch.save(
        {"state_dict": mirror.state_dict(), "step": torch.tensor(5000)}, src
    )
    sd = load_torch_state_dict(src)
    assert "conv1.weight" in sd and "step" not in sd

    # Official-CLIP-style TorchScript archive (torch.jit.save).
    class Tiny(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = torch.nn.Linear(4, 2)

        def forward(self, x):
            return self.lin(x)

    jit_src = str(tmp_path / "scripted.pt")
    torch.jit.save(torch.jit.script(Tiny()), jit_src)
    sd = load_torch_state_dict(jit_src)
    assert "lin.weight" in sd and sd["lin.weight"].shape == (2, 4)

    with pytest.raises(ValueError, match="state_dict"):
        bad = str(tmp_path / "scalars.pth")
        torch.save({"epoch": 3, "note": "hi"}, bad)
        load_torch_state_dict(bad)


def test_eval_and_export_accept_imported_retinaface(tmp_path):
    """The import -> eval/export last mile: a CLI .npz (with __meta__) must
    build a working detector in eval_wider and export through
    export_model's checkpoint path (review findings: the raw variables
    loaders kept __meta__ and crashed flax apply)."""
    from import_checkpoint import main as import_main

    mirror = randomize_state_dict(RetinaFaceMirror("mobilenet025"), seed=7)
    src = str(tmp_path / "mnet.pth")
    torch.save(mirror.state_dict(), src)
    out = str(tmp_path / "face_detection_retina.npz")
    assert import_main([src, out, "--image-size", "64x64"]) == 0

    import argparse

    from eval_wider import build_detector

    args = argparse.Namespace(
        detector="retinaface", backbone="mobilenet025", size=64,
        checkpoint=out,
    )
    det = build_detector(args)
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    boxes, kps = det(img)  # must not raise ApplyScopeInvalidVariablesTypeError
    assert np.asarray(boxes).shape[-1] == 5

    from export_model import main as export_main

    artifact = str(tmp_path / "det.rsfdx")
    assert export_main is not None
    import sys as _sys

    argv = [
        artifact, "--backbone", "mobilenet025", "--size", "64x64",
        "--batch", "2", "--checkpoint", out, "--dtype", "float32",
    ]
    old = _sys.argv
    _sys.argv = ["export_model.py"] + argv
    try:
        assert export_main() == 0
    finally:
        _sys.argv = old
    assert os.path.getsize(artifact) > 1000
