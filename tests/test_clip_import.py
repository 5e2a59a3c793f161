"""OpenAI CLIP visual-tower import map: torch-mirror forward parity
(VERDICT r2 #5a).

The eKYC FAS stages are CLIP ViT-L/14 models (ekyc config.rs:95-138); a
public CLIP checkpoint (visual.* keys, packed qkv attention, QuickGELU)
must load structurally and reproduce the torch forward.  Tests run the
clip_tiny_test config (same structure, small widths) for CPU speed; the
full-size clip_l14 graph is proven by the slow-marked test in
tests/test_ekyc.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from rs_face_detection_tpu.models.checkpoint_io import (
    build_from_meta,
    detect_kind,
    import_state_dict,
)
from rs_face_detection_tpu.models.clip_import import (
    clip_config_from_state_dict,
    import_clip_visual,
    load_clip_visual_state_dict,
)
from rs_face_detection_tpu.models.vit import init_vit

from torch_mirrors import CLIPVisualMirror, randomize_state_dict


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def mirror():
    return randomize_state_dict(
        CLIPVisualMirror(patch=16, width=64, depth=2, heads=2, proj_dim=32,
                         input_res=32, num_classes=2),
        seed=11,
    )


def test_detect_and_config(mirror):
    sd = _np_sd(mirror)
    assert detect_kind(sd) == "clip_visual"
    assert clip_config_from_state_dict(sd) == "clip_tiny_test"


def test_forward_parity(mirror):
    sd = _np_sd(mirror)
    model, variables, meta = import_clip_visual(
        sd, num_classes=2, image_size=(32, 32), softmax=False
    )
    assert meta["config"] == "clip_tiny_test"

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.asarray(x)
        )
    )
    with torch.no_grad():
        want = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_head_optional_and_strict(mirror):
    sd = _np_sd(mirror)
    model, variables = init_vit("clip_tiny_test", 2, (32, 32))
    # Without a head, the trunk loads and the seeded head stays.
    trunk_only = {k: v for k, v in sd.items() if not k.startswith("head.")}
    out = load_clip_visual_state_dict(variables, trunk_only, "clip_tiny_test")
    np.testing.assert_array_equal(
        np.asarray(out["params"]["head"]["kernel"]),
        np.asarray(variables["params"]["head"]["kernel"]),
    )
    # Text-tower keys are ignored; unknown visual keys fail strict mode.
    ok = dict(trunk_only, **{"transformer.resblocks.0.ln_1.weight": np.zeros(4)})
    load_clip_visual_state_dict(variables, ok, "clip_tiny_test")
    bad = dict(trunk_only, **{"visual.unknown.weight": np.zeros(4)})
    with pytest.raises(ValueError, match="unconsumed visual keys"):
        load_clip_visual_state_dict(variables, bad, "clip_tiny_test")


def test_checkpoint_io_roundtrip(mirror, tmp_path):
    from rs_face_detection_tpu.models.checkpoint_io import (
        load_imported,
        save_imported,
    )
    from rs_face_detection_tpu.models.registry import _flatten

    sd = _np_sd(mirror)
    model, variables, meta = import_state_dict(sd, kind="auto", image_size=(32, 32))
    assert meta["family"] == "clip_vit"
    path = str(tmp_path / "fas.npz")
    save_imported(path, variables, meta)
    loaded, meta2 = load_imported(path)
    model2, template = build_from_meta(meta2)
    t_flat = _flatten(jax.tree.map(np.asarray, template))
    l_flat = _flatten(loaded)
    assert set(t_flat) == set(l_flat)
    for k in t_flat:
        assert np.shape(t_flat[k]) == np.shape(l_flat[k]), k
