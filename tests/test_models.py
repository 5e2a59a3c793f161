"""Shape/contract tests for the model zoo with fake weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_retinaface_mobilenet_output_contract():
    from rs_face_detection_tpu.models.retinaface import init_retinaface

    model, variables = init_retinaface("mobilenet025", (128, 128))
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    out = model.apply(variables, x, train=False)
    assert set(out.keys()) == {8, 16, 32}
    for stride, maps in out.items():
        fh = fw = 128 // stride
        assert maps["score"].shape == (2, fh, fw, 2)
        assert maps["bbox"].shape == (2, fh, fw, 8)
        assert maps["landmark"].shape == (2, fh, fw, 20)
        s = np.asarray(maps["score"])
        assert (s >= 0).all() and (s <= 1).all()  # softmax probabilities


def test_retinaface_raw_logits_for_training():
    from rs_face_detection_tpu.models.retinaface import init_retinaface

    model, variables = init_retinaface("mobilenet025", (64, 64))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = model.apply(variables, x, train=False, raw=True)
    assert out[32]["score"].shape == (1, 2, 2, 2, 2)  # (B, H, W, A, 2) logits


def test_retinaface_resnet50_channels():
    from rs_face_detection_tpu.models.resnet import ResNet50

    model = ResNet50()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    c3, c4, c5 = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert c3.shape == (1, 8, 8, 512)
    assert c4.shape == (1, 4, 4, 1024)
    assert c5.shape == (1, 2, 2, 2048)


def test_arcface_embedding_shape():
    from rs_face_detection_tpu.models.arcface import init_arcface

    model, variables = init_arcface("iresnet18", 512, (112, 112))
    emb = model.apply(variables, jnp.zeros((3, 112, 112, 3)), train=False)
    assert emb.shape == (3, 512)
    assert np.isfinite(np.asarray(emb)).all()


def test_small_cnn_heads():
    from rs_face_detection_tpu.models.heads import init_small_cnn

    quality, qvars = init_small_cnn(4, (112, 112))
    probs = quality.apply(qvars, jnp.zeros((2, 112, 112, 3)), train=False)
    assert probs.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(probs).sum(axis=1), 1.0, rtol=1e-5)

    fqa, fvars = init_small_cnn(1, (112, 112), softmax=False)
    score = fqa.apply(fvars, jnp.zeros((1, 112, 112, 3)), train=False)
    assert score.shape == (1, 1)


def test_registry_lifecycle_and_statistics():
    from rs_face_detection_tpu.models.heads import init_small_cnn
    from rs_face_detection_tpu.models.registry import (
        ModelRegistry,
        ModelSpec,
    )

    reg = ModelRegistry()

    def builder():
        model, variables = init_small_cnn(3, (32, 32))
        return (
            ModelSpec("toy", (32, 32, 3), "(B, 3) probs"),
            model,
            variables,
        )

    reg.register_builder("toy", builder)
    assert reg.index() == [{"name": "toy", "state": "UNAVAILABLE"}]
    assert not reg.model_ready("toy")

    out = reg.infer("toy", jnp.zeros((2, 32, 32, 3)), train=False)  # lazy load
    assert out.shape == (2, 3)
    assert reg.model_ready("toy")
    stats = reg.statistics("toy")
    assert stats.execution_count == 1
    assert stats.inference_count == 2
    assert stats.cumulative_duration_s > 0
    assert stats.batch_size_counts == {2: 1}  # Triton batch_stats analog
    # the snapshot is detached from live mutation
    reg.infer("toy", jnp.zeros((2, 32, 32, 3)), train=False)
    assert stats.batch_size_counts == {2: 1}
    assert reg.statistics("toy").batch_size_counts == {2: 2}
    # memory-usage analog: f32 params -> 4 bytes/element, nonzero
    mem = reg.memory_usage_bytes("toy")
    import jax

    n_params = sum(
        int(np.prod(np.shape(x)))
        for x in jax.tree_util.tree_leaves(reg.variables("toy"))
    )
    assert mem == 4 * n_params > 0

    reg.unload("toy")
    assert not reg.model_ready("toy")
    assert reg.server_live() and reg.server_ready()


def test_checkpoint_roundtrip(tmp_path):
    from rs_face_detection_tpu.models.heads import init_small_cnn
    from rs_face_detection_tpu.models.registry import (
        load_variables,
        save_variables,
    )

    model, variables = init_small_cnn(4, (32, 32), seed=7)
    path = str(tmp_path / "ckpt.npz")
    save_variables(path, variables)
    restored = load_variables(path)

    x = jnp.ones((1, 32, 32, 3))
    out1 = model.apply(variables, x, train=False)
    out2 = model.apply(restored, x, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


def test_s2d_stem_equivalence():
    """space-to-depth 4x4 stem == 7x7/s2 pad-3 (torch) stem with converted weights."""
    import flax.linen as nn

    from rs_face_detection_tpu.models.import_weights import (
        s2d_stem_padding,
        stem7x7_to_s2d,
    )
    from rs_face_detection_tpu.models.layers import space_to_depth

    rng = np.random.default_rng(0)
    w7 = rng.normal(0, 0.1, (7, 7, 3, 8)).astype(np.float32)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)

    conv7 = nn.Conv(
        8, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False
    )
    ref = conv7.apply({"params": {"kernel": jnp.asarray(w7)}}, jnp.asarray(x))

    w4 = stem7x7_to_s2d(w7)
    assert s2d_stem_padding(7) == ((2, 1), (2, 1))
    conv4 = nn.Conv(8, (4, 4), padding=((2, 1), (2, 1)), use_bias=False)
    got = conv4.apply(
        {"params": {"kernel": jnp.asarray(w4)}},
        space_to_depth(jnp.asarray(x), 2),
    )
    assert got.shape == ref.shape == (2, 32, 32, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_s2d_stem_matches_torch_conv():
    """The s2d stem bit-matches an actual torch Conv2d(7, stride=2, padding=3)."""
    import flax.linen as nn

    torch = pytest.importorskip("torch")

    from rs_face_detection_tpu.models.import_weights import (
        stem7x7_to_s2d,
        torch_conv_to_flax,
    )
    from rs_face_detection_tpu.models.layers import space_to_depth

    tconv = torch.nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        expected = tconv(torch.from_numpy(x)).numpy()

    w4 = stem7x7_to_s2d(torch_conv_to_flax(tconv.weight.detach().numpy()))
    conv4 = nn.Conv(8, (4, 4), padding=((2, 1), (2, 1)), use_bias=False)
    got = conv4.apply(
        {"params": {"kernel": jnp.asarray(w4)}},
        space_to_depth(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 2),
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_resnet50_s2d_stem_shapes_unchanged():
    from rs_face_detection_tpu.models.resnet import ResNet50

    model = ResNet50(stem_space_to_depth=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    c3, c4, c5 = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert c3.shape == (1, 8, 8, 512)
    assert c5.shape == (1, 2, 2, 2048)
    # Stem kernel really is the 4x4 x 12-channel form.
    assert variables["params"]["stem"]["Conv_0"]["kernel"].shape == (4, 4, 12, 64)


def test_s2d_stem_equivalence_3x3():
    """2x2 s2d stem == 3x3/s2 stem with converted weights (MobileNet case)."""
    import flax.linen as nn

    from rs_face_detection_tpu.models.import_weights import stem_to_s2d
    from rs_face_detection_tpu.models.layers import space_to_depth

    rng = np.random.default_rng(1)
    w3 = rng.normal(0, 0.1, (3, 3, 3, 8)).astype(np.float32)
    x = rng.normal(0, 1, (2, 64, 48, 3)).astype(np.float32)

    conv3 = nn.Conv(
        8, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False
    )
    ref = conv3.apply({"params": {"kernel": jnp.asarray(w3)}}, jnp.asarray(x))

    w2 = stem_to_s2d(w3)
    assert w2.shape == (2, 2, 12, 8)
    conv2 = nn.Conv(8, (2, 2), padding=((1, 0), (1, 0)), use_bias=False)
    got = conv2.apply(
        {"params": {"kernel": jnp.asarray(w2)}},
        space_to_depth(jnp.asarray(x), 2),
    )
    assert got.shape == ref.shape == (2, 32, 24, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_s2d_stem_odd_inputs_exact():
    """Odd-sized inputs: s2d stems remain exactly equal to the classic convs."""
    import flax.linen as nn

    from rs_face_detection_tpu.models.import_weights import (
        s2d_stem_padding,
        stem_to_s2d,
    )
    from rs_face_detection_tpu.models.layers import space_to_depth

    rng = np.random.default_rng(2)
    for k in (3, 7):
        p = k // 2
        w = rng.normal(0, 0.1, (k, k, 3, 8)).astype(np.float32)
        x = rng.normal(0, 1, (1, 65, 47, 3)).astype(np.float32)

        conv = nn.Conv(
            8, (k, k), strides=(2, 2), padding=((p, p), (p, p)), use_bias=False
        )
        ref = conv.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))

        # High-side zero pad to even, then the even-case s2d machinery.
        xp = jnp.pad(jnp.asarray(x), ((0, 0), (0, 1), (0, 1), (0, 0)))
        conv_s = nn.Conv(
            8, (2 if k == 3 else 4,) * 2, padding=s2d_stem_padding(k), use_bias=False
        )
        got = conv_s.apply(
            {"params": {"kernel": jnp.asarray(stem_to_s2d(w))}},
            space_to_depth(xp, 2),
        )
        assert got.shape == ref.shape, (k, got.shape, ref.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5,
            err_msg=f"k={k}",
        )


def test_conv_s2d_import_kind():
    """apply_mapping 'conv_s2d' routes a torch stem into the s2d model layout."""
    import torch

    from rs_face_detection_tpu.models.import_weights import apply_mapping
    from rs_face_detection_tpu.models.mobilenet import MobileNetV1_025

    model = MobileNetV1_025(stem_space_to_depth=True)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    tconv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    state_dict = {"stage1.0.weight": tconv.weight.detach().numpy()}
    new_vars, unconsumed = apply_mapping(
        variables,
        state_dict,
        {"params/conv1/Conv_0/kernel": ("stage1.0", "conv_s2d")},
    )
    assert unconsumed == []
    assert np.asarray(new_vars["params"]["conv1"]["Conv_0"]["kernel"]).shape == (
        2,
        2,
        12,
        8,
    )
