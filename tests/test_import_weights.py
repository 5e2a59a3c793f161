"""Torch->flax weight conversion: numerics verified against torch CPU."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn
import jax
import jax.numpy as jnp

from rs_face_detection_tpu.models.import_weights import (
    apply_mapping,
    torch_bn_to_flax,
    torch_conv_to_flax,
    torch_dense_to_flax,
)


def _rand_input(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape).astype(np.float32)


def test_conv_conversion_numerics():
    tconv = torch.nn.Conv2d(8, 16, 3, padding=1, bias=False)
    x = _rand_input((2, 8, 12, 12))
    with torch.no_grad():
        expected = tconv(torch.from_numpy(x)).numpy()

    fconv = nn.Conv(16, (3, 3), padding="SAME", use_bias=False)
    kernel = torch_conv_to_flax(tconv.weight.detach().numpy())
    out = fconv.apply(
        {"params": {"kernel": jnp.asarray(kernel)}},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_depthwise_conv_conversion_numerics():
    tconv = torch.nn.Conv2d(8, 8, 3, padding=1, groups=8, bias=False)
    x = _rand_input((1, 8, 10, 10), seed=1)
    with torch.no_grad():
        expected = tconv(torch.from_numpy(x)).numpy()

    fconv = nn.Conv(8, (3, 3), padding="SAME", feature_group_count=8, use_bias=False)
    kernel = torch_conv_to_flax(tconv.weight.detach().numpy())
    out = fconv.apply(
        {"params": {"kernel": jnp.asarray(kernel)}},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_bn_conversion_numerics():
    tbn = torch.nn.BatchNorm2d(6)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(_rand_input((6,), 2)))
        tbn.bias.copy_(torch.from_numpy(_rand_input((6,), 3)))
        tbn.running_mean.copy_(torch.from_numpy(_rand_input((6,), 4)))
        tbn.running_var.copy_(torch.from_numpy(np.abs(_rand_input((6,), 5)) + 0.5))
    tbn.eval()
    x = _rand_input((2, 6, 5, 5), seed=6)
    with torch.no_grad():
        expected = tbn(torch.from_numpy(x)).numpy()

    conv = torch_bn_to_flax(
        tbn.weight.detach().numpy(),
        tbn.bias.detach().numpy(),
        tbn.running_mean.numpy(),
        tbn.running_var.numpy(),
    )
    fbn = nn.BatchNorm(use_running_average=True, epsilon=1e-5, momentum=0.9)
    out = fbn.apply(
        {
            "params": conv["params"],
            "batch_stats": conv["batch_stats"],
        },
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_dense_conversion_numerics():
    tfc = torch.nn.Linear(12, 7)
    x = _rand_input((3, 12), seed=7)
    with torch.no_grad():
        expected = tfc(torch.from_numpy(x)).numpy()

    fd = nn.Dense(7)
    out = fd.apply(
        {
            "params": {
                "kernel": jnp.asarray(torch_dense_to_flax(tfc.weight.detach().numpy())),
                "bias": jnp.asarray(tfc.bias.detach().numpy()),
            }
        },
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_apply_mapping_roundtrip_convbn():
    """Full ConvBN module import: torch conv+bn == flax ConvBN after mapping."""
    from rs_face_detection_tpu.models.layers import ConvBN

    tconv = torch.nn.Conv2d(4, 8, 3, padding=1, bias=False)
    tbn = torch.nn.BatchNorm2d(8)
    with torch.no_grad():
        tbn.running_mean.copy_(torch.from_numpy(_rand_input((8,), 8)))
        tbn.running_var.copy_(torch.from_numpy(np.abs(_rand_input((8,), 9)) + 0.5))
    tbn.eval()

    state_dict = {
        "stage.conv.weight": tconv.weight.detach().numpy(),
        "stage.bn.weight": tbn.weight.detach().numpy(),
        "stage.bn.bias": tbn.bias.detach().numpy(),
        "stage.bn.running_mean": tbn.running_mean.numpy(),
        "stage.bn.running_var": tbn.running_var.numpy(),
        "stage.bn.num_batches_tracked": np.array(0),
        "unused.weight": np.zeros((1, 1, 1, 1), np.float32),
    }

    module = ConvBN(8, (3, 3), act=None)
    x = _rand_input((1, 4, 6, 6), seed=10)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = module.init(jax.random.PRNGKey(0), x_nhwc)

    mapping = {
        "params/Conv_0/kernel": ("stage.conv", "conv"),
        "params/BatchNorm_0": ("stage.bn", "bn"),
    }
    new_vars, unconsumed = apply_mapping(variables, state_dict, mapping)
    assert unconsumed == ["unused.weight"]

    with torch.no_grad():
        expected = tbn(tconv(torch.from_numpy(x))).numpy()
    out = module.apply(jax.tree.map(jnp.asarray, new_vars), x_nhwc)
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_apply_mapping_shape_mismatch_raises():
    from rs_face_detection_tpu.models.layers import ConvBN

    module = ConvBN(8, (3, 3), act=None)
    x = jnp.zeros((1, 6, 6, 4))
    variables = module.init(jax.random.PRNGKey(0), x)
    bad = {"stage.conv.weight": np.zeros((8, 5, 3, 3), np.float32)}
    with pytest.raises(ValueError, match="shape"):
        apply_mapping(variables, bad, {"params/Conv_0/kernel": ("stage.conv", "conv")})
