"""Tensor-parallel ViT sharding on the 8-device virtual CPU mesh.

Parity contract: the TP program is the single-device program up to floating
reduction order (residual stream stays replicated; only head/MLP-column
compute is distributed), so outputs must match to tight f32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from rs_face_detection_tpu.models.vit import init_vit
from rs_face_detection_tpu.parallel.mesh import make_mesh
from rs_face_detection_tpu.parallel.tp import (
    check_tp_compatible,
    make_tp_vit_fn,
    vit_tp_param_spec,
    vit_tp_shardings,
)


@pytest.fixture(scope="module")
def tiny_vit():
    return init_vit("clip_tiny_test", num_classes=2, image_size=(32, 32))


def test_param_spec_rules():
    mesh = make_mesh(8, model_parallel=2)

    def spec(*names, shape=(4, 4)):
        path = tuple(jax.tree_util.DictKey(n) for n in names)
        return vit_tp_param_spec(path, shape, mesh)

    assert spec("params", "block0", "attn", "query", "kernel") == P(None, "model", None)
    assert spec("params", "block0", "attn", "key", "bias") == P("model", None)
    assert spec("params", "block0", "attn", "out", "kernel") == P("model", None, None)
    assert spec("params", "block0", "attn", "out", "bias") == P()
    assert spec("params", "block0", "fc1", "kernel") == P(None, "model")
    assert spec("params", "block0", "fc1", "bias") == P("model")
    assert spec("params", "block0", "fc2", "kernel") == P("model", None)
    assert spec("params", "block0", "fc2", "bias") == P()
    assert spec("params", "block0", "ln1", "scale") == P()
    assert spec("params", "patchify", "kernel") == P()
    # model axis 1 -> fully replicated.
    mesh1 = make_mesh(8, model_parallel=1)
    path = tuple(jax.tree_util.DictKey(n) for n in ("params", "b", "fc1", "kernel"))
    assert vit_tp_param_spec(path, (4, 16), mesh1) == P()


def test_check_tp_compatible():
    mesh = make_mesh(8, model_parallel=2)
    check_tp_compatible(16, 4096, mesh)
    with pytest.raises(ValueError):
        check_tp_compatible(3, 4096, mesh)
    with pytest.raises(ValueError):
        check_tp_compatible(16, 4095, mesh)


def test_fused_attention_rejected():
    from rs_face_detection_tpu.models.vit import ViT

    model = ViT(config="clip_tiny_test", fused_attention=True)
    mesh = make_mesh(8, model_parallel=2)
    with pytest.raises(ValueError, match="fused_attention"):
        make_tp_vit_fn(model, {"params": {}}, mesh)


def test_tp_forward_parity(tiny_vit):
    model, variables = tiny_vit
    mesh = make_mesh(8, model_parallel=2)  # DP 4 x TP 2

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))

    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, imgs)
    fwd, sharded_vars = make_tp_vit_fn(model, variables, mesh)
    out = fwd(sharded_vars, imgs)

    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    # The parameters really are distributed: a sharded kernel's per-device
    # shard is half the full row/column count.
    qk = sharded_vars["params"]["block0"]["attn"]["query"]["kernel"]
    db = qk.sharding.shard_shape(qk.shape)
    assert db[1] == qk.shape[1] // 2


def test_tp_shardings_cover_all_params(tiny_vit):
    model, variables = tiny_vit
    mesh = make_mesh(8, model_parallel=2)
    shardings = vit_tp_shardings(variables, mesh)
    flat = jax.tree_util.tree_leaves(shardings)
    assert len(flat) == len(jax.tree_util.tree_leaves(variables))
    sharded = [s for s in flat if s.spec != P()]
    # 2 blocks x (3 qkv kernels + 3 qkv biases + out kernel + fc1 kernel +
    # fc1 bias + fc2 kernel) = 10 sharded leaves per block.
    assert len(sharded) == 2 * 10


def test_tp_vit_aot_roundtrip(tiny_vit):
    """Sharded AOT artifact: export the TP program, re-hydrate, parity."""
    from rs_face_detection_tpu.runtime.aot import export_tp_vit, load_tp_vit

    model, variables = tiny_vit
    mesh = make_mesh(8, model_parallel=2)
    blob = export_tp_vit(model, variables, mesh, batch_size=8,
                         image_size=(32, 32))
    assert isinstance(blob, bytes) and len(blob) > 1000

    loaded = load_tp_vit(blob, mesh)
    assert loaded.meta["mesh_shape"] == {"data": 4, "model": 2}
    svars = loaded.prepare_variables(variables)
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    out = loaded(svars, imgs)
    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, imgs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # wrong-shape mesh refused
    with pytest.raises(ValueError, match="mesh"):
        load_tp_vit(blob, make_mesh(8, model_parallel=1))
    # indivisible batch refused at export
    with pytest.raises(ValueError, match="divisible"):
        export_tp_vit(model, variables, mesh, batch_size=3, image_size=(32, 32))
