"""Sharded train-state checkpoint save/restore round trip."""

import jax
import numpy as np
import pytest

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.parallel.checkpoint import (
    latest_step,
    restore_train_state,
    save_train_state,
)
from rs_face_detection_tpu.parallel.mesh import make_mesh
from rs_face_detection_tpu.parallel.train import Trainer


def test_checkpoint_roundtrip_resumes_training(tmp_path):
    mesh = make_mesh(8, model_parallel=2)
    cfg = FaceDetectionConfig(image_size=(64, 64))
    trainer = Trainer(mesh, cfg, learning_rate=1e-3)
    state = trainer.init_state(seed=0)
    step_fn = trainer.make_train_step()
    batch = trainer.make_batch(mesh.shape["data"], max_faces=4, seed=0)

    state, m1 = step_fn(state, batch)
    path = save_train_state(str(tmp_path), state)
    assert latest_step(str(tmp_path)) == 1

    # Continue training from the restored state; must match continuing from
    # the in-memory state exactly.
    template = trainer.init_state(seed=0)
    restored = restore_train_state(str(tmp_path), template)
    assert int(restored.step) == 1

    cont_mem, mm = step_fn(state, batch)
    batch2 = trainer.make_batch(mesh.shape["data"], max_faces=4, seed=0)
    cont_ckpt, mc = step_fn(restored, batch2)
    np.testing.assert_allclose(
        float(mm["loss"]), float(mc["loss"]), rtol=1e-5
    )

    leaves_mem = jax.tree.leaves(jax.device_get(cont_mem.params))
    leaves_ckpt = jax.tree.leaves(jax.device_get(cont_ckpt.params))
    for a, b in zip(leaves_mem, leaves_ckpt):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_restore_missing_raises(tmp_path):
    mesh = make_mesh(8)
    trainer = Trainer(mesh, FaceDetectionConfig(image_size=(64, 64)))
    template = trainer.init_state(seed=0)
    with pytest.raises(FileNotFoundError):
        restore_train_state(str(tmp_path), template)
    assert latest_step(str(tmp_path / "nope")) is None
