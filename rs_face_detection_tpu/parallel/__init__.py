"""Parallelism: device meshes, sharded training, data-parallel serving."""

from .checkpoint import latest_step, restore_train_state, save_train_state
from .mesh import (
    data_sharding,
    initialize_distributed,
    fsdp_param_spec,
    make_mesh,
    pytree_shardings,
    replicated,
    shard_pytree_fsdp,
)
from .serving import DetectionServer, letterbox_host
from .tp import make_tp_vit_fn, vit_tp_param_spec, vit_tp_shardings
from .train import TrainBatch, Trainer, TrainState, detection_loss, match_anchors

__all__ = [
    "data_sharding",
    "initialize_distributed",
    "latest_step",
    "restore_train_state",
    "save_train_state",
    "fsdp_param_spec",
    "make_mesh",
    "pytree_shardings",
    "replicated",
    "shard_pytree_fsdp",
    "DetectionServer",
    "letterbox_host",
    "make_tp_vit_fn",
    "vit_tp_param_spec",
    "vit_tp_shardings",
    "TrainBatch",
    "Trainer",
    "TrainState",
    "detection_loss",
    "match_anchors",
]
