"""Parallelism: device meshes, sharded training, data-parallel serving."""

from .mesh import (
    data_sharding,
    fsdp_param_spec,
    make_mesh,
    pytree_shardings,
    replicated,
    shard_pytree_fsdp,
)
from .serving import DetectionServer, letterbox_host
from .train import TrainBatch, Trainer, TrainState, detection_loss, match_anchors

__all__ = [
    "data_sharding",
    "fsdp_param_spec",
    "make_mesh",
    "pytree_shardings",
    "replicated",
    "shard_pytree_fsdp",
    "DetectionServer",
    "letterbox_host",
    "TrainBatch",
    "Trainer",
    "TrainState",
    "detection_loss",
    "match_anchors",
]
