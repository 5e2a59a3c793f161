"""Device mesh construction and sharding rules.

The reference's only scale-out story was a gRPC hop to a Triton server
(SURVEY.md §2 parallelism table); here scale-out is native: a
jax.sharding.Mesh over ("data", "model") axes, batch sharded over "data"
(data parallelism) and parameters sharded over "model" (FSDP-style ZeRO
sharding).  XLA GSPMD inserts the all-gathers/psums over ICI.

For the CNN detectors, tensor/pipeline/sequence/expert parallelism
intentionally have no mapping: DP saturates ICI long before TP would pay
for itself (the reference has no analog either — SURVEY.md §2).  The one
TP-shaped model family — the ViT-L/14 eKYC FAS graphs — gets real
Megatron-style tensor parallelism in parallel/tp.py over this same
("data", "model") mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (DCN) for pod-slice deployments.

    Thin wrapper over jax.distributed.initialize: on Cloud TPU pods the
    arguments auto-detect from the metadata environment; pass them explicitly
    elsewhere.  After this, jax.devices() spans all hosts and make_mesh()
    builds cross-host meshes whose collectives ride ICI within a slice and
    DCN across slices.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Build a ("data", "model") mesh over the first n devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for inputs/outputs (leading dim over "data")."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_spec(shape: Sequence[int], mesh: Mesh) -> P:
    """ZeRO-style parameter sharding rule.

    Shard the largest axis divisible by the "model" axis size; replicate
    parameters too small to shard.  Keeps every conv kernel's layout valid
    while distributing optimizer/parameter memory across the mesh.
    """
    model = mesh.shape["model"]
    if model == 1:
        return P()
    candidates = [
        (dim, axis) for axis, dim in enumerate(shape) if dim % model == 0 and dim >= model
    ]
    if not candidates:
        return P()
    _, axis = max(candidates)
    spec = [None] * len(shape)
    spec[axis] = "model"
    return P(*spec)


def shard_pytree_fsdp(tree, mesh: Mesh):
    """Place a pytree on the mesh under the FSDP rule; returns sharded tree."""
    def place(x):
        spec = fsdp_param_spec(np.shape(x), mesh)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def pytree_shardings(tree, mesh: Mesh):
    """NamedSharding pytree matching shard_pytree_fsdp placements."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, fsdp_param_spec(np.shape(x), mesh)), tree
    )
