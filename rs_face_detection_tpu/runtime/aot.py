"""Ahead-of-time serving artifacts: export the fused detect graph to disk.

The reference deploys COMPILED models from a Triton model repository
(pipeline.rs:89-116 loads by name; the server owns artifacts).  This module
gives the framework the same deployment shape on TPU: `export_detector`
serializes the whole batched serving computation — preprocess, dense
packed front, backbone/FPN/SSH, decode, NMS — as portable StableHLO via
jax.export, and `load_detector` re-hydrates it WITHOUT the model Python
(no flax tracing, no fold re-derivation; XLA compiles the serialized
program directly for the target).

Artifact layout (single .npz):
    meta         json: batch size, image size, layout tag, jax/export info
    fold.bin     Exported: variables -> flat aux constants (weight folds)
    main.bin     Exported: (variables, aux_flat, imgs, scales)
                           -> (det, kps, count)

Weights stay OUTSIDE the artifact (pass the registry's variables at call
time) so one exported program serves any checkpoint with the same
architecture — matching the repository model/weights split.

Cross-platform: pass platforms=("tpu",) to lower for TPU from a CPU host
(the packed serving graph is pure XLA ops, so the StableHLO is portable);
default exports for the current backend, which is what the round-trip test
exercises on CPU.
"""

from __future__ import annotations

import io
import json
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax import export as jax_export

from .. import __version__


def export_detector(
    detector,
    batch_size: int = 8,
    stem: Optional[str] = "auto",
    platforms: Optional[Sequence[str]] = None,
    **batched_kwargs,
) -> bytes:
    """Serialize the batched serving graph of a detector.

    Accepts any detector with the batched-fn duck type DetectionServer
    serves (RetinaFaceDetection, SCRFDDetection, imported nets).  Returns
    the artifact bytes (write them wherever the deployment keeps models).
    `stem`/`batched_kwargs` select the same configuration surface as
    make_batched_fn; the exported input contract is that path's host
    layout at (batch_size, H, W) — s4d: (B, H/4, W/4, 48) uint8.

    stem="auto" (default) exports the s4d fast path when the detector is
    eligible and falls back to the natural "xla" layout otherwise (e.g.
    imported mmdet-layout SCRFD, odd image sizes); pass an explicit stem
    to fail instead of falling back.  Detectors without layout options
    export the natural (B, H, W, 3) uint8 contract.
    """
    import jax.numpy as jnp

    from ..pipeline.detection import (
        build_batched_fn,
        detector_image_size,
        host_layout_shape,
        resolve_fold,
    )

    image_size = detector_image_size(detector)
    # The duck-type dispatch is build_batched_fn — the ONE probe shared
    # with DetectionServer, so an explicit stem a detector can't honor
    # raises here too instead of silently exporting a different contract.
    if stem in (None, "auto"):
        try:
            fn = build_batched_fn(detector, stem="s4d", **batched_kwargs)
            stem = "s4d"
        except ValueError:
            fn = build_batched_fn(detector, **batched_kwargs)
            stem = "xla"
    else:
        fn = build_batched_fn(detector, stem=stem, **batched_kwargs)
    layout, imgs_shape = host_layout_shape(
        image_size,
        batch_size,
        stem=stem,
        pre_s2d=bool(batched_kwargs.get("pre_s2d")),
    )
    variables = detector.variables
    # Detectors without the fold/aux protocol export a trivial (empty) fold
    # (pipeline.detection.resolve_fold) so the artifact layout — and
    # prepare_variables' dtype recovery from fold.in_avals — stays uniform.
    fold, inner = resolve_fold(fn)
    aux = fold(variables)
    aux_flat, aux_tree = jax.tree_util.tree_flatten(aux)

    def fold_plain(variables):
        return jax.tree_util.tree_leaves(fold(variables))

    def main(variables, aux_flat, imgs, scales):
        aux_s = jax.tree_util.tree_unflatten(aux_tree, aux_flat)
        out = inner(variables, aux_s, imgs, scales)
        return out.det, out.kps, out.count

    kw = {"platforms": tuple(platforms)} if platforms else {}
    exp_fold = jax_export.export(jax.jit(fold_plain), **kw)(variables)
    exp_main = jax_export.export(jax.jit(main), **kw)(
        variables,
        aux_flat,
        jax.ShapeDtypeStruct(imgs_shape, jnp.uint8),
        jax.ShapeDtypeStruct((batch_size,), jnp.float32),
    )

    meta = {
        "format": "rsfd-aot-v1",
        "framework_version": __version__,
        "batch_size": batch_size,
        "image_size": list(image_size),
        "layout": layout,
        "stem": stem,
        "detector": type(detector).__name__,
        # duck-typed detectors may carry no .model — meta stays best-effort
        "backbone": getattr(getattr(detector, "model", None), "backbone", None),
        "jax_version": jax.__version__,
    }
    buf = io.BytesIO()
    np.savez(
        buf,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        fold=np.frombuffer(exp_fold.serialize(), dtype=np.uint8),
        main=np.frombuffer(exp_main.serialize(), dtype=np.uint8),
    )
    return buf.getvalue()


class LoadedDetector:
    """A deserialized serving artifact: call with (variables, imgs, scales).

    `imgs` must already be in the artifact's host layout (`.meta["layout"]`
    — what the native loader / ops.image.*_layout_host emit).  Returns
    (det (B, max_det, 5), kps (B, max_det, 5, 2), count (B,)).
    """

    def __init__(self, blob: bytes) -> None:
        with np.load(io.BytesIO(blob)) as z:
            self.meta = json.loads(bytes(z["meta"].tobytes()).decode())
            if self.meta.get("format") != "rsfd-aot-v1":
                raise ValueError(f"not an rsfd AOT artifact: {self.meta}")
            self._fold = jax_export.deserialize(bytearray(z["fold"].tobytes()))
            self._main = jax_export.deserialize(bytearray(z["main"].tobytes()))
        self._aux_cache: list = []

    def prepare_variables(self, variables) -> Any:
        """Cast checkpoint leaves to the artifact's traced dtypes.

        Artifacts exported with pre-cast bf16 kernels (the serving default)
        traced those leaves as bfloat16; a registry .npz loads float32.
        The exported program records its exact input avals, so the cast is
        recovered from the artifact itself — no side-channel needed.
        """
        import jax.numpy as jnp

        leaves, treedef = jax.tree_util.tree_flatten(variables)
        expected = self._fold.in_avals
        if len(expected) != len(leaves):
            raise ValueError(
                f"variables tree has {len(leaves)} leaves; artifact expects "
                f"{len(expected)}"
            )
        for i, (l, a) in enumerate(zip(leaves, expected)):
            # Same-count wrong-architecture checkpoints must fail HERE with
            # the offending leaf named, not deep inside Exported.call.
            if tuple(np.shape(l)) != tuple(a.shape):
                raise ValueError(
                    f"variables leaf {i} has shape {tuple(np.shape(l))}; "
                    f"artifact expects {tuple(a.shape)} — wrong checkpoint "
                    "for this artifact?"
                )
        cast = [
            l if getattr(l, "dtype", None) == a.dtype else jnp.asarray(l, a.dtype)
            for l, a in zip(leaves, expected)
        ]
        return jax.tree_util.tree_unflatten(treedef, cast)

    def _prepared(self, variables) -> Tuple[Any, Any]:
        for v, prepared, aux in self._aux_cache:
            if v is variables:
                return prepared, aux
        prepared = self.prepare_variables(variables)
        aux = self._fold.call(prepared)
        self._aux_cache.append((variables, prepared, aux))
        # ONE entry, like make_folding_fn's fold cache: weights get swapped
        # (checkpoint reload), not alternated, and a deeper cache pins the
        # superseded model's device buffers (~100 MB for R50) in HBM.
        del self._aux_cache[:-1]
        return prepared, aux

    def __call__(
        self, variables, imgs, scales
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        prepared, aux = self._prepared(variables)
        return self._main.call(prepared, list(aux), imgs, scales)


def load_detector(blob: bytes) -> LoadedDetector:
    """Re-hydrate an export_detector artifact (no model Python involved)."""
    return LoadedDetector(blob)


# -- generic single-model artifacts (quality / embedding / FAS heads) -------


def export_model(
    module,
    variables,
    batch_shape: Sequence[int],
    platforms: Optional[Sequence[str]] = None,
    name: str = "",
    dtype=np.float32,
    **apply_kwargs,
) -> bytes:
    """Serialize module.apply(variables, batch) for one static batch shape.

    The registry analog of a Triton repository entry for the non-detector
    models (quality, embedding, anti-spoofing): weights ride separately,
    the artifact is the compiled program.  apply_kwargs (e.g. train=False)
    are baked statically.
    """
    import jax.numpy as jnp

    def fwd(variables, batch):
        return module.apply(variables, batch, **apply_kwargs)

    kw = {"platforms": tuple(platforms)} if platforms else {}
    exp = jax_export.export(jax.jit(fwd), **kw)(
        variables,
        jax.ShapeDtypeStruct(tuple(batch_shape), jnp.dtype(dtype)),
    )
    meta = {
        "format": "rsfd-aot-model-v1",
        "framework_version": __version__,
        "name": name or type(module).__name__,
        "batch_shape": list(batch_shape),
        "dtype": np.dtype(dtype).name,
        "jax_version": jax.__version__,
    }
    buf = io.BytesIO()
    np.savez(
        buf,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        main=np.frombuffer(exp.serialize(), dtype=np.uint8),
    )
    return buf.getvalue()


class LoadedModel:
    """A deserialized export_model artifact: call with (variables, batch)."""

    def __init__(self, blob: bytes) -> None:
        with np.load(io.BytesIO(blob)) as z:
            self.meta = json.loads(bytes(z["meta"].tobytes()).decode())
            if self.meta.get("format") != "rsfd-aot-model-v1":
                raise ValueError(f"not an rsfd AOT model artifact: {self.meta}")
            self._main = jax_export.deserialize(bytearray(z["main"].tobytes()))

    def __call__(self, variables, batch):
        return self._main.call(variables, batch)


def load_model(blob: bytes) -> LoadedModel:
    """Re-hydrate an export_model artifact."""
    return LoadedModel(blob)


# -- sharded (multi-chip) artifacts ------------------------------------------


def export_tp_vit(model, variables, mesh, batch_size: int,
                  image_size: Sequence[int] = (224, 224)) -> bytes:
    """Serialize the tensor-parallel ViT forward for a device mesh.

    Completes the deployment story for the multi-chip path: the Megatron-
    sharded program (parallel/tp.py — head/MLP-column parameter shardings,
    GSPMD-inserted psums) exported as StableHLO with its shardings baked
    in, so a serving pod re-hydrates the exact collective schedule without
    the model Python.  jax.export records per-argument HLO shardings and
    the device count; load_tp_vit re-binds them to a same-shape mesh.

    Weights stay outside (the same model/weights split as every artifact
    here): pass any same-architecture checkpoint's variables at call time,
    placed by parallel.tp.vit_tp_shardings.  Shapes are static, matching
    the repo convention (one artifact per batch size).
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.tp import make_tp_vit_fn

    if batch_size % mesh.shape["data"]:
        raise ValueError(
            f"batch {batch_size} not divisible by data axis {mesh.shape['data']}"
        )
    from ..parallel.tp import vit_tp_shardings

    fwd, _ = make_tp_vit_fn(model, variables, mesh, place_variables=False)
    # Export from ShapeDtypeStructs carrying the real NamedShardings — no
    # example batch is materialized and the weight tree never leaves the
    # host (device_put of ~300 MB through a tunneled device would be waste
    # the export never needs).
    var_avals = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(
            np.shape(x), getattr(x, "dtype", np.float32), sharding=s
        ),
        variables,
        vit_tp_shardings(variables, mesh),
    )
    w, h = image_size
    img = jax.ShapeDtypeStruct(
        (batch_size, h, w, 3), jnp.float32,
        sharding=NamedSharding(mesh, P("data")),
    )
    exp = jax_export.export(fwd)(var_avals, img)
    meta = {
        "format": "rsfd-aot-tp-vit-v1",
        "framework_version": __version__,
        "config": model.config,
        "num_classes": model.num_classes,
        "batch_size": batch_size,
        "image_size": [w, h],
        "mesh_shape": dict(mesh.shape),
        "mesh_axes": list(mesh.axis_names),
        "nr_devices": mesh.size,
        "jax_version": jax.__version__,
    }
    buf = io.BytesIO()
    np.savez(
        buf,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        main=np.frombuffer(exp.serialize(), dtype=np.uint8),
    )
    return buf.getvalue()


class LoadedTPViT:
    """A deserialized export_tp_vit artifact bound to a live mesh.

    Call with an UNSHARDED variables tree (e.g. straight from a registry
    .npz): prepare_variables places it under the recorded Megatron rule —
    pay that once, then every call is dispatch-only.
    """

    def __init__(self, blob: bytes, mesh) -> None:
        with np.load(io.BytesIO(blob)) as z:
            self.meta = json.loads(bytes(z["meta"].tobytes()).decode())
            if self.meta.get("format") != "rsfd-aot-tp-vit-v1":
                raise ValueError(f"not an rsfd TP-ViT artifact: {self.meta}")
            self._main = jax_export.deserialize(bytearray(z["main"].tobytes()))
        if dict(mesh.shape) != self.meta["mesh_shape"]:
            raise ValueError(
                f"artifact was exported for mesh {self.meta['mesh_shape']}, "
                f"got {dict(mesh.shape)}"
            )
        self.mesh = mesh

    def prepare_variables(self, variables):
        """Place a host/unsharded variables tree under the artifact's rule."""
        from ..parallel.tp import vit_tp_shardings

        return jax.device_put(variables, vit_tp_shardings(variables, self.mesh))

    def __call__(self, variables, images):
        from jax.sharding import NamedSharding, PartitionSpec as P

        leaves = jax.tree_util.tree_leaves(variables)
        if leaves and not isinstance(leaves[0], jax.Array):
            # Host/numpy tree passed directly: place it once as a
            # convenience.  For repeated calls, prepare_variables yourself
            # and reuse the result — that is what makes calls dispatch-only.
            variables = self.prepare_variables(variables)
        images = jax.device_put(
            images, NamedSharding(self.mesh, P("data"))
        )
        return self._main.call(variables, images)


def load_tp_vit(blob: bytes, mesh) -> LoadedTPViT:
    """Re-hydrate an export_tp_vit artifact onto a same-shape mesh."""
    return LoadedTPViT(blob, mesh)
