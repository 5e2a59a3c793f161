"""Triton-style on-disk model repository (runtime/repository.py).

The reference's models live in a Triton model repository driven by
text-format config.pbtxt files (model_config.proto; repository verbs
client.rs:127-146).  These tests cover the text-format parser subset, the
scan/validation semantics Triton applies (name==dirname, highest servable
version, dims/data_type checks), the writer round trip, and an end-to-end
serve: import-shaped .npz -> repository -> ModelRegistry -> wire ModelInfer.
"""

import os

import numpy as np
import pytest

from rs_face_detection_tpu.runtime.repository import (
    RepositoryModel,
    as_list,
    attach_repository_builders,
    parse_pbtxt,
    scan_repository,
    write_repository_entry,
)


# ---------------------------------------------------------------------------
# text-format parser
# ---------------------------------------------------------------------------


def test_parse_pbtxt_triton_config_shape():
    # The layout Triton docs/examples use: bracket list of message blocks,
    # colon-less message fields, enums, comments, trailing commas.
    text = """
# generated
name: "face_detection_retina"
platform: "tensorrt_plan"
max_batch_size: 0
input [
  {
    name: "data"
    data_type: TYPE_FP32
    format: FORMAT_NCHW
    dims: [ 1, 3, 640, 640 ]
  }
]
output [
  { name: "face_rpn_cls_prob_reshape_stride32" data_type: TYPE_FP32 dims: [1, 4, 20, 20] },
  { name: "face_rpn_bbox_pred_stride32" data_type: TYPE_FP32 dims: [1, 8, 20, 20] }
]
dynamic_batching {
  preferred_batch_size: [ 4, 8 ]
  max_queue_delay_microseconds: 100
}
instance_group [ { count: 2 kind: KIND_GPU } ]
"""
    cfg = parse_pbtxt(text)
    assert cfg["name"] == "face_detection_retina"
    assert cfg["max_batch_size"] == 0
    inp = as_list(cfg["input"])
    assert len(inp) == 1
    assert inp[0]["data_type"] == "TYPE_FP32"
    assert inp[0]["format"] == "FORMAT_NCHW"
    assert as_list(inp[0]["dims"]) == [1, 3, 640, 640]
    outs = as_list(cfg["output"])
    assert [o["name"] for o in outs] == [
        "face_rpn_cls_prob_reshape_stride32",
        "face_rpn_bbox_pred_stride32",
    ]
    db = cfg["dynamic_batching"]
    assert as_list(db["preferred_batch_size"]) == [4, 8]
    assert db["max_queue_delay_microseconds"] == 100
    ig = as_list(cfg["instance_group"])
    assert ig[0] == {"count": 2, "kind": "KIND_GPU"}


def test_parse_pbtxt_repeated_by_key_and_scalars():
    cfg = parse_pbtxt(
        'input { name: "a" }\ninput { name: "b" }\n'
        "flag: true;\nneg: -1\nratio: 0.25\n"
        'joined: "ab" "cd"\n'
        "single: 'sq'\n"  # single-quoted strings are legal text format
    )
    assert [i["name"] for i in cfg["input"]] == ["a", "b"]
    assert cfg["flag"] is True  # trailing ';' separator tolerated
    assert cfg["neg"] == -1
    assert cfg["ratio"] == 0.25
    assert cfg["joined"] == "abcd"  # adjacent literals concatenate
    assert cfg["single"] == "sq"


def test_parse_pbtxt_malformed():
    for bad in ("input {", "input }", 'name: "x', "dims: [1, 2", ": 3"):
        with pytest.raises(ValueError):
            parse_pbtxt(bad)


# ---------------------------------------------------------------------------
# scan semantics
# ---------------------------------------------------------------------------


def _tiny_npz(path, name="m"):
    """A self-describing resnet18-family checkpoint (smallest builder)."""
    from rs_face_detection_tpu.models.checkpoint_io import save_imported
    from rs_face_detection_tpu.models.classifiers import (
        init_resnet18_classifier,
    )

    model, variables = init_resnet18_classifier(3, (32, 32), softmax=True)
    meta = {
        "family": "resnet18",
        "num_outputs": 3,
        "image_size": [32, 32],
        "softmax": True,
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_imported(path, variables, meta)
    return model, variables, meta


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt")
    path = str(root / "m.npz")
    model, variables, meta = _tiny_npz(path)
    return path, model, variables, meta


def test_scan_picks_highest_servable_version(tmp_path, tiny_ckpt):
    _, _, variables, meta = tiny_ckpt
    root = str(tmp_path)
    write_repository_entry(root, "face_quality", variables, meta, version=1)
    write_repository_entry(root, "face_quality", variables, meta, version=3)
    os.makedirs(os.path.join(root, "face_quality", "7"))  # empty: skipped
    (models,) = scan_repository(root)
    assert models.name == "face_quality"
    assert models.version == 3
    assert models.weights_path.endswith(os.path.join("3", "model.npz"))


def test_scan_rejects_name_mismatch(tmp_path):
    d = tmp_path / "modelA"
    d.mkdir()
    (d / "config.pbtxt").write_text('name: "other"\n')
    with pytest.raises(ValueError, match="does not match"):
        scan_repository(str(tmp_path))


def test_scan_skips_weightless_and_nonmodel_entries(tmp_path):
    (tmp_path / "notes.txt").write_text("hi")
    d = tmp_path / "empty_model"
    d.mkdir()
    (d / "config.pbtxt").write_text('name: "empty_model"\n')
    assert scan_repository(str(tmp_path)) == []


def test_scan_missing_root():
    with pytest.raises(ValueError, match="not a directory"):
        scan_repository("/nonexistent/repo/path")


def test_duplicate_singular_field_rejected_at_scan(tmp_path):
    """protoc text format rejects duplicate singular fields; so does the
    scan (a silent list would TypeError deep inside the builder)."""
    d = tmp_path / "m"
    d.mkdir()
    (d / "config.pbtxt").write_text(
        'name: "m"\nmax_batch_size: 4\nmax_batch_size: 8\n'
    )
    with pytest.raises(ValueError, match="more than once"):
        scan_repository(str(tmp_path))


def test_unquote_preserves_utf8_and_escapes():
    cfg = parse_pbtxt('note: "café \\"x\\" \\n tab\\t"')
    assert cfg["note"] == 'café "x" \n tab\t'


def test_one_broken_model_does_not_take_down_the_rest(tmp_path, tiny_ckpt):
    """Triton semantics: a malformed model dir is registered UNAVAILABLE
    (its load raises the scan error) while every other model serves."""
    from rs_face_detection_tpu.models.registry import ModelRegistry

    _, _, variables, meta = tiny_ckpt
    root = str(tmp_path)
    write_repository_entry(root, "face_quality", variables, meta)
    bad = tmp_path / "broken"
    bad.mkdir()
    (bad / "config.pbtxt").write_text('name: "broken"\ninput {')  # malformed

    reg = ModelRegistry()
    names = attach_repository_builders(reg, root)
    assert set(names) == {"face_quality", "broken"}
    reg.load("face_quality")  # good model serves
    with pytest.raises(Exception):
        reg.load("broken")  # broken model raises ITS error on load


def test_writer_preserves_hand_edited_config(tmp_path, tiny_ckpt):
    """Publishing a new version must not clobber operator config edits."""
    _, _, variables, meta = tiny_ckpt
    root = str(tmp_path)
    write_repository_entry(root, "face_quality", variables, meta, version=1)
    cfg = os.path.join(root, "face_quality", "config.pbtxt")
    hand_edit = open(cfg).read().replace(
        "max_batch_size: 1", "max_batch_size: 8"
    )
    with open(cfg, "w") as f:
        f.write(hand_edit)
    write_repository_entry(root, "face_quality", variables, meta, version=2)
    assert "max_batch_size: 8" in open(cfg).read()
    (scanned,) = scan_repository(root)
    assert scanned.version == 2


def test_batch_dim_rejected_when_batching_enabled(tmp_path, tiny_ckpt):
    """Triton omits the batch dim when max_batch_size > 0; a 4-entry dims
    under max_batch_size > 0 must be rejected, not silently stripped."""
    from rs_face_detection_tpu.models.registry import ModelRegistry

    _, _, variables, meta = tiny_ckpt
    root = str(tmp_path)
    write_repository_entry(root, "face_quality", variables, meta)
    cfg = os.path.join(root, "face_quality", "config.pbtxt")
    with open(cfg, "w") as f:
        f.write(
            'name: "face_quality"\nmax_batch_size: 8\n'
            'input [ { name: "data" dims: [ 1, 3, 32, 32 ] } ]\n'
        )
    reg = ModelRegistry()
    attach_repository_builders(reg, root)
    with pytest.raises(Exception, match="batch"):
        reg.load("face_quality")


# ---------------------------------------------------------------------------
# registry round trip + dims validation
# ---------------------------------------------------------------------------


def test_repository_serves_through_registry(tmp_path, tiny_ckpt):
    from rs_face_detection_tpu.models.registry import ModelRegistry

    _, model, variables, meta = tiny_ckpt
    root = str(tmp_path)
    write_repository_entry(root, "face_quality", variables, meta)
    reg = ModelRegistry()
    names = attach_repository_builders(reg, root)
    assert names == ["face_quality"]
    reg.load("face_quality")
    spec = reg.spec("face_quality")
    assert spec.input_shape == (32, 32, 3)
    assert "logits" in spec.output_spec
    # inference parity with a direct apply
    x = np.random.default_rng(0).random((1, 32, 32, 3), np.float32)
    got = np.asarray(reg.infer("face_quality", x))
    mod, var = reg.get("face_quality")
    want = np.asarray(mod.apply(var, x))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_repository_rejects_bad_dims(tmp_path, tiny_ckpt):
    from rs_face_detection_tpu.models.registry import ModelRegistry

    _, _, variables, meta = tiny_ckpt
    root = str(tmp_path)
    write_repository_entry(root, "face_quality", variables, meta)
    cfg = os.path.join(root, "face_quality", "config.pbtxt")
    with open(cfg, "w") as f:
        f.write(
            'name: "face_quality"\n'
            'input [ { name: "data" data_type: TYPE_FP32 '
            "dims: [ 3, 112, 112 ] } ]\n"
        )
    reg = ModelRegistry()
    attach_repository_builders(reg, root)
    with pytest.raises(Exception, match="dims"):
        reg.load("face_quality")


def test_repository_rejects_bad_dtype(tmp_path, tiny_ckpt):
    from rs_face_detection_tpu.models.registry import ModelRegistry

    _, _, variables, meta = tiny_ckpt
    root = str(tmp_path)
    write_repository_entry(root, "face_quality", variables, meta)
    cfg = os.path.join(root, "face_quality", "config.pbtxt")
    with open(cfg, "w") as f:
        f.write(
            'name: "face_quality"\n'
            'input [ { name: "data" data_type: TYPE_INT8 '
            "dims: [ 3, 32, 32 ] } ]\n"
        )
    reg = ModelRegistry()
    attach_repository_builders(reg, root)
    with pytest.raises(Exception, match="TYPE_INT8|data_type"):
        reg.load("face_quality")


def test_dims_variants_accepted(tmp_path, tiny_ckpt):
    """CHW, HWC, leading batch dim, and -1 wildcards all describe the
    checkpoint (Triton's dims conventions vary by max_batch_size)."""
    from rs_face_detection_tpu.models.registry import ModelRegistry

    _, _, variables, meta = tiny_ckpt
    for dims in ("3, 32, 32", "32, 32, 3", "1, 3, 32, 32", "-1, -1, 3"):
        root = str(tmp_path / dims.replace(", ", "_"))
        write_repository_entry(root, "face_quality", variables, meta)
        cfg = os.path.join(root, "face_quality", "config.pbtxt")
        with open(cfg, "w") as f:
            f.write(
                'name: "face_quality"\n'
                f'input [ {{ name: "data" dims: [ {dims} ] }} ]\n'
            )
        reg = ModelRegistry()
        attach_repository_builders(reg, root)
        reg.load("face_quality")  # must not raise


# ---------------------------------------------------------------------------
# end to end: repository -> serve -> wire ModelInfer
# ---------------------------------------------------------------------------


def test_repository_over_the_wire(tmp_path, tiny_ckpt):
    pytest.importorskip("grpc")
    from rs_face_detection_tpu.models.registry import ModelRegistry
    from rs_face_detection_tpu.runtime.server import serve
    from rs_face_detection_tpu.runtime.wire import TritonWireClient

    _, model, variables, meta = tiny_ckpt
    root = str(tmp_path)
    write_repository_entry(root, "face_quality", variables, meta)
    reg = ModelRegistry()
    attach_repository_builders(reg, root)
    server = serve(None, reg, port=0)
    try:
        client = TritonWireClient(f"localhost:{server._rsfd_port}")
        try:
            # Triton flow: repository model is registered but not loaded
            # until RepositoryModelLoad (client.rs:127-136).
            assert client.model_ready("face_quality") is False
            client.repository_model_load("face_quality")
            assert client.model_ready("face_quality") is True
            x = np.random.default_rng(1).random((1, 3, 32, 32), np.float32)
            ((oname, shape, arr),) = client.model_infer("face_quality", x)
            assert shape == [1, 3]
            want = np.asarray(
                model.apply(variables, np.transpose(x, (0, 2, 3, 1)))
            )
            np.testing.assert_allclose(arr, want, rtol=1e-5, atol=1e-6)
            # the repository verbs see the repository models
            idx = {m["name"]: m for m in client.repository_index()}
            assert "face_quality" in idx
        finally:
            client.close()
    finally:
        server.stop(0)


def test_dynamic_batching_config_coalesces_wire_infers(tmp_path):
    """config.pbtxt `dynamic_batching {}` must switch the served model onto
    the wire's dynamic batcher: concurrent single-item ModelInfer calls
    coalesce into fewer device executions with per-request parity
    (model_config.proto:1104; VERDICT r4 #6 — an operator porting a Triton
    repository must not have their batching config silently ignored)."""
    pytest.importorskip("grpc")
    from concurrent.futures import ThreadPoolExecutor

    from rs_face_detection_tpu.models.registry import ModelRegistry
    from rs_face_detection_tpu.runtime.server import serve
    from rs_face_detection_tpu.runtime.wire import TritonWireClient

    _, model, variables, meta = tiny_ckpt_build(tmp_path)
    root = str(tmp_path / "repo")
    write_repository_entry(
        root, "face_quality", variables, meta, max_batch_size=4
    )
    cfg_path = os.path.join(root, "face_quality", "config.pbtxt")
    with open(cfg_path, "a") as f:
        f.write("dynamic_batching { max_queue_delay_microseconds: 20000 }\n")

    reg = ModelRegistry()
    attach_repository_builders(reg, root)
    server = serve(None, reg, port=0)
    try:
        client = TritonWireClient(f"localhost:{server._rsfd_port}")
        try:
            client.repository_model_load("face_quality")
            spec = reg.spec("face_quality")
            assert spec.dynamic_batching is True
            assert spec.max_queue_delay_us == 20000

            rng = np.random.default_rng(3)
            xs = [
                rng.random((1, 3, 32, 32), np.float32) for _ in range(6)
            ]
            want = [
                np.asarray(
                    model.apply(variables, np.transpose(x, (0, 2, 3, 1)))
                )
                for x in xs
            ]
            # warm the (padded) compile so the burst below measures
            # scheduling, not jit
            client.model_infer("face_quality", xs[0])

            def one(x):
                ((_, shape, arr),) = client.model_infer("face_quality", x)
                return shape, arr

            with ThreadPoolExecutor(max_workers=6) as pool:
                results = list(pool.map(one, xs))
            for (shape, arr), exp in zip(results, want):
                assert shape == [1, 3]
                np.testing.assert_allclose(arr, exp, rtol=1e-4, atol=1e-5)

            stats = reg.statistics("face_quality")
            assert stats.inference_count == 7
            # the burst coalesced: fewer executions than requests, and at
            # least one multi-item batch was accounted
            assert stats.execution_count < 7
            assert any(k > 1 for k in stats.batch_size_counts)
        finally:
            client.close()
    finally:
        server.stop(0)


def tiny_ckpt_build(tmp_path):
    path = str(tmp_path / "tiny" / "m.npz")
    model, variables, meta = _tiny_npz(path)
    return path, model, variables, meta


def test_scan_warns_on_unhonored_scheduling(tmp_path, caplog):
    """sequence_batching / replicated instance_group parse but are not
    acted on — the scan must say so instead of silently differing."""
    import logging

    root = str(tmp_path)
    model_dir = os.path.join(root, "seq")
    os.makedirs(os.path.join(model_dir, "1"))
    with open(os.path.join(model_dir, "config.pbtxt"), "w") as f:
        f.write(
            'name: "seq"\n'
            "max_batch_size: 2\n"
            "sequence_batching { max_sequence_idle_microseconds: 1000 }\n"
            "instance_group [ { count: 3 } ]\n"
            "dynamic_batching { preserve_ordering: true }\n"
            'input [ { name: "data" data_type: TYPE_FP32 dims: [3, 32, 32] } ]\n'
        )
    # weights so the entry scans as servable
    _tiny_npz(os.path.join(model_dir, "1", "model.npz"), name="seq")
    from rs_face_detection_tpu.models.registry import ModelRegistry

    with caplog.at_level(
        logging.WARNING, logger="rs_face_detection_tpu.runtime.repository"
    ):
        attach_repository_builders(ModelRegistry(), root)
    text = caplog.text
    assert "sequence_batching is not honored" in text
    assert "instance_group count=3" in text
    assert "preserve_ordering" in text


def test_dynamic_forward_retries_after_eviction_close():
    """_dynamic_forward must survive fetching a batcher that a concurrent
    request (for a third live shape of the same model) evicted and closed
    between the dict lookup and submit(): the closed instance is dropped
    and the request retries on a fresh batcher instead of surfacing
    RuntimeError('DynamicBatcher is closed') as INTERNAL (round-5
    review).  Simulated deterministically by pre-seeding the servicer's
    batcher map with an already-closed instance for the request's key."""
    from rs_face_detection_tpu.models.registry import ModelRegistry, ModelSpec
    from rs_face_detection_tpu.runtime.batcher import DynamicBatcher
    from rs_face_detection_tpu.runtime.wire import TritonWireServicer

    class _Double:
        def apply(self, variables, x):
            import jax.numpy as jnp

            return jnp.transpose(x * 2.0, (0, 3, 1, 2))

    reg = ModelRegistry()
    reg.register(
        ModelSpec(
            "m",
            (4, 4, 3),
            "image",
            max_batch_size=2,
            dynamic_batching=True,
            max_queue_delay_us=500,
        ),
        _Double(),
        {},
    )
    servicer = TritonWireServicer(reg)
    x = np.random.default_rng(9).random((1, 4, 4, 3), np.float32)
    key = ("m", tuple(x.shape[1:]), str(x.dtype))
    dead = DynamicBatcher(batch_fn=lambda items: items, batch_size=2)
    dead.close()
    servicer._batchers[key] = dead

    out = np.asarray(servicer._dynamic_forward("m", x))
    np.testing.assert_allclose(
        out, np.transpose(2.0 * x, (0, 3, 1, 2)), rtol=1e-6
    )
    # the dead instance was dropped and replaced by the retry's fresh one
    assert servicer._batchers[key] is not dead
