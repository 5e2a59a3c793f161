"""KServe-v2 HTTP/REST endpoint tests (runtime/http.py).

The reference's Triton server speaks two client surfaces; its crate uses
the gRPC one (/root/reference/src/triton_client/client.rs:55-69), and the
vendored proto documents each RPC as the gRPC rendering of a /v2 HTTP
endpoint (/root/reference/triton_proto/grpc_service.proto:25-218).  These
tests drive that HTTP surface with a stock http.client — the same bytes a
``tritonclient.http`` user would send, including the binary tensor-data
extension — against ``serve(http_port=0)``, and cross-check state sharing
with the protobuf wire on the gRPC port.
"""

import json
import struct

import numpy as np
import pytest

import http.client


@pytest.fixture(scope="module")
def http_port():
    from rs_face_detection_tpu.models.registry import ModelRegistry, ModelSpec
    from rs_face_detection_tpu.runtime.server import serve

    reg = ModelRegistry()

    def small_detection_builder():
        from rs_face_detection_tpu.models.retinaface import init_retinaface

        model, variables = init_retinaface("mobilenet025", (64, 64), seed=0)
        return (
            ModelSpec("face_detection_retina", (64, 64, 3), "maps"),
            model,
            variables,
        )

    def small_classifier(name, outs):
        def b():
            from rs_face_detection_tpu.models.heads import init_small_cnn

            model, variables = init_small_cnn(outs, (32, 32), widths=(8, 16))
            return ModelSpec(name, (32, 32, 3), "probs"), model, variables

        return b

    reg.register_builder("face_detection_retina", small_detection_builder)
    reg.register_builder("face_quality", small_classifier("face_quality", 4))
    reg.register_builder(
        "face_identification", small_classifier("face_identification", 16)
    )
    for name in ("face_detection_retina", "face_quality", "face_identification"):
        reg.load(name)

    server = serve(None, reg, port=0, http_port=0)
    yield server._rsfd_http_port, server._rsfd_port, reg
    server.stop(0)


def _request(port, method, path, body=b"", headers=None):
    conn = http.client.HTTPConnection("localhost", port, timeout=60)
    try:
        conn.request(method, path, body=body, headers=headers or {})
        resp = conn.getresponse()
        payload = resp.read()
        return resp.status, dict(resp.getheaders()), payload
    finally:
        conn.close()


def _get(port, path):
    return _request(port, "GET", path)


def _post(port, path, obj=None, raw=None, headers=None):
    if raw is not None:
        return _request(port, "POST", path, body=raw, headers=headers)
    body = json.dumps(obj).encode() if obj is not None else b""
    return _request(port, "POST", path, body=body, headers=headers)


# ---------------------------------------------------------------------------
# health / metadata
# ---------------------------------------------------------------------------


def test_http_health_and_ready(http_port):
    port, _, _ = http_port
    assert _get(port, "/v2/health/live")[0] == 200
    assert _get(port, "/v2/health/ready")[0] == 200
    assert _get(port, "/v2/models/face_quality/ready")[0] == 200
    assert _get(port, "/v2/models/face_quality/versions/1/ready")[0] == 200
    assert _get(port, "/v2/models/nope/ready")[0] == 400


def test_http_server_metadata(http_port):
    port, _, _ = http_port
    status, _, body = _get(port, "/v2")
    assert status == 200
    meta = json.loads(body)
    assert meta["name"] == "rs_face_detection_tpu"
    assert "model_repository" in meta["extensions"]


def test_http_model_metadata_and_config(http_port):
    port, _, _ = http_port
    status, _, body = _get(port, "/v2/models/face_detection_retina")
    assert status == 200
    meta = json.loads(body)
    assert meta["platform"] == "jax_xla"
    assert meta["inputs"][0] == {
        "name": "data",
        "datatype": "FP32",
        "shape": [1, 3, 64, 64],
    }
    assert len(meta["outputs"]) == 9

    status, _, body = _get(port, "/v2/models/face_detection_retina/config")
    assert status == 200
    cfg = json.loads(body)
    # Triton's HTTP config JSON renders proto enums as names
    assert cfg["input"][0]["data_type"] == "TYPE_FP32"
    assert cfg["input"][0]["format"] == "FORMAT_NCHW"
    assert cfg["output"][0]["name"] == "face_rpn_cls_prob_reshape_stride32"


def test_http_unknown_model_and_version_404(http_port):
    port, _, _ = http_port
    status, _, body = _get(port, "/v2/models/missing_model")
    assert status == 404
    assert "missing_model" in json.loads(body)["error"]
    # only version "1" exists
    status, _, _ = _get(port, "/v2/models/face_quality/versions/7")
    assert status == 404
    status, _, body = _get(port, "/v2/nonsense")
    assert status == 404
    assert "error" in json.loads(body)


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------


def test_http_infer_json_data(http_port):
    port, _, reg = http_port
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    status, _, body = _post(
        port,
        "/v2/models/face_quality/infer",
        obj={
            "id": "req-1",
            "inputs": [
                {
                    "name": "data",
                    "shape": [1, 3, 32, 32],
                    "datatype": "FP32",
                    "data": x.reshape(-1).tolist(),
                }
            ],
        },
    )
    assert status == 200, body
    out = json.loads(body)
    assert out["model_name"] == "face_quality"
    assert out["id"] == "req-1"
    (tensor,) = out["outputs"]
    assert tensor["name"] == "output"
    assert tensor["datatype"] == "FP32"
    module, variables = reg.get("face_quality")
    direct = np.asarray(
        module.apply(variables, np.transpose(x, (0, 2, 3, 1)), train=False)
    )
    np.testing.assert_allclose(
        np.asarray(tensor["data"], np.float32).reshape(tensor["shape"]),
        direct,
        rtol=1e-4,
        atol=1e-5,
    )


def test_http_infer_binary_extension(http_port):
    """The tritonclient.http default path: binary request tensor after the
    JSON header, binary response tensor after the response header."""
    port, _, reg = http_port
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 32, 32)).astype("<f4")
    header = json.dumps(
        {
            "inputs": [
                {
                    "name": "data",
                    "shape": [1, 3, 32, 32],
                    "datatype": "FP32",
                    "parameters": {"binary_data_size": x.nbytes},
                }
            ],
            "outputs": [
                {"name": "output", "parameters": {"binary_data": True}}
            ],
        }
    ).encode()
    status, headers, body = _post(
        port,
        "/v2/models/face_identification/infer",
        raw=header + x.tobytes(),
        headers={"Inference-Header-Content-Length": str(len(header))},
    )
    assert status == 200, body
    jlen = int(headers["Inference-Header-Content-Length"])
    out = json.loads(body[:jlen])
    (tensor,) = out["outputs"]
    assert "data" not in tensor
    nbytes = tensor["parameters"]["binary_data_size"]
    blob = body[jlen : jlen + nbytes]
    result = np.frombuffer(blob, "<f4").reshape(tensor["shape"])
    module, variables = reg.get("face_identification")
    direct = np.asarray(
        module.apply(variables, np.transpose(x, (0, 2, 3, 1)), train=False)
    )
    np.testing.assert_allclose(result, direct, rtol=1e-4, atol=1e-5)


def test_http_infer_detection_names(http_port):
    """Detection over HTTP returns the mxnet-RetinaFace tensor set in
    model-config order (face_detection.rs:296-345 consumption order)."""
    port, _, _ = http_port
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    status, _, body = _post(
        port,
        "/v2/models/face_detection_retina/infer",
        obj={
            "inputs": [
                {
                    "name": "data",
                    "shape": [1, 3, 64, 64],
                    "datatype": "FP32",
                    "data": x.reshape(-1).tolist(),
                }
            ]
        },
    )
    assert status == 200, body
    out = json.loads(body)
    names = [t["name"] for t in out["outputs"]]
    assert names[:3] == [
        "face_rpn_cls_prob_reshape_stride32",
        "face_rpn_bbox_pred_stride32",
        "face_rpn_landmark_pred_stride32",
    ]
    assert len(names) == 9
    cls = out["outputs"][0]
    assert cls["shape"] == [1, 4, 2, 2]  # 2A channels at 64/32


def test_http_infer_errors(http_port):
    port, _, _ = http_port
    # unknown model -> 404 with Triton's error JSON
    status, _, body = _post(
        port,
        "/v2/models/missing/infer",
        obj={"inputs": [{"name": "data", "shape": [1, 3, 2, 2],
                         "datatype": "FP32", "data": [0.0] * 12}]},
    )
    assert status == 404
    assert "missing" in json.loads(body)["error"]
    # malformed JSON -> 400
    status, _, body = _post(
        port, "/v2/models/face_quality/infer", raw=b"{not json"
    )
    assert status == 400
    # binary_data_size overrunning the payload -> 400
    header = json.dumps(
        {"inputs": [{"name": "data", "shape": [1, 3, 32, 32],
                     "datatype": "FP32",
                     "parameters": {"binary_data_size": 999999}}]}
    ).encode()
    status, _, body = _post(
        port,
        "/v2/models/face_quality/infer",
        raw=header + b"\x00" * 16,
        headers={"Inference-Header-Content-Length": str(len(header))},
    )
    assert status == 400
    assert "binary" in json.loads(body)["error"]
    # input with no data at all -> 400
    status, _, body = _post(
        port,
        "/v2/models/face_quality/infer",
        obj={"inputs": [{"name": "data", "shape": [1, 3, 32, 32],
                         "datatype": "FP32"}]},
    )
    assert status == 400


# ---------------------------------------------------------------------------
# repository / statistics
# ---------------------------------------------------------------------------


def test_http_repository_verbs(http_port):
    port, _, _ = http_port
    status, _, body = _post(port, "/v2/repository/index")
    assert status == 200
    index = json.loads(body)
    names = {m["name"]: m["state"] for m in index}
    assert names["face_quality"] == "READY"

    assert _post(
        port, "/v2/repository/models/face_quality/unload"
    )[0] == 200
    status, _, body = _post(port, "/v2/repository/index", obj={"ready": True})
    assert "face_quality" not in [m["name"] for m in json.loads(body)]
    assert _post(port, "/v2/repository/models/face_quality/load")[0] == 200
    assert _get(port, "/v2/models/face_quality/ready")[0] == 200
    assert _post(port, "/v2/repository/models/missing/load")[0] == 404


def test_http_statistics(http_port):
    port, _, _ = http_port
    # ensure at least one recorded inference
    x = np.zeros((1, 3, 32, 32), np.float32)
    _post(
        port,
        "/v2/models/face_quality/infer",
        obj={"inputs": [{"name": "data", "shape": [1, 3, 32, 32],
                         "datatype": "FP32",
                         "data": x.reshape(-1).tolist()}]},
    )
    status, _, body = _get(port, "/v2/models/face_quality/stats")
    assert status == 200
    (stats,) = json.loads(body)["model_stats"]
    assert stats["name"] == "face_quality"
    assert stats["inference_count"] >= 1
    assert stats["inference_stats"]["compute_infer"]["count"] >= 1


# ---------------------------------------------------------------------------
# shared memory / logging / trace
# ---------------------------------------------------------------------------


def test_http_system_shared_memory(http_port):
    import uuid

    from rs_face_detection_tpu.runtime.shm import SharedRegion

    port, grpc_port, _ = http_port
    region = SharedRegion.create(f"rsfd_http_{uuid.uuid4().hex[:12]}", 4096)
    try:
        status, _, body = _post(
            port,
            "/v2/systemsharedmemory/region/httpshm/register",
            obj={"key": region.key, "offset": 0, "byte_size": 4096},
        )
        assert status == 200, body
        status, _, body = _get(port, "/v2/systemsharedmemory/status")
        regions = json.loads(body)
        assert any(
            r["name"] == "httpshm" and r["byte_size"] == 4096
            for r in regions
        )
        status, _, body = _get(
            port, "/v2/systemsharedmemory/region/httpshm/status"
        )
        assert [r["name"] for r in json.loads(body)] == ["httpshm"]
        # the same region is visible on the protobuf wire (shared registry)
        from rs_face_detection_tpu.runtime.wire import TritonWireClient

        client = TritonWireClient(f"localhost:{grpc_port}")
        try:
            wire_status = client.system_shared_memory_status("httpshm")
            assert wire_status["httpshm"]["byte_size"] == 4096
        finally:
            client.close()
        assert _post(
            port, "/v2/systemsharedmemory/region/httpshm/unregister"
        )[0] == 200
        status, _, body = _get(
            port, "/v2/systemsharedmemory/region/httpshm/status"
        )
        assert status == 404
    finally:
        region.close(unlink=True)


def test_http_cuda_shared_memory_refusal(http_port):
    port, _, _ = http_port
    status, _, body = _post(
        port,
        "/v2/cudasharedmemory/region/gpu0/register",
        obj={"raw_handle": "", "device_id": 0, "byte_size": 64},
    )
    assert status == 501
    assert "TPU" in json.loads(body)["error"]
    status, _, body = _get(port, "/v2/cudasharedmemory/status")
    assert status == 200
    assert json.loads(body) == []
    assert _get(
        port, "/v2/cudasharedmemory/region/gpu0/status"
    )[0] == 404


def test_http_logging(http_port):
    port, _, _ = http_port
    status, _, body = _get(port, "/v2/logging")
    assert status == 200
    settings = json.loads(body)
    assert settings["log_info"] is True
    status, _, body = _post(
        port, "/v2/logging", obj={"log_verbose_level": 2}
    )
    assert status == 200
    assert json.loads(body)["log_verbose_level"] == 2
    # restore and reject unknown keys
    _post(port, "/v2/logging", obj={"log_verbose_level": 0})
    status, _, body = _post(port, "/v2/logging", obj={"bogus": True})
    assert status == 400


def test_http_trace_status(http_port):
    port, _, _ = http_port
    status, _, body = _get(port, "/v2/trace/setting")
    assert status == 200
    assert json.loads(body)["trace_level"] == ["OFF"]


# ---------------------------------------------------------------------------
# the Python client wrapper
# ---------------------------------------------------------------------------


def test_http_client_verbs(http_port):
    from rs_face_detection_tpu.runtime.http import (
        TritonHTTPClient,
        TritonHTTPError,
    )

    port, _, reg = http_port
    client = TritonHTTPClient(port=port)
    assert client.server_live() and client.server_ready()
    assert client.model_ready("face_quality") is True
    assert client.model_ready("nope") is False
    assert client.server_metadata()["name"] == "rs_face_detection_tpu"
    assert client.model_metadata("face_quality")["platform"] == "jax_xla"
    assert client.model_config("face_quality")["input"][0]["data_type"] == (
        "TYPE_FP32"
    )
    with pytest.raises(TritonHTTPError) as e:
        client.model_metadata("missing")
    assert e.value.status == 404 and "missing" in e.value.detail
    names = [m["name"] for m in client.repository_index()]
    assert "face_quality" in names
    assert client.log_settings()["log_info"] is True
    assert client.trace_setting()["trace_level"] == ["OFF"]


def test_http_client_infer_binary_json_parity(http_port):
    from rs_face_detection_tpu.runtime.http import TritonHTTPClient

    port, _, reg = http_port
    client = TritonHTTPClient(port=port)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    (bin_out,) = client.infer("face_identification", x)
    (json_out,) = client.infer("face_identification", x, binary=False)
    assert bin_out[0] == json_out[0] == "output"
    np.testing.assert_allclose(bin_out[2], json_out[2], rtol=1e-6)
    module, variables = reg.get("face_identification")
    direct = np.asarray(
        module.apply(variables, np.transpose(x, (0, 2, 3, 1)), train=False)
    )
    np.testing.assert_allclose(bin_out[2], direct, rtol=1e-4, atol=1e-5)
    # requested-output subset on the detection model
    outs = client.infer(
        "face_detection_retina",
        rng.normal(size=(1, 3, 64, 64)).astype(np.float32),
        requested_outputs=["face_rpn_bbox_pred_stride8"],
    )
    assert [o[0] for o in outs] == ["face_rpn_bbox_pred_stride8"]
