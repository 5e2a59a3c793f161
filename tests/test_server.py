"""gRPC facade: real server/client round-trip on localhost."""

import numpy as np
import pytest

grpc = pytest.importorskip("grpc")
cv2 = pytest.importorskip("cv2")

from rs_face_detection_tpu.configs import FaceDetectionConfig, FacePipelineConfig
from rs_face_detection_tpu.models.registry import (
    ModelRegistry,
    ModelSpec,
    _attach_standard_builders,
)
from rs_face_detection_tpu.pipeline.face_pipeline import FacePipeline
from rs_face_detection_tpu.runtime.server import FacePipelineClient, serve


@pytest.fixture(scope="module")
def server_port():
    reg = ModelRegistry()
    _attach_standard_builders(reg)

    def small_detection_builder():
        from rs_face_detection_tpu.models.retinaface import init_retinaface

        model, variables = init_retinaface("mobilenet025", (64, 64), seed=0)
        return (
            ModelSpec("face_detection_retina", (64, 64, 3), "maps"),
            model,
            variables,
        )

    reg.register_builder("face_detection_retina", small_detection_builder)
    cfg = FacePipelineConfig(
        detection=FaceDetectionConfig(
            image_size=(64, 64),
            confidence_threshold=0.3,
            max_candidates=64,
            max_detections=16,
        )
    )
    pipeline = FacePipeline(cfg, registry=reg)
    server = serve(pipeline, reg, port=0)
    yield server._rsfd_port
    server.stop(0)


@pytest.fixture(scope="module")
def client(server_port):
    c = FacePipelineClient("localhost", server_port)
    yield c
    c.close()


def _jpeg(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(96, 96, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    return buf.tobytes()


def test_health_verbs(client):
    assert client.server_live() is True
    assert client.server_ready() is True


def test_extract_round_trip(client):
    result = client.extract(_jpeg())
    assert "face_count" in result
    if result["facial_feature"] is not None:
        assert len(result["facial_feature"]) == 512
        norm = np.linalg.norm(result["facial_feature"])
        assert norm == pytest.approx(1.0, rel=1e-4)


def test_detect_round_trip(client):
    result = client.detect(_jpeg(1))
    boxes = np.asarray(result["boxes"])
    kps = np.asarray(result["keypoints"])
    if boxes.size:
        assert boxes.shape[1] == 5
        assert kps.shape[1:] == (5, 2)


def test_repository_and_statistics(client):
    index = client.repository_index()
    names = {m["name"] for m in index}
    assert "face_detection_retina" in names
    assert client.model_ready("face_detection_retina") is True
    assert client.model_ready("nonexistent") is False
    stats = client.model_statistics("nonexistent")
    assert "error" in stats

    # Statistics must reflect pipeline traffic (not just registry.infer).
    client.detect(_jpeg(7))
    stats = client.model_statistics("face_detection_retina")
    assert stats["execution_count"] >= 1
    assert stats["inference_count"] >= 1
    assert stats["cumulative_duration_s"] > 0


def test_extract_garbage_bytes_returns_error(client):
    result = client.extract(b"definitely not an image")
    assert "error" in result
