"""End-to-end FacePipeline.extract() with fake weights.

Builds a small-config pipeline (64x64 detector to keep CPU jit fast), paints
a synthetic image, and checks the full result schema.  Detection boxes are
arbitrary under random weights; the contract under test is the dataflow:
decode -> detect -> select -> align -> quality -> embed and the
FaceExtractionResult schema (reference pipeline.rs:42-49, 188-249).
"""

import numpy as np
import pytest

from rs_face_detection_tpu.configs import (
    FaceDetectionConfig,
    FacePipelineConfig,
    FaceQualityClass,
)
from rs_face_detection_tpu.models.registry import (
    ModelRegistry,
    _attach_standard_builders,
)
from rs_face_detection_tpu.pipeline.face_pipeline import (
    FaceExtractionResult,
    FacePipeline,
)

cv2 = pytest.importorskip("cv2")


def _small_pipeline(confidence=0.3, process_on_no_face=False):
    cfg = FacePipelineConfig(
        detection=FaceDetectionConfig(
            image_size=(64, 64),
            confidence_threshold=confidence,
            max_candidates=64,
            max_detections=16,
        )
    )
    from conftest import attach_fast_head_builders

    reg = ModelRegistry()
    _attach_standard_builders(reg)
    attach_fast_head_builders(reg)

    # Rebuild the detection model at the small size.
    def small_detection_builder():
        from rs_face_detection_tpu.models.registry import ModelSpec
        from rs_face_detection_tpu.models.retinaface import init_retinaface

        model, variables = init_retinaface("mobilenet025", (64, 64), seed=0)
        return (
            ModelSpec("face_detection_retina", (64, 64, 3), "retinaface maps"),
            model,
            variables,
        )

    reg.register_builder("face_detection_retina", small_detection_builder)
    return FacePipeline(cfg, registry=reg, process_on_no_face=process_on_no_face)


@pytest.fixture(scope="module")
def pipeline():
    return _small_pipeline()


def _jpeg_bytes(img_bgr):
    ok, buf = cv2.imencode(".jpg", img_bgr)
    assert ok
    return buf.tobytes()


def test_extract_full_schema(pipeline):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(96, 96, 3), dtype=np.uint8)
    result = pipeline.extract(_jpeg_bytes(img))

    assert isinstance(result, FaceExtractionResult)
    assert result.face_count >= 0
    if result.face_count > 0 and result.selected_face_box is not None:
        assert result.facial_feature is not None
        assert result.facial_feature.shape == (512,)
        np.testing.assert_allclose(
            np.linalg.norm(result.facial_feature), 1.0, rtol=1e-5
        )
        assert isinstance(result.face_quality, FaceQualityClass)
        assert result.quality_score is not None
        assert result.selected_face_box.shape[0] >= 5


def test_extract_no_face_returns_empty_result():
    pipeline = _small_pipeline(confidence=1.1)  # nothing can pass
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(96, 96, 3), dtype=np.uint8)
    result = pipeline.extract(_jpeg_bytes(img))
    assert result.face_count == 0
    assert result.facial_feature is None
    assert result.face_quality is None
    assert result.selected_face_box is None


def test_extract_no_face_compat_mode_processes_default_crop():
    pipeline = _small_pipeline(confidence=1.1, process_on_no_face=True)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(96, 96, 3), dtype=np.uint8)
    result = pipeline.extract(_jpeg_bytes(img))
    # Reference-bug compat: embeds a default center crop even with no face.
    assert result.face_count == 0
    assert result.facial_feature is not None
    assert result.facial_feature.shape == (512,)


def test_extract_image_deterministic(pipeline):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(96, 96, 3), dtype=np.uint8)
    r1 = pipeline.extract_image(img)
    r2 = pipeline.extract_image(img)
    assert r1.face_count == r2.face_count
    if r1.facial_feature is not None:
        np.testing.assert_allclose(r1.facial_feature, r2.facial_feature)


def test_fused_tail_matches_staged_path(pipeline):
    """The one-dispatch warp+quality+embed graph must match staged modules."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(96, 96, 3), dtype=np.uint8)
    result = pipeline.extract_image(img)
    if result.facial_feature is None:
        pytest.skip("no face selected under random weights for this seed")

    boxes, kps = pipeline.face_detection(img)
    box, points = pipeline.face_selection(img.shape[:2], boxes, kps)
    assert points is not None
    aligned = pipeline.face_alignment(img, box, points)
    staged_scores, staged_classes = pipeline.face_quality([aligned])
    staged_features = pipeline.face_extraction([aligned])

    assert result.face_quality == staged_classes[0]
    assert result.quality_score == pytest.approx(staged_scores[0], rel=1e-4)
    np.testing.assert_allclose(
        result.facial_feature, staged_features[0], rtol=1e-4, atol=1e-5
    )


def test_extract_batch_matches_single(pipeline):
    """Throughput-mode extract_batch: schema parity with the single path."""
    rng = np.random.default_rng(6)
    imgs = [
        rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8) for _ in range(3)
    ]
    batch_results = pipeline.extract_batch(imgs)
    assert len(batch_results) == 3
    for img, br in zip(imgs, batch_results):
        sr = pipeline.extract_image(img)
        assert br.face_count == sr.face_count
        if br.facial_feature is not None and sr.facial_feature is not None:
            # 64x64 inputs letterbox 1:1 into the 64x64 detector canvas, so
            # the batched tail sees the same pixels as the single path.
            np.testing.assert_allclose(
                br.facial_feature, sr.facial_feature, rtol=1e-3, atol=1e-3
            )
            assert br.face_quality == sr.face_quality
    assert pipeline.extract_batch([]) == []


def test_extract_batch_degenerate_landmarks_fallback(pipeline, monkeypatch):
    """extract_batch must stage the crop fallback like extract_image does."""
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8) for _ in range(2)]
    # Force every similarity estimate to fail -> all faces take the fallback.
    monkeypatch.setattr(pipeline.face_alignment, "estimate", lambda pts: None)
    results = pipeline.extract_batch(imgs)
    for img, br in zip(imgs, results):
        sr = pipeline.extract_image(img)
        assert br.face_count == sr.face_count
        if sr.facial_feature is not None:
            assert br.facial_feature is not None
            assert br.selected_face_box is not None


def test_extract_batch_r50_s4d_detect_path():
    """R50 pipelines route extract_batch's detect through the s4d fast path;
    detections (and thus the whole result schema) must match the single-image
    extract, which letterboxes + detects through the stem='xla' chain."""
    import jax.numpy as jnp

    from rs_face_detection_tpu.configs import (
        FaceDetectionConfig,
        FacePipelineConfig,
    )
    from rs_face_detection_tpu.models.registry import ModelRegistry
    from rs_face_detection_tpu.models.registry import (
        _attach_standard_builders,
    )
    from rs_face_detection_tpu.pipeline.face_pipeline import FacePipeline
    from tests.conftest import attach_fast_head_builders

    det_cfg = FaceDetectionConfig(
        backbone="resnet50",
        model_name="face_detection_retina_r50_test",
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=32,
        max_detections=8,
    )
    registry = ModelRegistry()
    _attach_standard_builders(registry)
    attach_fast_head_builders(registry)
    from rs_face_detection_tpu.models.registry import ModelSpec
    from rs_face_detection_tpu.models.retinaface import init_retinaface

    def _build_r50():
        model, variables = init_retinaface(
            "resnet50", det_cfg.image_size, seed=0, stem_s2d=True
        )
        return (
            ModelSpec(det_cfg.model_name, (64, 64, 3), "retinaface maps"),
            model,
            variables,
        )

    registry.register_builder(det_cfg.model_name, _build_r50)
    pipe = FacePipeline(
        config=FacePipelineConfig(detection=det_cfg), registry=registry
    )
    rng = np.random.default_rng(11)
    imgs = [
        rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8) for _ in range(2)
    ]
    batch_results = pipe.extract_batch(imgs)
    assert pipe._detect_layout == "s4d"
    for img, br in zip(imgs, batch_results):
        sr = pipe.extract_image(img)
        assert br.face_count == sr.face_count
