"""eKYC pipeline: SCRFD decode, verify() dataflow, threshold semantics."""

import numpy as np
import pytest

from rs_face_detection_tpu.configs import (
    EkycFaceAttributeConfig,
    EkycFaceIDConfig,
    EkycFaceQualityConfig,
    EkycFASCropConfig,
    EkycFASFullConfig,
)
from rs_face_detection_tpu.models.registry import ModelRegistry, ModelSpec

cv2 = pytest.importorskip("cv2")


def _tiny_registry():
    """Registry with small eKYC models for fast CPU jit."""
    reg = ModelRegistry()

    def scrfd_builder():
        from rs_face_detection_tpu.models.scrfd import init_scrfd

        model, variables = init_scrfd((96, 96), width=8, seed=0)
        return ModelSpec("scrfd", (96, 96, 3), "maps"), model, variables

    def face_id_builder():
        from rs_face_detection_tpu.models.arcface import init_arcface

        model, variables = init_arcface("iresnet18", 512, (112, 112), seed=0)
        return ModelSpec("face_id", (112, 112, 3), "emb"), model, variables

    def small(name, outs, size):
        def b():
            from rs_face_detection_tpu.models.heads import init_small_cnn

            model, variables = init_small_cnn(outs, (size, size), widths=(8, 16))
            return ModelSpec(name, (size, size, 3), "probs"), model, variables

        return b

    def tiny_vit(name, size):
        def b():
            from rs_face_detection_tpu.models.vit import init_vit

            model, variables = init_vit("vit_tiny_test", 2, (size, size), seed=0)
            return ModelSpec(name, (size, size, 3), "probs"), model, variables

        return b

    reg.register_builder("scrfd", scrfd_builder)
    reg.register_builder("face_id", face_id_builder)
    reg.register_builder("face_attribute", small("face_attribute", 2, 128))
    reg.register_builder("face_quality_vp", small("face_quality_vp", 2, 112))
    reg.register_builder(
        "face_anti_spoofing_crop_l14", tiny_vit("face_anti_spoofing_crop_l14", 224)
    )
    reg.register_builder(
        "face_anti_spoofing_fi_l14", tiny_vit("face_anti_spoofing_fi_l14", 224)
    )
    return reg


@pytest.fixture(scope="module")
def pipeline():
    from rs_face_detection_tpu.pipeline.ekyc_pipeline import EKYCPipeline

    return EKYCPipeline(registry=_tiny_registry(), detector_image_size=(96, 96))


def test_scrfd_anchor_centers_layout():
    from rs_face_detection_tpu.pipeline.ekyc_pipeline import scrfd_anchor_centers

    centers, levels = scrfd_anchor_centers((64, 64))
    assert [l[0] for l in levels] == [8, 16, 32]
    assert centers.shape == (2 * (8 * 8 + 4 * 4 + 2 * 2), 2)
    # First level (stride 8), (h=0, w=0) both anchors at (0, 0).
    np.testing.assert_allclose(centers[0], [0, 0])
    np.testing.assert_allclose(centers[1], [0, 0])
    # (h=0, w=1) -> x = 8.
    np.testing.assert_allclose(centers[2], [8, 0])


def test_distance_decode_ops():
    import jax.numpy as jnp

    from rs_face_detection_tpu.ops.box_decode import distance2bbox, distance2kps

    pts = jnp.array([[100.0, 50.0]])
    dist = jnp.array([[10.0, 20.0, 30.0, 40.0]])
    np.testing.assert_allclose(
        np.asarray(distance2bbox(pts, dist)), [[90.0, 30.0, 130.0, 90.0]]
    )
    kd = jnp.zeros((1, 5, 2)).at[0, 2].set(jnp.array([5.0, -5.0]))
    got = np.asarray(distance2kps(pts, kd))
    np.testing.assert_allclose(got[0, 2], [105.0, 45.0])
    np.testing.assert_allclose(got[0, 0], [100.0, 50.0])


def test_scrfd_detection_contract(pipeline):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(120, 100, 3), dtype=np.uint8)
    boxes, kps = pipeline.detection(img)
    assert boxes.ndim == 2 and (boxes.shape[0] == 0 or boxes.shape[1] == 5)
    assert kps.shape[0] == boxes.shape[0]
    if len(boxes):
        assert (boxes[:, 4] >= 0).all() and (boxes[:, 4] <= 1).all()  # sigmoid


def test_verify_full_schema(pipeline):
    rng = np.random.default_rng(1)
    card = rng.integers(0, 255, size=(120, 100, 3), dtype=np.uint8)
    selfie = rng.integers(0, 255, size=(120, 100, 3), dtype=np.uint8)
    ok, cb = cv2.imencode(".jpg", card)
    ok, sb = cv2.imencode(".jpg", selfie)
    result = pipeline.verify(cb.tobytes(), sb.tobytes())

    if result.card_face_found and result.selfie_face_found:
        assert -1.0001 <= result.similarity <= 1.0001
        id_cfg = EkycFaceIDConfig()
        assert result.same_person == (
            result.similarity >= id_cfg.threshold_same_person
        )
        assert result.same_ekyc == (result.similarity >= id_cfg.threshold_same_ekyc)
        assert result.selfie_mask in (True, False)
        assert result.selfie_quality is not None
        assert result.selfie_live_crop in (True, False)
        assert result.selfie_live_full in (True, False)
    else:
        assert result.similarity == 0.0


def test_verify_same_image_high_similarity(pipeline):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(120, 100, 3), dtype=np.uint8)
    result = pipeline.verify_images(img, img)
    if result.card_face_found and result.selfie_face_found:
        # Identical inputs -> identical embeddings -> cosine 1.
        assert result.similarity == pytest.approx(1.0, abs=1e-4)
        assert result.same_person and result.same_ekyc
