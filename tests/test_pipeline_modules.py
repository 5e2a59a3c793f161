"""Quality / extraction / anti-spoofing / FQA module contracts (fake weights)."""

import numpy as np
import pytest

from rs_face_detection_tpu.configs import (
    FaceAntiSpoofingConfig,
    FaceIdentificationConfig,
    FaceQualityAssessmentConfig,
    FaceQualityConfig,
)
from rs_face_detection_tpu.models.registry import ModelRegistry
from rs_face_detection_tpu.models.registry import _attach_standard_builders


from conftest import attach_fast_head_builders


@pytest.fixture(scope="module")
def registry():
    reg = ModelRegistry()
    _attach_standard_builders(reg)
    return attach_fast_head_builders(reg)


def _crops(n, seed=0, size=(112, 112)):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 255, size=(size[1], size[0], 3)).astype(np.float32)
        for _ in range(n)
    ]


def test_face_quality_contract(registry):
    from rs_face_detection_tpu.pipeline.quality import FaceQuality

    fq = FaceQuality(registry=registry)
    scores, classes = fq(_crops(3))
    assert len(scores) == len(classes) == 3
    for s, c in zip(scores, classes):
        assert 0.0 <= s <= 1.0
        assert c in (0, 1, 2, 3)
        # Threshold demotion: class 1 only ever reported with score >= thr.
        if c == 1:
            assert s >= FaceQualityConfig().threshold
    assert fq([]) == ([], [])


def test_face_quality_demotion_rule():
    """Class-1 prob below threshold must demote to class 0 with class-0's score."""
    from rs_face_detection_tpu.pipeline.quality import FaceQuality

    class FakeModel:
        def apply(self, variables, x, train=False):
            import jax.numpy as jnp

            # class 1 wins with 0.4 < 0.5 threshold.
            return jnp.tile(jnp.array([[0.35, 0.4, 0.15, 0.1]]), (x.shape[0], 1))

    fq = FaceQuality(model=FakeModel(), variables={})
    scores, classes = fq(_crops(1))
    assert classes == [0]
    assert scores == [pytest.approx(0.35)]


def test_face_extraction_contract(registry):
    from rs_face_detection_tpu.pipeline.extraction import FaceExtraction

    fe = FaceExtraction(registry=registry)
    embs = fe(_crops(2))
    assert embs.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, rtol=1e-5)
    assert fe([]).shape == (0, 512)
    # Determinism.
    embs2 = fe(_crops(2))
    np.testing.assert_allclose(embs, embs2, rtol=1e-6)


def test_face_quality_assessment_contract(registry):
    from rs_face_detection_tpu.pipeline.quality_assessment import (
        FaceQualityAssessment,
    )

    fqa = FaceQualityAssessment(registry=registry)
    scores, flags = fqa(_crops(2))
    assert len(scores) == len(flags) == 2
    thr = FaceQualityAssessmentConfig().threshold
    for s, f in zip(scores, flags):
        assert f == (1 if s > thr else 0)


def test_antispoofing_geometry():
    from rs_face_detection_tpu.pipeline.antispoofing import (
        detection_to_crop_box,
        get_new_box,
    )

    # Square-ish crop around the detection: c_x +/- 0.47 * det_height.
    box = detection_to_crop_box(np.array([100, 50, 200, 250, 0.9]))
    x, y, w, h = box
    assert y == 50 and h == 201
    assert x == float(int(150 - 0.47 * 200))
    assert w == float(int(150 + 0.47 * 200)) - x + 1

    # Unclamped scale: weight 1; crop centered.
    l, t, r, b, wgt = get_new_box(1000, 1000, (400, 400, 100, 100), 2.0)
    assert wgt == 1.0
    assert (r - l, b - t) == (200, 200)

    # Clamped by image size: weight < 1.
    l, t, r, b, wgt = get_new_box(300, 300, (100, 100, 100, 100), 4.0)
    assert wgt == pytest.approx((299 / 100) / 4.0)
    assert 0 <= l <= r <= 299 and 0 <= t <= b <= 299


def test_antispoofing_contract(registry):
    from rs_face_detection_tpu.pipeline.antispoofing import FaceAntiSpoofing

    fas = FaceAntiSpoofing(registry=registry)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, size=(240, 320, 3), dtype=np.uint8) for _ in range(2)]
    boxes = [
        np.array([100, 60, 200, 180, 0.9], np.float32),
        np.array([50, 50, 150, 170, 0.8], np.float32),
    ]
    liveness, scores = fas(imgs, boxes)
    assert liveness.shape == (2,) and scores.shape == (2,)
    assert set(np.unique(liveness)).issubset({0, 1})
    assert (scores >= 0).all() and (scores <= 1).all()
    thr = FaceAntiSpoofingConfig().threshold
    np.testing.assert_array_equal(liveness, (scores > thr).astype(np.int32))

    empty = fas([], [])
    assert empty[0].shape == (0,) and empty[1].shape == (0,)
